"""PCM16 audio operators (operators/audio.py): real numpy decode —
roundtrip exactness, physically meaningful features on a synthesized
sine wave, loud failure on out-of-range samples."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.audio import (
    PCM_SCALE,
    clip_features,
    encode_pcm16,
    frame_features,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_encode_roundtrip_exact(spark):
    vec = [0.1, -0.25, 0.0, 0.49999, -0.5]
    pcm = encode_pcm16(_df(spark, [(1, vec)])).collect()[0]
    expected = np.trunc(np.asarray(vec, dtype=np.float64) * PCM_SCALE).astype("<i2")
    assert pcm.n_samples == 5
    assert np.frombuffer(bytes(pcm.payload), dtype="<i2").tolist() == expected.tolist()
    feats = clip_features(encode_pcm16(_df(spark, [(1, vec)]))).collect()[0]
    assert feats.sum_sq == int(np.sum(expected.astype(np.int64) ** 2))


def test_silence_features(spark):
    pcm = encode_pcm16(_df(spark, [(7, [0.0] * 64)]))
    clip = clip_features(pcm).collect()[0]
    assert (clip.n_samples, clip.sum_sq, clip.zero_crossings) == (64, 0, 0)
    frames = frame_features(pcm, frame=16, hop=8).collect()
    assert len(frames) == 1 + (64 - 16) // 8
    assert all(f.rms == 0.0 and f.zcr == 0.0 for f in frames)


def test_sine_wave_rms_and_zcr(spark):
    """440 Hz sine at 16 kHz, amplitude 0.5: per-frame RMS ≈ A·SCALE/√2
    and ZCR ≈ 2·f/sr — the features measure the physics, not noise."""
    sr, freq, amp, n = 16000, 440, 0.5, 1600
    vec = [amp * math.sin(2 * math.pi * freq * t / sr) for t in range(n)]
    pcm = encode_pcm16(_df(spark, [(3, vec)]))
    frames = frame_features(pcm, frame=160, hop=80).collect()
    assert len(frames) == 1 + (n - 160) // 80
    expected_rms = amp * PCM_SCALE / math.sqrt(2)
    expected_zcr = 2 * freq / sr
    for f in frames:
        assert abs(f.rms - expected_rms) / expected_rms < 0.05, f
        assert abs(f.zcr - expected_zcr) < 0.02, f


def test_out_of_range_fails_loudly(spark):
    with pytest.raises(Exception, match="wrap int16"):
        encode_pcm16(_df(spark, [(9, [2.0, 0.0])])).collect()


def test_short_clip_yields_no_frames(spark):
    pcm = encode_pcm16(_df(spark, [(5, [0.1] * 10)]))
    assert frame_features(pcm, frame=16, hop=8).count() == 0
    # but clip-level features still exist
    assert clip_features(pcm).collect()[0].n_samples == 10


def test_fixture_embeddings_in_pcm_range(spark, sf_dir):
    """The embeddings fixture fits the int16 budget at PCM_SCALE (the
    dp_audio_rms plan depends on this)."""
    from crime_spark_ml_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    mx = emb.agg(
        F.max(F.expr("array_max(transform(embedding, x -> abs(x)))")).alias("m")
    ).collect()[0].m
    assert mx < 32767.0 / PCM_SCALE


def test_spectral_sine_concentrates_in_right_bin(spark):
    """A pure sine at FFT bin f must put the dominant bin at f and
    >90% of its (DC-free) energy in f's band; Parseval total must
    round to the exact integer time-domain sum of squares."""
    import numpy as np

    from crime_spark_ml_spark.operators.audio import (
        PCM_SCALE,
        encode_pcm16,
        spectral_features,
    )

    n = 64
    rows = []
    for f in (4, 11, 27):  # bands of 64-pt rfft: [0,8) [8,16) [16,24) [24,33)
        x = 0.5 * np.sin(2 * np.pi * f * np.arange(n) / n)
        rows.append((f, [float(v) for v in x]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    spec = {
        r.media_id: r
        for r in spectral_features(encode_pcm16(df), n_fft=64, bands=4).collect()
    }
    for f, band in ((4, 0), (11, 1), (27, 3)):
        r = spec[f]
        assert r.dom_bin == f, (f, r.dom_bin)
        assert r.band_energy[band] > 0.9 * sum(r.band_energy), (f, r.band_energy)
        # Parseval against the exact integer sum of squares
        s = np.trunc(
            np.array([float(v) for v in dict(rows)[f]], dtype=np.float64) * PCM_SCALE
        ).astype(np.int64)
        assert round(r.spectral_total) == int(np.sum(s * s))


def test_spectral_rejects_bad_nfft(spark):
    import pytest as _pytest

    from crime_spark_ml_spark.operators.audio import spectral_features

    df = spark.createDataFrame([(1, bytearray(b"\x00\x00"))], "media_id long, payload binary")
    with _pytest.raises(ValueError):
        spectral_features(df, n_fft=63)
    with _pytest.raises(ValueError):
        spectral_features(df, n_fft=2)
