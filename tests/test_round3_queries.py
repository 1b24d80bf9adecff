"""Round-3 query invariants: BPE-ish token counting, latest-wins
snapshot, video frame sampling, streaming session-window finalization.
(DuckDB value parity for each is covered by tools/check_parity.py /
the driver gate; these pin the semantics that parity alone wouldn't.)"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crime_spark_ml_spark.functions.text import BPE_PATTERN, n_bpe_tokens
from crime_spark_ml_spark.plans.registry import load_all_plans

PLANS = load_all_plans()


def test_bpe_pattern_tokenizes_like_reference_cases():
    cases = {
        "I'll see 1234 cats, ok?!": ["I", "'ll", " see", " 123", "4", " cats", ",", " ok", "?!"],
        "hello": ["hello"],
        # leftmost-first: a letter run claims at most ONE leading space;
        # runs of 2+ spaces go to the \s+ arm whole
        "  spaced  out": ["  ", "spaced", "  ", "out"],
    }
    for text, expect in cases.items():
        assert re.findall(BPE_PATTERN, text) == expect, text


def test_bpe_counts_cover_all_characters(spark):
    # pretokenization must partition the string: concatenating the
    # matches reconstructs the input (no character dropped)
    df = spark.createDataFrame(
        [("a",), ("I'll pay $1,250.99 -- no more!",), ("múlti-byte ünïcode",)],
        "text string",
    )
    rows = df.select(
        "text",
        F.concat_ws(
            "", F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
        ).alias("rejoined"),
        n_bpe_tokens("text").alias("n"),
    ).collect()
    for r in rows:
        assert r.rejoined == r.text
        assert r.n >= 1


def test_latest_snapshot_one_row_per_key_and_is_max(spark, sf_dir):
    out = PLANS["dp_latest_snapshot"].fn(spark, sf_dir)
    dup = out.groupBy("user_id", "event_type").count().where("count > 1")
    assert dup.count() == 0
    from crime_spark_ml_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    mx = ev.groupBy("user_id", "event_type").agg(F.max("ts_us").alias("mx"))
    bad = out.join(mx, ["user_id", "event_type"]).where("ts_us <> mx")
    assert bad.count() == 0


def test_video_frame_sample_stride_and_coverage(spark, sf_dir):
    out = PLANS["dp_video_frame_sample"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        idx = [int(x) for x in r.frame_csv.split(",")]
        assert idx[0] == 0
        assert all(b - a == 30 for a, b in zip(idx, idx[1:]))
        assert idx[-1] < r.n_frames <= idx[-1] + 30
        assert r.n_sampled == len(idx)


def test_stream_session_window_matches_finalized_batch(spark, sf_dir):
    streamed = PLANS["stream_session_window"].fn(spark, sf_dir).collect()
    assert len(streamed) > 0
    batch = PLANS["ev_sessionize"].fn(spark, sf_dir).collect()
    from crime_spark_ml_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts_us")).collect()[0][0]
    gap_us, wm_us = 600_000_000, 1_800_000_000
    finalized = {
        (r.user_id, r.session_start_us // 1_000_000, r.n_events)
        for r in batch
        if r.session_start_us + r.duration_us + gap_us <= mx - wm_us
    }
    import calendar
    import time

    got = {
        (r.user_id, calendar.timegm(time.strptime(r.session_start, "%Y-%m-%d %H:%M:%S")), r.n_events)
        for r in streamed
    }
    assert got == finalized


def test_ivf_persisted_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Cell-partitioned IVF persistence: probing a cell subset must hit
    partition PRUNING (PartitionFilters on cid, only probed dirs read)
    and return exactly the in-memory rows."""
    from crime_spark_ml_spark.ml.ivf import build_ivf, load_ivf, persist_ivf
    from crime_spark_ml_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings").cache()
    index = build_ivf(emb, k=8, seed=0)
    persist_ivf(index, str(tmp_path / "ivf"))
    back = load_ivf(spark, str(tmp_path / "ivf"))

    probes = [0, 3]
    pruned = back.assigned.where(F.col("cid").isin(probes))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cid" in plan.split("PartitionFilters", 1)[1][:120]

    got = sorted((r.id, r.cid) for r in pruned.collect())
    want = sorted(
        (r.id, r.cid)
        for r in index.assigned.where(F.col("cid").isin(probes)).collect()
    )
    assert got == want and len(got) > 0
    emb.unpersist(blocking=False)


def test_abtest_significance_arithmetic(spark, sf_dir):
    """The two-proportion z-statistic computed from ev_abtest_lift's
    exact cells: hash assignment is independent of the outcome, so the
    fixture expects NO significant lift (|z| < 3) — a 'significant'
    readout here would mean the assignment hash leaked into the
    outcome."""
    import math

    from crime_spark_ml_spark.plans.events import ev_abtest_lift

    rows = {r.variant: r for r in ev_abtest_lift(spark, sf_dir).collect()}
    c, t = rows["control"], rows["treatment"]
    p_pool = (c.n_converted + t.n_converted) / (c.n_users + t.n_users)
    se = math.sqrt(p_pool * (1 - p_pool) * (1 / c.n_users + 1 / t.n_users))
    z = (t.conv_rate - c.conv_rate) / se
    assert abs(z) < 3.0, (z, dict(rows))
    assert c.n_users > 0 and t.n_users > 0
