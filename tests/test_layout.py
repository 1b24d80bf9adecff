"""Z-order layout: correctness of the morton key and a MEASURED
row-group-skipping win for 2-D box queries vs a single-column sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.layout import (
    interleave_bits,
    interleave_bits_n,
    scan_output_rows,
    skipping_report,
    zorder_write,
)
from crime_spark_ml_spark.sources.catalog import load_table


def test_interleave_bits_known_values(spark):
    """Morton codes for hand-computed cases: interleave(a,b) with a's
    bits at odd positions. (a=3,b=0)->0b1010=10, (a=0,b=3)->0b0101=5,
    (a=2,b=1)->0b1001=9, (a=7,b=7)->63."""
    df = spark.createDataFrame(
        [(3, 0), (0, 3), (2, 1), (7, 7), (0, 0)], "a int, b int"
    ).withColumn("z", interleave_bits(F.col("a"), F.col("b"), 3))
    got = {(r.a, r.b): r.z for r in df.collect()}
    assert got == {(3, 0): 10, (0, 3): 5, (2, 1): 9, (7, 7): 63, (0, 0): 0}


def test_interleave_bits_rejects_bad_width(spark):
    with pytest.raises(ValueError):
        interleave_bits(F.lit(1), F.lit(1), 0)
    with pytest.raises(ValueError):
        interleave_bits(F.lit(1), F.lit(1), 32)


def test_zorder_write_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_us", "value")
    dest = str(tmp_path / "z")
    zorder_write(ev, dest, ("user_id", "ts_us"), bits=10, n_files=4)
    back = spark.read.parquet(dest)
    assert back.count() == ev.count()
    # content identical (layout only reorders)
    assert (
        back.groupBy().agg(F.sum("user_id"), F.sum("ts_us")).collect()
        == ev.groupBy().agg(F.sum("user_id"), F.sum("ts_us")).collect()
    )


def test_zorder_prunes_2d_box_queries(spark, sf_dir, tmp_path):
    """The measured claim: a (user range x time range) box filter over
    the z-ordered layout decodes fewer rows than over a ts-sorted
    layout (which has no user_id locality), and far fewer than the
    table size. Tiny row groups stand in for the 128 MiB production
    default so the fixture has enough groups to skip."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_us", "value")
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"),
        F.expr("percentile(user_id, 0.1)"),
        F.min("ts_us"),
        F.expr("percentile(ts_us, 0.1)"),
    ).collect()[0]
    box = f"user_id <= {int(hi_u)} AND ts_us <= {int(hi_t)}"

    # 32 files ~ 32 row groups: enough z-curve segments that per-column
    # min/max stats form tight tiles (4 groups leave every file's
    # bounding box overlapping the query box)
    zdir, tdir = str(tmp_path / "zorder"), str(tmp_path / "tsort")
    zorder_write(ev, zdir, ("user_id", "ts_us"), bits=10, n_files=32)
    (
        ev.repartitionByRange(32, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(tdir)
    )

    total = ev.count()
    matched = spark.read.parquet(zdir).filter(box).count()
    assert matched == spark.read.parquet(tdir).filter(box).count() > 0

    z_rows = scan_output_rows(spark.read.parquet(zdir).filter(box))
    t_rows = scan_output_rows(spark.read.parquet(tdir).filter(box))
    assert z_rows < t_rows, (z_rows, t_rows)
    assert z_rows < 0.5 * total, (z_rows, total)


def test_quantile_binning_survives_skew(spark, tmp_path):
    """A power-law dimension under uniform binning collapses most rows
    into one bin (every row group spans the hot region → nothing
    prunes); quantile bins stay ~equally full, so a box query on the
    dense end still skips. Measured, not asserted from plan text."""
    from crime_spark_ml_spark.operators.layout import zorder_key

    n = 20000
    df = (
        spark.range(n)
        .withColumn("heavy", (F.lit(1.0) / (F.rand(seed=7) + 1e-4)).cast("double"))
        .withColumn("other", (F.col("id") % 100).cast("double"))
        .cache()
    )
    # bin-population balance on the skewed dimension alone (constant
    # partner column, so the key IS the heavy bin)
    flat = df.withColumn("const", F.lit(0.0))

    def top_bin_share(binning):
        key = zorder_key(flat, ("heavy", "const"), bits=6, binning=binning)
        counts = (
            flat.withColumn("k", key).groupBy("k").count().agg(F.max("count")).collect()
        )
        return counts[0][0] / n

    uni, qt = top_bin_share("uniform"), top_bin_share("quantile")
    assert qt < 0.10 < uni, (uni, qt)

    udir, qdir = str(tmp_path / "uni"), str(tmp_path / "qt")
    # small row groups: with the default 128 MiB (one group per file)
    # pruning granularity is 32 files and the uniform-vs-quantile gap
    # drowns in range-sampling noise (repartitionByRange's boundary
    # sample is seeded by RDD id, i.e. session history — the margin
    # moved ±2% between standalone and full-suite runs)
    zorder_write(df, udir, ("heavy", "other"), bits=6, n_files=32,
                 row_group_bytes=16 * 1024)
    zorder_write(df, qdir, ("heavy", "other"), bits=6, n_files=32,
                 binning="quantile", row_group_bytes=16 * 1024)
    # box selective INSIDE the dense region (p40-p60 of heavy): uniform
    # binning put virtually every row in heavy-bin 0, so its layout
    # cannot prune this range at all (the skew failure mode this test
    # exists to show); quantile bins resolve it to ~13/64 bins. (A box
    # like heavy <= median is NOT a fair probe: degenerate uniform
    # binning collapses the layout to a pure sort on `other`, which
    # happens to suit a query selective on `other` — measured better
    # than honest 2-D tiling once row groups were fine enough to see.)
    p40, p60 = df.agg(
        F.expr("percentile(heavy, 0.4)"), F.expr("percentile(heavy, 0.6)")
    ).collect()[0]
    box = f"heavy BETWEEN {p40} AND {p60} AND other <= 10"
    u_rows = scan_output_rows(spark.read.parquet(udir).filter(box))
    q_rows = scan_output_rows(spark.read.parquet(qdir).filter(box))
    df.unpersist()
    assert q_rows < u_rows, (q_rows, u_rows)


def test_quantile_binning_guards(spark):
    from crime_spark_ml_spark.operators.layout import zorder_key

    df = spark.range(10).withColumn("v", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        zorder_key(df, ("id", "v"), bits=9, binning="quantile")
    with pytest.raises(ValueError):
        zorder_key(df, ("id", "v"), bits=4, binning="nope")


def test_interleave_bits_n_three_cols_known_values(spark):
    # a=0b11, b=0b01, c=0b10 with bits=2, round-robin a->pos 3k+2,
    # b->3k+1, c->3k: bit layout (msb..lsb) a1 b0 c1 a0 b0(c? ) —
    # computed by hand: positions: a0->2, a1->5, b0->1, b1->4, c0->0, c1->3
    # a=3 (a0=1,a1=1): 1<<2 | 1<<5 = 36; b=1 (b0=1): 1<<1 = 2;
    # c=2 (c1=1): 1<<3 = 8  => 46
    df = spark.range(1).select(
        interleave_bits_n([F.lit(3), F.lit(1), F.lit(2)], 2).alias("z")
    )
    assert df.collect()[0].z == 46


def test_interleave_bits_n_rejects_overflow(spark):
    with pytest.raises(ValueError, match="bits"):
        interleave_bits_n([F.lit(1)] * 4, 16)  # 64 > 63
    with pytest.raises(ValueError, match="columns"):
        interleave_bits_n([F.lit(1)], 4)


def test_zorder_3d_prunes_better_than_1d_sort(spark, tmp_path):
    ev = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .where(
            F.col("user_id").isNotNull()
            & F.col("ts_us").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("user_id", "ts_us", "value")
    )
    p10 = ev.agg(
        F.expr("percentile(user_id, 0.2)"),
        F.expr("percentile(ts_us, 0.2)"),
        F.expr("percentile(value, 0.2)"),
    ).collect()[0]
    pred = (
        f"user_id <= {p10[0]} AND ts_us <= {int(p10[1])} AND value <= {p10[2]}"
    )
    zdir, sdir = str(tmp_path / "z3"), str(tmp_path / "s1")
    zorder_write(
        ev, zdir, ("user_id", "ts_us", "value"), bits=8, n_files=32,
        row_group_bytes=16 * 1024,
    )
    (
        ev.repartitionByRange(32, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024)
        .parquet(sdir)
    )
    z = skipping_report(spark, zdir, pred)
    s = skipping_report(spark, sdir, pred)
    assert z["rows_matched"] == s["rows_matched"] > 0
    assert z["rows_scanned"] < s["rows_scanned"]
