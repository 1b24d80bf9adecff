"""Typed reader/writer tests (S1/S5): explicit-schema CSV, partitioned
parquet sink, prediction-table sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.sources.crimegen import crime_table
from crime_spark_ml_spark.sources.readers import CRIME_CSV_SCHEMA, read_crime_csv
from crime_spark_ml_spark.sources.writers import write_parquet, write_predictions


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    """S1: write the crime fixture as CSV (the reference's input
    format), read back with the declared schema — types stable, no
    inference scan."""
    src = crime_table(spark, n_rows=200)
    csv_dir = str(tmp_path / "crime_csv")
    src.coalesce(1).write.option("header", "true").csv(csv_dir)
    back = read_crime_csv(spark, csv_dir)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in CRIME_CSV_SCHEMA.fields
    ]
    assert back.count() == 200
    a = sorted(map(tuple, src.select("Dates", "Category", "X").collect()))
    b = sorted(map(tuple, back.select("Dates", "Category", "X").collect()))
    assert a == b


def test_csv_failfast_on_malformed(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.csv").write_text(
        "Dates,Category,Descript,DayOfWeek,PdDistrict,Resolution,Address,X,Y\n"
        "2015-01-01 00:00:00,C,d,Monday,D,R,A,not_a_double,37.7\n"
    )
    with pytest.raises(Exception) as exc:
        read_crime_csv(spark, str(bad)).collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_partitioned_parquet_write(spark, tmp_path):
    """S5-at-scale: partitioned columnar sink; partition pruning works
    on read-back."""
    src = crime_table(spark, n_rows=500)
    out = str(tmp_path / "by_district")
    write_parquet(src, out, partition_by=("PdDistrict",), n_files=2)
    back = spark.read.parquet(out)
    assert back.count() == 500
    one = back.where(F.col("PdDistrict") == "DIST_1")
    # partition pruning: the filter appears as a partition filter, not a scan
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() == src.where(F.col("PdDistrict") == "DIST_1").count()


def test_prediction_table_sink(spark, tmp_path):
    preds = spark.createDataFrame(
        [(i, f"CAT_{i % 3:02d}") for i in range(50)], "Id long, Category string"
    )
    out = str(tmp_path / "preds")
    write_predictions(preds, out)
    back = spark.read.parquet(out)
    assert back.count() == 50
    assert set(back.columns) == {"Id", "Category"}


def test_compact_parquet_small_files(spark, tmp_path):
    """20 fragment files -> size-targeted rewrite: far fewer files,
    identical rows."""
    import glob

    from crime_spark_ml_spark.sources.writers import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(0, 2000).withColumn("v", F.col("id") * 2)
    df.repartition(20).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 20

    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/*.parquet")) == 1
    got = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want


def test_compact_parquet_refuses_same_path(spark, tmp_path):
    """dst == src would delete the input before the lazy read runs —
    the guard must refuse before any filesystem mutation."""
    import pytest

    from crime_spark_ml_spark.sources.writers import compact_parquet

    src = str(tmp_path / "data")
    spark.range(0, 10).write.parquet(src)
    with pytest.raises(ValueError, match="dst must differ"):
        compact_parquet(spark, src, src)
    # input untouched
    assert spark.read.parquet(src).count() == 10


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Long-lived corpora drift: old parts lack columns new parts have.
    mergeSchema reads the union; the missing column is NULL for old
    rows — the schema-evolution contract an ingest directory needs."""
    old = spark.range(0, 5).withColumn("text", F.lit("a"))
    new = (
        spark.range(5, 10)
        .withColumn("text", F.lit("b"))
        .withColumn("quality", F.col("id") * 1.0)
    )
    old.write.parquet(str(tmp_path / "t"), mode="append")
    new.write.parquet(str(tmp_path / "t"), mode="append")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) == {"id", "text", "quality"}
    assert merged.where(F.col("quality").isNull()).count() == 5
    assert merged.where(F.col("quality").isNotNull()).count() == 5


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    join WITHOUT an Exchange (the write-time shuffle is reused) — the
    co-location contract bucketing buys at 100 TB. Plan-pinned: the
    physical plan of the bucketed join must contain zero Exchange
    nodes, while the plain-path twin join must contain at least one."""
    from crime_spark_ml_spark.sources.writers import write_bucketed

    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    saved_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        facts = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        dims = spark.range(0, 1_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        write_bucketed(facts, "t_facts_b", ("k",), n_buckets=8, sort_cols=("k",))
        write_bucketed(dims, "t_dims_b", ("k",), n_buckets=8, sort_cols=("k",))
        joined = spark.table("t_facts_b").join(spark.table("t_dims_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 1_000

        plain = facts.join(dims, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thresh)
        spark.sql("DROP TABLE IF EXISTS t_facts_b")
        spark.sql("DROP TABLE IF EXISTS t_dims_b")


def test_bucketed_merge_upsert_zero_shuffle(spark):
    """The dp_upsert_merge scale story, pinned: a FULL OUTER merge of a
    snapshot and a change batch both bucketed by the merge key runs
    with ZERO exchanges — the CDC write path at 100 TB co-locates by
    construction instead of shuffling both sides per batch."""
    from crime_spark_ml_spark.sources.writers import write_bucketed

    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    saved_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        snap = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        changes = spark.range(0, 10_000, 2).select(
            F.col("id").alias("k"),
            (F.col("id") * 5).alias("v"),
            (F.col("id") % 8 == 2).alias("is_delete"),
        )
        write_bucketed(snap, "t_snap_b", ("k",), n_buckets=8, sort_cols=("k",))
        write_bucketed(changes, "t_chg_b", ("k",), n_buckets=8, sort_cols=("k",))
        t, u = spark.table("t_snap_b").alias("t"), spark.table("t_chg_b").alias("u")
        merged = (
            t.join(u, on="k", how="full_outer")
            .where(F.col("u.is_delete").isNull() | ~F.col("u.is_delete"))
            .select("k", F.coalesce(F.col("u.v"), F.col("t.v")).alias("v"))
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # semantics: deletes (k%8==2 among even k) dropped, updates win
        got = {r.k: r.v for r in merged.collect()}
        assert len(got) == 10_000 - 10_000 // 8
        assert got[4] == 20 and got[1] == 3 and 2 not in got
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thresh)
        spark.sql("DROP TABLE IF EXISTS t_snap_b")
        spark.sql("DROP TABLE IF EXISTS t_chg_b")


def test_csv_multiline_roundtrip(spark, tmp_path):
    """Embedded newlines survive a CSV roundtrip ONLY with
    multiLine=true on the read (quoted-field framing), which costs
    line-splittability — why dp_csv_roundtrip keeps newline-free rows
    and this torture case lives here instead."""
    rows = [
        (1, "plain"),
        (2, "two\nlines"),
        (3, "crlf\r\nline"),
        (4, 'mix, "quote"\nand comma'),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    path = str(tmp_path / "ml_csv")
    (
        df.write.mode("overwrite")
        .options(header=True, ignoreLeadingWhiteSpace=False, ignoreTrailingWhiteSpace=False)
        .csv(path)
    )
    back = (
        spark.read.schema("id bigint, text string")
        .options(header=True, mode="FAILFAST", multiLine=True)
        .csv(path)
    )
    got = sorted((r.id, r.text) for r in back.collect())
    assert got == sorted(rows)


def test_normalize_events_negative_nanos_floor(spark):
    """Pre-1970 epoch-nanos must floor (not truncate toward zero) into
    wall-clock and micros — the _NTZ_FROM_NANOS pmod arithmetic in
    sources/catalog.py that matches DuckDB's floor-style nanos→micros
    truncation. -1 ns lives in microsecond -1 and renders as
    1969-12-31 23:59:59.999999; a clean negative second renders
    exactly; positive values are unaffected."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from crime_spark_ml_spark.sources.catalog import normalize_events

    rows = [
        (1, -1, 10, "click", 0.0, None),            # -1 ns
        (2, -1_000_000_000, 10, "click", 0.0, None),  # -1 s exactly
        (3, -1_500_000_000, 10, "click", 0.0, None),  # -1.5 s
        (4, 1_500, 10, "click", 0.0, None),           # +1.5 us
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # nanos layout
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    out = normalize_events(spark.createDataFrame(rows, schema)).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("wall"),
        "ts_us",
    )
    got = {r.event_id: (r.wall, r.ts_us) for r in out.collect()}
    assert got == {
        1: ("1969-12-31 23:59:59.999999", -1),
        2: ("1969-12-31 23:59:59.000000", -1_000_000),
        3: ("1969-12-31 23:59:58.500000", -1_500_000),
        4: ("1970-01-01 00:00:00.000001", 1),
    }
