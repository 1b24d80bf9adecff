"""Streaming plans runnable through the driver contract.

``stream_batch_parity`` is the flex: a REAL Structured Streaming query
(parquet replay source → watermark-free windowed agg → availableNow →
memory sink) whose materialized result hash-matches the same DuckDB
oracle as the batch plan ev_window_tumbling — stream-batch parity
(SURVEY.md §5.3) enforced by the driver's own correctness gate.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.aggs import dec_sum_sql
from ..sources.catalog import load_table
from ..streaming.consumer import parquet_stream, run_available_now, windowed_counts
from ..streaming.wire import feature_struct, parse_tabular
from .registry import register

_COUNTER = itertools.count()

RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) under nanosAsLong
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_NTZ = (
    "timestampadd(MICROSECOND, (ts_ns % 1000000000) DIV 1000, "
    "timestampadd(SECOND, ts_ns DIV 1000000000, TIMESTAMP_NTZ '1970-01-01 00:00:00'))"
)


@register(
    "stream_batch_parity",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS cnt,
           {dec_sum_sql('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("streaming", "T1", "T5", "parity"),
)
def stream_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts computed BY AN ACTUAL STREAMING QUERY
    (events parquet replayed as a stream, availableNow) — must
    hash-match the batch oracle. Complete output mode + no watermark
    so every window emits (the watermarked/append path is covered in
    tests/test_streaming.py)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = parquet_stream(spark, sf_dir, schema=RAW_EVENTS_SCHEMA, glob="events.parquet")
    events = raw.withColumnRenamed("ts", "ts_ns").withColumn("ts", F.expr(_NTZ))
    agg = windowed_counts(events, ts_col="ts", window="1 hour", watermark=None)
    name = f"stream_parity_{next(_COUNTER)}"
    return run_available_now(agg, name, output_mode="complete").orderBy(
        "window_start", "event_type"
    )


@register("stream_wire_roundtrip", oracle=None, tags=("streaming", "T2", "E9"))
def stream_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 wire-format parse: producer-encode the first 30 customers
    into the reference's ``{"<row_idx>": {"feature0": …}}`` JSON lines
    (batch_size=10, stream.py:184-196 shape), parse with the consumer,
    restore names (E9 inverse). Exact roundtrip pinned in tests."""
    import json

    c = (
        load_table(spark, sf_dir, "customer")
        .orderBy("c_custkey")
        .limit(30)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
        .collect()
    )
    lines = []
    for start in range(0, len(c), 10):
        batch = {
            str(i): {
                "feature0": float(r.c_custkey),
                "feature1": float(r.c_acctbal),
                "feature2": r.c_mktsegment,
            }
            for i, r in enumerate(c[start : start + 10])
        }
        lines.append((json.dumps(batch),))
    raw = spark.createDataFrame(lines, "value string")
    inner = feature_struct(n_numeric=2, n_string=1)
    parsed = parse_tabular(raw, inner)
    return parsed.orderBy("feature0").select(
        F.col("feature0").cast("long").alias("custkey"),
        F.round("feature1", 2).alias("acctbal"),
        F.col("feature2").alias("segment"),
    )
