"""Table catalog over the driver-provided parquet fixtures.

Explicit, declared schemas (SURVEY.md §1.3: the reference relies on
``inferSchema=True``, which costs an extra full scan; the new engine
declares schemas and validates reads against them). Parquet is
self-describing so reads do not pass the schema — ``expected_schema``
is the declared contract used by validation tests and by the CSV
reader path in ``readers.py``.

Scale notes:
- ``events.ts`` arrives in TWO fixture layouts (the driver regenerated
  the tables between rounds): parquet TIMESTAMP(NANOS) — Spark reads it
  (under ``spark.sql.legacy.parquet.nanosAsLong``) as epoch-nanos
  LONG — or plain TIMESTAMP(MICROS) without UTC adjustment, which Spark
  reads directly as TIMESTAMP_NTZ. ``normalize_events`` detects the
  loaded type and produces the same normalized columns either way
  (``ts`` TIMESTAMP_NTZ wall-clock, ``ts_ns``/``ts_us`` epoch ints),
  all timezone-independently (``timestampadd``/``timestampdiff`` on an
  NTZ epoch literal — pure wall-clock arithmetic), matching DuckDB's
  ``epoch_us(CAST(ts AS TIMESTAMP))``. No session-timezone dependence.
- Dimension tables (region, nation, supplier, part) are small even at
  100 TB scale factors — join sides for these should be broadcast
  (see plans/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    # after catalog normalization (raw file: ts is epoch-nanos INT64)
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
            T.StructField("ts_ns", T.LongType()),
            T.StructField("ts_us", T.LongType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# TIMESTAMP_NTZ epoch anchor; timestampadd on NTZ is pure wall-clock
# arithmetic → no session-timezone dependence (unlike timestamp_micros
# which yields instant-semantics TIMESTAMP). Floor-division semantics
# (pmod remainder + matching floored quotient) so pre-1970 epoch-nanos
# produce the correct wall-clock too — Spark's % / DIV truncate toward
# zero, which for negative nanos diverges from DuckDB's floor-style
# nanos→micros truncation.
_NTZ_FROM_NANOS = (
    "timestampadd(MICROSECOND, pmod(ts_ns, 1000000000) DIV 1000, "
    "timestampadd(SECOND, (ts_ns - pmod(ts_ns, 1000000000)) DIV 1000000000, "
    "TIMESTAMP_NTZ '1970-01-01 00:00:00'))"
)


# epoch micros of an NTZ wall-clock value, as pure wall-clock
# arithmetic (unix_micros would interpret NTZ via the session timezone)
_US_FROM_NTZ = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def expected_schema(name: str) -> T.StructType:
    return _SCHEMAS[name]


def events_ts_is_nanos(sf_dir: str) -> bool:
    """Sniff the events parquet footer: TIMESTAMP(NANOS) (or raw int64
    epoch-nanos) vs TIMESTAMP(MICROS). Footer-only read — no data IO."""
    import pyarrow.parquet as pq

    t = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    return t in ("timestamp[ns]", "int64")


def raw_events_schema(sf_dir: str) -> T.StructType:
    """The schema a streaming read of the RAW events file must declare
    (streams cannot infer): ``ts`` is LONG under the nanos layout
    (``nanosAsLong``), TIMESTAMP_NTZ under the micros layout."""
    ts_type = T.LongType() if events_ts_is_nanos(sf_dir) else T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize a raw events frame (either fixture layout, batch or
    streaming) to the declared schema: ``ts`` TIMESTAMP_NTZ wall-clock,
    ``ts_ns`` epoch nanos, ``ts_us`` epoch micros.

    ts_us is the oracle-parity clock: DuckDB truncates TIMESTAMP(NANOS)
    to microseconds on read, so micros is the finest precision both
    engines agree on under either layout. Row-local expressions only —
    stays inside whole-stage codegen, streaming-safe."""
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):  # nanos layout under nanosAsLong
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.expr(_NTZ_FROM_NANOS))
            .withColumn("ts_us", F.expr("(ts_ns - pmod(ts_ns, 1000)) DIV 1000"))
        )
    else:  # micros layout: already a wall-clock timestamp
        df = (
            df.withColumn("ts", F.col("ts").cast(T.TimestampNTZType()))
            .withColumn("ts_us", F.expr(_US_FROM_NTZ))
            .withColumn("ts_ns", F.col("ts_us") * 1000)
        )
    return df.select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns", "ts_us"
    )


# Canonical well-formed-event predicate for the ANALYTICS family: an
# event without a timestamp has no place on a timeline, one without a
# user cannot be attributed, one without a type cannot be classified —
# and, concretely, NULL keys ORDER differently in Spark (ASC NULLS
# FIRST) than in DuckDB (NULLS LAST), silently shifting every
# ROW_NUMBER/LAG/rank chain built on them. Analytical event plans
# filter on this IN BOTH ENGINES (the SQL text below is the oracle
# twin); ingest-hygiene plans (cleaning funnels, profiling) stay raw
# by design. value and props remain nullable — they are legitimately
# optional fields and every consumer coalesces or NULL-guards them.
EVENTS_WELL_FORMED_SQL = (
    "ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL"
)


def well_formed_events(df: DataFrame) -> DataFrame:
    """Spark twin of EVENTS_WELL_FORMED_SQL (see rationale above)."""
    return df.where(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )


# Canonical well-formed-embedding predicate, the vector twin of
# EVENTS_WELL_FORMED_SQL: a NULL / empty / wrong-dimension / non-finite
# / zero-norm vector breaks every kernel differently — DuckDB's
# list_inner_product RAISES on dim mismatch while Spark's zip_with
# silently NULL-pads, NaN poisons centroids and quantizers, zero norm
# divides cosine by zero, and MLlib fits die on NULL feature arrays.
# EMB_DIM pins the fixture contract (64 at every SF); a production
# deployment parameterizes it per collection. The SQL twin uses CASE
# (ordered evaluation) because AND does not guarantee short-circuit.
EMB_DIM = 64
# every branch is an elementwise list_filter: DuckDB evaluates CASE
# branches VECTORIZED (no row-level short-circuit), so a function that
# raises on bad input (list_inner_product on a NULL element) cannot
# appear anywhere in the predicate — the zero-norm test is expressed
# as "no nonzero component" instead
EMBEDDING_WELL_FORMED_SQL = (
    "CASE WHEN embedding IS NULL THEN FALSE"
    f" WHEN len(embedding) <> {EMB_DIM} THEN FALSE"
    " WHEN len(list_filter(embedding, x -> x IS NULL)) > 0 THEN FALSE"
    " WHEN len(list_filter(embedding, x -> NOT isfinite(x))) > 0 THEN FALSE"
    " WHEN len(list_filter(embedding, x -> x <> 0)) = 0 THEN FALSE"
    " ELSE TRUE END"
)


def well_formed_embeddings(df: DataFrame) -> DataFrame:
    """Spark twin of EMBEDDING_WELL_FORMED_SQL (see rationale above)."""
    return df.where(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == EMB_DIM)
        & F.expr("size(filter(embedding, x -> x IS NULL)) = 0")
        & F.expr(
            "size(filter(embedding, x -> isnan(x)"
            " OR abs(x) = CAST('Infinity' AS DOUBLE))) = 0"
        )
        & F.expr("size(filter(embedding, x -> x <> CAST(0 AS FLOAT))) > 0")
    )


# Canonical well-formed predicates for the RELATIONAL fact tables —
# the ingest-gate contract the r7 NaN/Inf exploration motivated: an
# order without a customer/date cannot be attributed or placed on a
# timeline, and a non-finite money/measure value poisons every
# decimal-exact aggregate differently per engine (DuckDB RAISES
# casting NaN into DECIMAL, Spark's cast yields NULL silently, double
# sums turn NaN and stay NaN). Ingest-hygiene plans (dp_wellformed_
# audit) COUNT against these raw; the analytics family adopts them as
# the round-8 campaign lands. isfinite() is DuckDB's; the Spark twins
# spell it NOT isnan AND |x| != Inf.
ORDERS_WELL_FORMED_SQL = (
    "o_custkey IS NOT NULL AND o_orderdate IS NOT NULL"
    " AND o_totalprice IS NOT NULL AND isfinite(o_totalprice)"
)
LINEITEM_WELL_FORMED_SQL = (
    "l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL"
    " AND l_quantity IS NOT NULL AND isfinite(l_quantity)"
    " AND l_extendedprice IS NOT NULL AND isfinite(l_extendedprice)"
    " AND l_discount IS NOT NULL AND isfinite(l_discount)"
    " AND l_tax IS NOT NULL AND isfinite(l_tax)"
)


def _finite(c: F.Column) -> F.Column:
    return ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def well_formed_orders(df: DataFrame) -> DataFrame:
    """Spark twin of ORDERS_WELL_FORMED_SQL (see rationale above)."""
    return df.where(
        F.col("o_custkey").isNotNull()
        & F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & _finite(F.col("o_totalprice"))
    )


def well_formed_lineitem(df: DataFrame) -> DataFrame:
    """Spark twin of LINEITEM_WELL_FORMED_SQL (see rationale above)."""
    cond = F.col("l_orderkey").isNotNull() & F.col("l_shipdate").isNotNull()
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        cond = cond & F.col(c).isNotNull() & _finite(F.col(c))
    return df.where(cond)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalized to the declared schema."""
    if name == "events":
        # nanos layout needs nanosAsLong; micros layout needs NTZ
        # inference (both are the defaults' safe direction and no-ops
        # for the other layout); session-level confs
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view for spark.sql() plans."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
