"""Negative tests of the parity harness itself — the compare must
CATCH injected wrongness, otherwise a harness bug could green the
whole registry. Each case builds a fake QuerySpec whose Spark side
deliberately disagrees with its oracle in exactly one way."""

from __future__ import annotations

from dataclasses import dataclass

from crime_spark_ml_spark.plans.parity import _duckdb_conn, compare_query


@dataclass(frozen=True)
class _Spec:
    name: str
    fn: object
    oracle: str | None


def _compare(spark, sf_dir, fn, oracle):
    con = _duckdb_conn(sf_dir)
    try:
        return compare_query("probe", _Spec("probe", fn, oracle), spark, con, sf_dir)
    finally:
        con.close()


GOOD_SQL = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"


def test_harness_passes_a_true_match(spark, sf_dir):
    r = _compare(
        spark, sf_dir,
        lambda s, d: s.read.parquet(f"{d}/region.parquet").select("r_regionkey", "r_name"),
        GOOD_SQL,
    )
    assert r.status == "match" and r.ok


def test_harness_catches_wrong_values(spark, sf_dir):
    from pyspark.sql import functions as F

    r = _compare(
        spark, sf_dir,
        lambda s, d: s.read.parquet(f"{d}/region.parquet").select(
            (F.col("r_regionkey") + 1).alias("r_regionkey"), "r_name"
        ),
        GOOD_SQL,
    )
    assert r.status == "MISMATCH" and not r.ok


def test_harness_catches_row_count_drift(spark, sf_dir):
    r = _compare(
        spark, sf_dir,
        lambda s, d: s.read.parquet(f"{d}/region.parquet")
        .select("r_regionkey", "r_name").limit(3),
        GOOD_SQL,
    )
    assert r.status == "MISMATCH" and "row count" in r.detail


def test_harness_catches_column_rename(spark, sf_dir):
    from pyspark.sql import functions as F

    r = _compare(
        spark, sf_dir,
        lambda s, d: s.read.parquet(f"{d}/region.parquet").select(
            F.col("r_regionkey").alias("key"), "r_name"
        ),
        GOOD_SQL,
    )
    assert r.status == "MISMATCH" and "columns" in r.detail


def test_harness_catches_small_float_drift(spark, sf_dir):
    from pyspark.sql import functions as F

    r = _compare(
        spark, sf_dir,
        lambda s, d: s.read.parquet(f"{d}/region.parquet").select(
            "r_regionkey", (F.col("r_regionkey") * 1.0 + 1e-9).alias("v")
        ),
        "SELECT r_regionkey, CAST(r_regionkey AS DOUBLE) AS v FROM region"
        " ORDER BY r_regionkey",
    )
    assert r.status == "MISMATCH" and "float diff" in r.detail


def test_harness_surfaces_oracle_errors_loudly(spark, sf_dir):
    r = _compare(
        spark, sf_dir,
        lambda s, d: s.read.parquet(f"{d}/region.parquet").select("r_regionkey"),
        "SELECT nonexistent_col FROM region",
    )
    assert r.status == "ERROR" and "duckdb" in r.detail
