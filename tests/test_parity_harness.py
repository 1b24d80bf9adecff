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


def _degenerate_docs_dir(spark, tmp_path) -> str:
    """A tiny sf-dir clone whose documents table includes the
    degenerate texts the real fixtures never contain (min 47 chars):
    empty string, lone whitespace, a 1-token doc, NULL text. Other
    tables symlink to sf0.001 so the DuckDB view registration binds."""
    import os

    from conftest import SF_SMOKE

    d = tmp_path / "sf_degenerate"
    d.mkdir()
    for f in os.listdir(SF_SMOKE):
        if f != "documents.parquet" and f.endswith(".parquet"):
            os.symlink(os.path.join(SF_SMOKE, f), str(d / f))
    rows = [
        (1, "", "en", "web", 0),
        (2, " ", "en", "web", 1),
        (3, "solo", "en", "web", 4),
        (4, None, "en", "web", None),
        (5, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
        (6, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    # single file, not a Spark part-directory — the sf-dir contract
    pq.write_table(table, str(d / "documents.parquet"))
    return str(d)


def test_text_kernels_survive_degenerate_docs(spark, tmp_path):
    """Unguarded sequence(1, size-k) bounds default to step -1 on
    short docs — Spark yields index 0 (element_at error) or phantom
    '' chars while DuckDB's generate_series is empty (the r5-advisor
    dp_heaps_law class). Pins that every text kernel over documents
    stays engine/oracle-identical when such docs exist."""
    from crime_spark_ml_spark.plans.registry import all_queries, all_oracles

    sf = _degenerate_docs_dir(spark, tmp_path)
    queries, oracles = all_queries(), all_oracles()
    for name in ("dp_bigram_pmi", "dp_char_entropy", "dp_heaps_law"):
        r = _compare(spark, sf, queries[name], oracles[name])
        assert r.ok, f"{name}: {r.status} {r.detail}"
