"""Oracle-parity tests at sf0.001 — the same compare the driver runs
at sf0.01 (tools/check_parity.py runs that scale)."""

from __future__ import annotations

import pytest

from crime_spark_ml_spark.plans.parity import run_parity
from crime_spark_ml_spark.plans.registry import load_all_plans


def _names():
    return sorted(load_all_plans())


@pytest.mark.parametrize("name", _names())
def test_query_parity(spark, sf_dir, name):
    (result,) = run_parity(spark, sf_dir, only=[name])
    assert result.ok, f"{result.name}: {result.status} — {result.detail}"
    if result.status == "match":
        assert result.spark_rows >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
