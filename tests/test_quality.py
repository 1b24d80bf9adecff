"""Data-quality constraint suite (operators/quality.py): one-pass
evaluation, per-check violation semantics, and the two-relation
referential check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.quality import (
    accepted_values,
    check_suite,
    in_range,
    matches,
    not_null,
    ref_integrity,
    unique,
)


@pytest.fixture(scope="module")
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "ok"),
            (2, None, -5.0, "ok"),
            (2, "b", 200.0, "bad!"),
            (None, "b", 50.0, None),
        ],
        "id bigint, code string, amount double, tag string",
    )


def test_check_semantics(spark, messy):
    report = {
        r.check: (r.violations, r.passed)
        for r in check_suite(
            messy,
            [
                not_null("id"),
                not_null("code"),
                unique("id"),
                unique("code"),
                in_range("amount", lo=0, hi=100),
                accepted_values("tag", ["ok"]),
                matches("tag", "^[a-z]+$"),
            ],
        ).collect()
    }
    assert report["not_null(id)"] == (1, False)
    assert report["not_null(code)"] == (1, False)
    assert report["unique(id)"] == (1, False)  # one surplus duplicate 2
    assert report["unique(code)"] == (1, False)  # surplus 'b'; NULL ignored
    assert report["in_range(amount)"] == (2, False)  # -5 and 200
    assert report["accepted_values(tag)"] == (1, False)  # 'bad!'; NULL ignored
    assert report["matches(tag)"] == (1, False)  # 'bad!'; NULL ignored


def test_suite_is_single_pass(spark, messy):
    plan = check_suite(
        messy, [not_null("id"), unique("id"), in_range("amount", lo=0)]
    )._jdf.queryExecution().executedPlan().toString()
    # one aggregate over one scan-side relation: no joins, no unions
    assert "Join" not in plan


def test_ref_integrity_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id bigint, fk bigint"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk bigint")
    row = ref_integrity(child, "fk", parent, "pk").collect()[0]
    assert (row.violations, row.passed) == (1, False)  # 99 only; NULL skipped


def test_guards(spark, messy):
    with pytest.raises(ValueError, match="bound"):
        in_range("amount")
    with pytest.raises(ValueError, match="empty"):
        check_suite(messy, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_suite(messy, [not_null("id"), not_null("id")])


def test_clean_table_passes(spark):
    clean = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, v string")
    report = check_suite(clean, [not_null("id"), unique("id")]).collect()
    assert all(r.passed and r.violations == 0 for r in report)
