"""Distributed exact ranking helpers (operators/rank.py) against the
single-partition window ground truth — the substitution every
global-sort rewrite in the registry relies on being exact."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.rank import (
    global_row_number,
    grouped_prefix_sums,
    grouped_row_number,
)


def _scrambled(spark, n=1000):
    """Values deliberately uncorrelated with insertion order, with
    duplicate keys, across several input partitions."""
    return (
        spark.range(n)
        .repartition(7)
        .select(
            "id",
            (F.xxhash64("id") % 97).alias("v"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.xxhash64("id", F.lit(1)) % 5).alias("x"),
        )
    )


def test_global_row_number_matches_window(spark):
    df = _scrambled(spark)
    got, n = global_row_number(df, ["v", "id"], out_col="r")
    assert n == 1000
    truth = df.withColumn(
        "r", F.row_number().over(Window.orderBy("v", "id"))
    )
    assert sorted((r.id, r.r) for r in got.collect()) == sorted(
        (r.id, r.r) for r in truth.collect()
    )


def test_global_row_number_desc_expression(spark):
    df = _scrambled(spark, 200)
    got, _ = global_row_number(df, [F.col("v").desc(), F.col("id")], out_col="r")
    truth = df.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("v").desc(), "id"))
    )
    assert sorted((r.id, r.r) for r in got.collect()) == sorted(
        (r.id, r.r) for r in truth.collect()
    )


def test_grouped_row_number_matches_window(spark):
    df = _scrambled(spark)
    got = grouped_row_number(df, ["g"], ["v", "id"], out_col="r")
    truth = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("v", "id"))
    )
    assert sorted((r.id, r.r) for r in got.collect()) == sorted(
        (r.id, r.r) for r in truth.collect()
    )


def test_grouped_prefix_sums_matches_window(spark):
    df = _scrambled(spark).withColumn("one", F.lit(1))
    got = grouped_prefix_sums(
        df, ["g"], ["v", "id"], {"one": "rn", "x": "sx"}
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    truth = df.withColumn("rn", F.sum("one").over(w)).withColumn(
        "sx", F.sum("x").over(w)
    )
    assert sorted((r.id, r.rn, r.sx) for r in got.collect()) == sorted(
        (r.id, r.rn, r.sx) for r in truth.collect()
    )


def test_no_single_partition_window_in_helper_plans(spark):
    """The helpers must never themselves emit the node they exist to
    avoid."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_plan_linter import unpartitioned_unbounded_windows

    df = _scrambled(spark, 100)
    g, _ = global_row_number(df, ["v", "id"])
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert not unpartitioned_unbounded_windows(plan)
    gg = grouped_prefix_sums(
        df.withColumn("one", F.lit(1)), ["g"], ["v", "id"], {"one": "rn"}
    )
    plan = gg._jdf.queryExecution().executedPlan().toString()
    assert not unpartitioned_unbounded_windows(plan)
