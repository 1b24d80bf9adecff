"""Scale-mechanism tests: IVF recall, salted-join equivalence,
bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.ml.ivf import build_ivf, ivf_topk
from crime_spark_ml_spark.operators.similarity import brute_force_topk
from crime_spark_ml_spark.operators.skew import salted_group_count, salted_join
from crime_spark_ml_spark.sources.catalog import load_table


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.where(F.col("vec_id") < 20)
    exact = {(r.query_id, r.cand_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    index = build_ivf(emb, k=16, seed=0)
    approx = {
        (r.query_id, r.cand_id)
        for r in ivf_topk(index, queries, k=5, nprobe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall too low: {recall:.2f}"


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    """nprobe == k(cells) degrades IVF to exact search — results must
    equal brute force."""
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.where(F.col("vec_id") < 5)
    exact = sorted(map(tuple, brute_force_topk(emb, queries, k=5).collect()))
    index = build_ivf(emb, k=8, seed=0)
    full = sorted(map(tuple, ivf_topk(index, queries, k=5, nprobe=8).collect()))
    assert full == exact


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # skew: every order key mapped onto 3 hot customer buckets
    skewed = orders.withColumn("hot_key", (F.col("o_custkey") % 3).cast("long"))
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "hot_key long, tag string"
    )
    plain = skewed.join(dim, "hot_key").groupBy("tag").count()
    salted = salted_join(skewed, dim, "hot_key", n_salt=8).groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_group_count_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    plain = sorted(
        map(tuple, orders.groupBy("o_orderstatus").agg(F.count("*").alias("cnt")).collect())
    )
    salted = sorted(map(tuple, salted_group_count(orders, "o_orderstatus").collect()))
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located join: both sides bucketed by the join key → the
    sort-merge join reads bucketed scans directly, no Exchange."""
    # warehouse dir is a static conf; the session default (spark-warehouse/
    # under the repo root, gitignored) is fine for these throwaway tables
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("lineitem_b")
            .join(spark.table("orders_b"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("cnt"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # no shuffle keyed on the JOIN keys (the groupBy's own exchange
        # on o_orderstatus is expected and unrelated)
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_aqe_splits_skewed_join(spark):
    """Engine-native skew handling, complementing operators/skew.py's
    manual salting: with skew-join thresholds scaled to fixture bytes,
    AQE must detect the hot key's oversized shuffle partition and split
    it (SortMergeJoin(skew=true) in the FINAL adaptive plan) — and the
    row count must match the unskewed semantics. At production scale
    the same mechanism fires at the default 256 MiB threshold."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        big = spark.range(300000).selectExpr(
            "IF(id < 200000, 0, id % 1000) AS k", "id AS v", "repeat('x', 40) AS pad"
        )
        small = spark.range(1000).selectExpr("id AS k", "id * 10 AS w")
        joined = big.join(small, "k")
        assert len(joined.collect()) == 300000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("skew=true") >= 1, "AQE did not split the skewed join"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
