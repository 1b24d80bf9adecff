"""Benchmark decontamination: planted-overlap semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.decontam import ngram_overlap
from crime_spark_ml_spark.plans.registry import all_queries


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_verbatim_copy_is_flagged(spark):
    bench = _mk(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _mk(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim
            (2, "alpha beta gamma delta epsilon zeta eta theta"),  # disjoint
            (3, "prefix words then the quick brown fox jumps over"),  # partial
        ],
    )
    out = {
        r["doc_id"]: r
        for r in ngram_overlap(corpus, bench, threshold=0.5).collect()
    }
    assert out[1]["contamination"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_matched"] == 0 and not out[2]["contaminated"]
    assert 0.0 < out[3]["contamination"] < 1.0


def test_case_insensitive_and_distinct_grams(spark):
    bench = _mk(spark, [(100, "Spark Shuffle Join")])
    # 6 tokens -> 4 shingle starts, but "spark shuffle join" repeats:
    # the distinct gram set is 3 wide, and it matches despite the case
    corpus = _mk(spark, [(1, "spark shuffle join spark shuffle join")])
    row = ngram_overlap(corpus, bench).collect()[0]
    assert row["n_grams"] == 3
    assert row["n_matched"] == 1


def test_corpus_side_never_shuffles_for_the_join(spark, sf_dir):
    """Benchmark gram set broadcasts; the only Exchange allowed is the
    per-doc aggregation (and the result ordering), never a join
    shuffle of the exploded corpus grams."""
    df = all_queries()["dp_decontaminate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
