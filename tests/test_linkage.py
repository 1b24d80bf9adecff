"""Record-linkage operators: sorted-neighborhood edit-distance pairs
and the exact prefix-filtered Jaccard join (operators/linkage.py).

The load-bearing property test: prefix filtering is LOSSLESS — its
output must equal the naive all-pairs Jaccard join filtered at the
threshold, for every threshold tried. SNM is checked for its
contract (neighbor pairs only, planted exact dups found at dist 0,
O(n*w) pair count bound)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.dedup import jaccard_pairs
from crime_spark_ml_spark.operators.linkage import (
    prefix_filter_jaccard_join,
    snm_edit_pairs,
)
from crime_spark_ml_spark.sources.catalog import load_table


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


# ------------------------------------------------------------------ SNM
def test_snm_finds_planted_exact_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s1"),
        (2, "the quick brown fox jumps over the lazy dog", "en", "s1"),
        (3, "the quick brown fox jumps over the lazy cat", "en", "s1"),
        (4, "completely different text about spark engines", "en", "s1"),
    ]
    out = snm_edit_pairs(_docs(spark, rows), window=3).collect()
    by_pair = {(r.id_a, r.id_b): r.edit_dist for r in out}
    assert by_pair[(1, 2)] == 0  # exact dup adjacent in sort order
    assert by_pair[(2, 3)] == 3  # dog -> cat, one 3-char edit
    assert all(a < b for a, b in by_pair)


def test_snm_blocks_limit_comparisons(spark):
    # different langs never compared even with identical text
    rows = [
        (1, "same text here", "en", "s1"),
        (2, "same text here", "de", "s1"),
    ]
    assert snm_edit_pairs(_docs(spark, rows), window=3).count() == 0


def test_snm_pair_count_bounded_by_n_times_w(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    n = docs.count()
    w = 2
    pairs = snm_edit_pairs(docs, window=w)
    assert pairs.count() <= n * w


def test_snm_length_blocking_splits_far_lengths(spark):
    rows = [
        (1, "a " * 10 + "tail", "en", "s1"),  # ~24 chars, bucket 0
        (2, "a " * 100 + "tail", "en", "s1"),  # ~204 chars, bucket 3
    ]
    assert snm_edit_pairs(_docs(spark, rows), window=3).count() == 0


# ---------------------------------------------------------- prefix join
@pytest.mark.parametrize("threshold", [0.4, 0.5, 0.7, 0.9])
def test_prefix_filter_is_lossless_vs_all_pairs(spark, sf_dir, threshold):
    docs = load_table(spark, sf_dir, "documents")
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_join(
            docs, threshold=threshold, scope_col="source"
        ).collect()
    }
    naive = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in jaccard_pairs(docs, scope_col="source")
        .where(F.col("jaccard") >= threshold)
        .collect()
    }
    assert fast == naive


def test_prefix_join_exact_dups_score_one(spark):
    rows = [
        (1, "alpha beta gamma", "en", "s1"),
        (2, "alpha beta gamma", "en", "s1"),
        (3, "alpha beta delta", "en", "s1"),
        (4, "unrelated words entirely", "en", "s1"),
    ]
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_join(
            _docs(spark, rows), threshold=0.5, scope_col="source"
        ).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == out[(2, 3)] == 0.5  # |∩|=2, |∪|=4
    assert not any(4 in p for p in out)


def test_prefix_join_scope_isolates_sources(spark):
    rows = [
        (1, "alpha beta gamma", "en", "s1"),
        (2, "alpha beta gamma", "en", "s2"),
    ]
    assert (
        prefix_filter_jaccard_join(
            _docs(spark, rows), threshold=0.5, scope_col="source"
        ).count()
        == 0
    )


def test_prefix_join_rejects_bad_threshold(spark):
    df = _docs(spark, [(1, "a", "en", "s1")])
    with pytest.raises(ValueError, match="threshold"):
        prefix_filter_jaccard_join(df, threshold=0.0)
    with pytest.raises(ValueError, match="threshold"):
        prefix_filter_jaccard_join(df, threshold=1.5)


def test_prefix_filter_float_ceil_boundary(spark):
    """t=0.55 with |x|=100, |y|=55, y ⊂ x: Jaccard is exactly 55/100,
    which compares >= 0.55 in doubles — but ceil(0.55*100) rounds to
    56 in double arithmetic, so an unrelaxed size filter would drop
    the qualifying pair and break the lossless guarantee."""
    x = " ".join(f"t{i}" for i in range(100))
    y = " ".join(f"t{i}" for i in range(55))
    df = _docs(spark, [(1, x, "en", "s1"), (2, y, "en", "s1")])
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_join(
            df, threshold=0.55, scope_col="source"
        ).collect()
    }
    assert out == {(1, 2): 0.55}
