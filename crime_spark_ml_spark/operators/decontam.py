"""Benchmark decontamination — n-gram overlap against a held-out set.

The training-data hygiene step every LLM corpus pipeline runs before
training: any document sharing too many word n-grams with an
evaluation benchmark is flagged (and usually dropped) so benchmark
numbers measure generalization, not memorization. The standard recipe
(GPT-3 appendix C / The Pile / FineWeb) is 8–13-gram overlap; the
fixture corpus uses 3-grams so the tiny synthetic texts produce a
non-degenerate ratio distribution.

Scale shape: the benchmark side is SMALL by construction (eval suites
are MBs, the corpus is TBs), so its distinct-gram set is broadcast —
the 100 TB corpus never shuffles; each partition streams its exploded
grams past the in-memory gram set and partial-aggregates the per-doc
match counts map-side. If a benchmark ever outgrew broadcast, drop
the hint and the same plan becomes a shuffle join on the gram key.
The gram join key stays a STRING here so the DuckDB oracle can replay
it exactly; a production deploy would join on ``xxhash64(gram)`` to
shrink shuffle width — overlap counts only ever go UP under hash
collision, so the flag stays conservative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import shingles_expr


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-document contamination stats vs a benchmark DataFrame.

    Returns one row per corpus document: distinct-gram count, grams
    also present in the benchmark, their ratio, and the boolean flag
    ``ratio >= threshold``. Both sides lower-case before shingling.
    """
    grams = F.expr(shingles_expr(f"lower({text_col})", n))
    bench_grams = (
        benchmark.select(F.explode(grams).alias("gram")).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(grams).alias("gram")
    )
    hits = corpus_grams.join(
        F.broadcast(bench_grams.withColumn("__hit", F.lit(1))), "gram", "left"
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__hit").alias("n_matched"),
        F.round(F.count("__hit") / F.count(F.lit(1)), 6).alias("contamination"),
        (F.count("__hit") / F.count(F.lit(1)) >= F.lit(threshold)).alias(
            "contaminated"
        ),
    )
