"""Record-linkage-style near-dup detection: sorted-neighborhood
edit-distance pairs and an exact prefix-filtered set-similarity join.

Two classic entity-resolution techniques the hash-sketch family
(MinHash/SimHash in operators/dedup.py) does not cover:

* **Sorted-neighborhood method (SNM)**: instead of comparing all pairs
  (quadratic) or hashing (probabilistic), sort records by a blocking
  key and compare each record only with its ``window`` successors in
  sort order. Cost is O(n·w) comparisons; detection quality comes from
  choosing a sort key that places near-duplicates adjacently (here the
  text itself, so shared-prefix edits land side by side). The expensive
  ``levenshtein`` only ever runs on n·w pairs, never n².
* **Prefix filtering (PPJoin-style)**: an EXACT Jaccard-threshold join
  that is sub-quadratic by construction. Order each record's tokens by
  ascending global document frequency; two sets with Jaccard >= t MUST
  share a token within their first ``|set| - ceil(t·|set|) + 1``
  rarest tokens, so joining on prefix tokens alone generates every
  qualifying pair (losslessness is the published PPJoin guarantee, not
  a heuristic) while the rare-token prefix keeps candidate buckets
  small. Candidates are then verified with an exact intersection count.

Both are pure DataFrame plans — window functions, joins, and the JVM
``levenshtein`` expression; no UDFs, no driver-side loops. Reference
scope: the reference engine (crime.py:1-207) has no fuzzy-matching
surface; these extend the dedup family required for training-data
pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snm_edit_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    length_bucket: int = 64,
    window: int = 3,
    prefix_chars: int = 120,
) -> DataFrame:
    """Sorted-neighborhood near-dup pairs with Levenshtein distance.

    Blocks on ``block_cols`` plus a text-length bucket (records whose
    lengths differ by more than one bucket can't be cheap edits of each
    other), sorts each block by ``(text, id)``, and pairs every record
    with its next ``window`` neighbors via ``lead`` — so the window
    function's partition key is the block, never the whole table, and
    the edit distance runs on ``substring(text, 1, prefix_chars)`` to
    cap the O(len²) DP cost per pair.

    At scale: the block key's cardinality bounds partition sizes; add
    more ``block_cols`` (or shrink ``length_bucket``) if a block grows
    past executor memory — SNM quality degrades gracefully because the
    sort order inside a block is what places near-dups adjacently.

    Returns (id_a, id_b, edit_dist) with id_a < id_b, one row per
    discovered neighbor pair.
    """
    bucket = (F.length(text_col) / F.lit(length_bucket)).cast("long")
    keyed = df.withColumn("__lb", bucket)
    w = Window.partitionBy(*block_cols, "__lb").orderBy(text_col, id_col)
    # window expressions must be materialized before the explode —
    # Catalyst rejects lead() inside a Generate's input projection
    led = keyed.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__tx"),
        *[F.lead(id_col, off).over(w).alias(f"__nid{off}") for off in range(1, window + 1)],
        *[F.lead(text_col, off).over(w).alias(f"__ntx{off}") for off in range(1, window + 1)],
    )
    pairs = [
        F.struct(F.col(f"__nid{off}").alias("nid"), F.col(f"__ntx{off}").alias("ntx"))
        for off in range(1, window + 1)
    ]
    neigh = (
        led.select(
            "__id",
            "__tx",
            F.explode(F.array(*pairs)).alias("__n"),
        )
        .where(F.col("__n.nid").isNotNull())
        .select(
            F.least("__id", "__n.nid").alias("id_a"),
            F.greatest("__id", "__n.nid").alias("id_b"),
            F.levenshtein(
                F.substring("__tx", 1, prefix_chars),
                F.substring("__n.ntx", 1, prefix_chars),
            ).alias("edit_dist"),
        )
    )
    return neigh


def prefix_filter_jaccard_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    scope_col: str | None = "source",
) -> DataFrame:
    """Exact Jaccard >= ``threshold`` pairs via PPJoin prefix filtering.

    Stages (each a single declarative plan, one action at the end):
      1. tokenize: distinct whitespace tokens per record;
      2. document frequency per (scope, token) — the canonical token
         order is ascending (df, token), rarest first;
      3. per-record prefix: the first ``n - ceil(t·n) + 1`` tokens in
         canonical order (window rank per record, not a global sort);
      4. candidates: self-join PREFIX tokens only (rare by
         construction, so buckets stay small where a full token join
         explodes on stopwords), with the id_a < id_b and the length
         filter ``n_b >= ceil(t·n_a)`` (Jaccard >= t implies the size
         ratio bound, so this prunes without loss);
      5. verify: join each candidate pair to the two docs' sorted
         distinct-token ARRAYS and count the overlap with JVM
         ``array_intersect`` — O(|x|+|y|) per candidate row, the
         classic PPJoin merge-verify. (Verifying by re-joining the
         exploded token table looks equivalent but materializes
         |candidates| x tokens-per-doc rows before the second join
         condition can filter — a ~100x blowup that OOMs at volume;
         tools/run_scale_test.py's linkage phase found exactly that.)
         Jaccard = |∩| / (n_a + n_b - |∩|), keep >= t.

    Prefix filtering is lossless for Jaccard — the result is
    bit-identical to the all-pairs join, which is exactly how the
    DuckDB oracle checks it (plans/datapipe.py::dp_setsim_prefix_join).
    ``scope_col`` scopes pairs to equal scope values (None = global).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    scope = [scope_col] if scope_col else []
    toks = df.select(
        id_col,
        *scope,
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    )
    freq = toks.groupBy(*scope, "tok").agg(F.count("*").alias("df_tok"))
    ordered = toks.join(freq, on=[*scope, "tok"])
    # per-doc size rides the SAME doc_id window partitioning as the
    # canonical-order rank — one shuffle serves both, instead of a
    # separate groupBy(doc).count + join-back (one fewer scan+shuffle)
    doc_w = Window.partitionBy(id_col)
    rank_w = doc_w.orderBy("df_tok", "tok")
    # ceil(t*n) must never round ABOVE the minimal overlap the float
    # verification accepts: for t=0.55, n=100 the double product is
    # 55.000000000000007, ceil gives 56, yet jaccard 55/100 compares
    # >= t — the qualifying pair would be dropped and losslessness
    # silently broken. The 1e-9 slack relaxes the bound downward only
    # (a longer prefix / looser size filter admits extra CANDIDATES,
    # never loses one); verification remains the exact gate.
    eps = 1e-9

    def t_bound(n):
        return F.ceil(F.lit(threshold) * n - F.lit(eps))

    prefix_len = F.col("n_tok") - t_bound(F.col("n_tok")) + 1
    prefix = (
        ordered.withColumn("n_tok", F.count("*").over(doc_w))
        .withColumn("__rk", F.row_number().over(rank_w))
        .where(F.col("__rk") <= prefix_len)
        .select(id_col, *scope, "tok", "n_tok")
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"sc_{c}") for c in scope],
        "tok",
        F.col("n_tok").alias("n_a"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"scb_{c}") for c in scope],
        "tok",
        F.col("n_tok").alias("n_b"),
    )
    join_cond = (F.col("id_a") < F.col("id_b")) & (
        F.col("n_b") >= t_bound(F.col("n_a"))
    ) & (F.col("n_a") >= t_bound(F.col("n_b")))
    for c in scope:
        join_cond = join_cond & (F.col(f"sc_{c}") == F.col(f"scb_{c}"))
    cand = (
        pa.join(pb, on="tok")
        .where(join_cond)
        .select("id_a", "id_b")
        .distinct()
    )
    doc_toks = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_list("tok")).alias("toks")
    )
    da = doc_toks.select(F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"))
    db = doc_toks.select(F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"))
    inter = (
        cand.join(da, on="id_a")
        .join(db, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("n_inter"),
            F.size("toks_a").alias("n_a"),
            F.size("toks_b").alias("n_b"),
        )
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .where(jac >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
