"""Document chunking — the tokenize-and-window step every LLM training
pipeline runs before packing sequences.

Token-window chunks with overlap (``chunk_size`` tokens, ``stride``
step): row-local array ops only (split → sequence of starts → explode
→ slice), so chunking is embarrassingly parallel — no shuffle, no
Python, survives any scale the scan survives. The explode sits behind
a Generate node, so the split array is materialized once per document
(Catalyst's projection collapsing can't re-inline it per chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 20,
    stride: int = 15,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_id`` (0-based window index),
    ``n_tokens`` (≤ chunk_size; the final window may be partial) and
    the whitespace-rejoined ``chunk_text``. Start offsets are multiples
    of ``stride`` in [0, n_tokens_doc); consecutive chunks overlap by
    ``chunk_size - stride`` tokens."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError(f"chunk_size={chunk_size} and stride={stride} must be > 0")
    if stride > chunk_size:
        raise ValueError(
            f"stride={stride} > chunk_size={chunk_size} would silently drop the "
            f"tokens between consecutive windows"
        )
    # NULL text would silently yield one all-NULL chunk row (split(NULL)
    # is NULL; greatest ignores the NULL so starts becomes [0]) — fail
    # loudly instead, matching this module's strict-guard style. The
    # null check stays inside whole-stage codegen; it only fires if a
    # NULL row actually exists.
    checked = F.when(F.col(text_col).isNotNull(), F.col(text_col)).otherwise(
        F.raise_error(
            F.lit(f"chunk_documents: NULL {text_col!r} — filter or impute upstream")
        )
    )
    words = F.split(checked, " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(stride)
    )
    exploded = df.select(
        id_col,
        words.alias("__w"),
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    piece = F.slice(F.col("__w"), F.col("start") + 1, chunk_size)
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mask: str = "07",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Content-defined chunking (CDC): split each document at positions
    where the hash of the trailing ``window``-char substring falls
    under ``mask`` — the rolling-hash boundary rule behind
    storage-level dedup (LBFS/FastCDC family). Unlike fixed-size
    chunking, an insertion near the start of a document shifts only the
    ONE chunk it lands in; every later boundary re-synchronizes because
    boundaries depend on local content, not absolute offsets. Chunk
    hashes then dedup shared content across near-identical documents
    that whole-document hashing misses.

    Boundary rule: position ``i`` (1-based, ``i >= window``) ends a
    chunk when ``substr(md5(substring(text, i-window+1, window)), 1, 2)
    <= mask`` — expected chunk length 256/(mask+1) chars for a 2-hex
    mask ('07' → 1/32 boundary rate → ~32-char chunks). md5-per-window
    keeps the whole operator a JVM higher-order-function expression an
    oracle can replicate hex-for-hex; a production engine would swap in
    a rolling gear hash via mapInPandas (one multiply+shift per byte
    instead of a fresh digest) — same boundaries-from-content contract,
    just cheaper per position. Embarrassingly parallel: per-row expressions,
    zero shuffle.

    Returns one row per (doc, chunk): ``chunk_idx`` (1-based),
    ``chunk_text``. Chunks concatenate back to the exact original text
    (tests/test_cdc.py pins the reassembly invariant). NULL text
    raises loudly, matching chunk_documents."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if not (len(mask) == 2 and all(c in "0123456789abcdef" for c in mask)):
        raise ValueError(f"mask must be 2 lowercase hex chars, got {mask!r}")
    checked = F.when(F.col(text_col).isNotNull(), F.col(text_col)).otherwise(
        F.raise_error(
            F.lit(f"cdc_chunks: NULL {text_col!r} — filter or impute upstream")
        )
    )
    t = "__t"
    keyed = df.select(id_col, *keep_cols, checked.alias(t))
    bpos = (
        f"CASE WHEN length({t}) < {window} THEN array() "
        f"ELSE filter(sequence({window}, length({t})), "
        f"i -> substr(md5(substring({t}, i - {window - 1}, {window})), 1, 2) <= '{mask}') END"
    )
    # array_distinct(concat(bpos, [len])) appends the final boundary
    # and drops the duplicate when a content boundary already ends the
    # text — crucially it references the md5-filter expression ONCE.
    # (A CASE on element_at(bpos, size(bpos)) = len mentions bpos six
    # times, and Catalyst inlines all six copies into the projection —
    # 6x the md5 work per row; the executed plan keeps __ends as a
    # materialized attribute so the Generate below never re-evaluates.)
    ends = f"array_distinct(concat({bpos}, array(length({t}))))"
    with_ends = keyed.withColumn("__ends", F.expr(ends))
    chunks = (
        "transform(sequence(1, size(__ends)), j -> struct("
        "j AS idx, "
        f"substring({t}, CASE WHEN j = 1 THEN 1 ELSE element_at(__ends, j - 1) + 1 END, "
        "element_at(__ends, j) - CASE WHEN j = 1 THEN 0 ELSE element_at(__ends, j - 1) END"
        ") AS chunk))"
    )
    exploded = with_ends.select(
        id_col, *keep_cols, F.explode(F.expr(chunks)).alias("__c")
    )
    return exploded.select(
        id_col,
        *keep_cols,
        F.col("__c.idx").alias("chunk_idx"),
        F.col("__c.chunk").alias("chunk_text"),
    )
