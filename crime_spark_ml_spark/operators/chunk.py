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
