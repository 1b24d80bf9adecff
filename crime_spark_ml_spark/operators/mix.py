"""Temperature-based source mixing — the standard multi-source LLM
corpus rule (multilingual temperature sampling): per-source keep rate
∝ src_tokens^-0.5, so sampled tokens scale as src_tokens^T with
T = 0.5, upweighting small sources relative to proportional sampling.

Engine-independent by construction: integer per-source quotas
(floor(f·n_docs)+1 — no round-half ambiguity) filled in md5
content-hash order, the same deterministic selection the stratified
sampler uses. One groupBy + one broadcast join + one per-source
window — no global sort, no driver loop; at 100 TB the quota table is
one row per source (always broadcastable) and the only shuffle is the
per-source ranking.

The registered ``dp_temperature_mix`` plan aggregates these operators
into a per-source summary hash-checked against a DuckDB oracle;
``tools/run_datapipe.py`` composes ``temperature_mix`` into the
end-to-end corpus pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import n_tokens


def temperature_quotas(
    docs: DataFrame,
    scale: float = 50.0,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, src_tokens, quota): quota = floor(min(1,
    scale/sqrt(src_tokens)) · n_docs) + 1 — single float operations on
    exact integer aggregates, bit-identical across engines."""
    return (
        docs.select(source_col, n_tokens(text_col).alias("__nt"))
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").alias("src_tokens"),
            (
                F.floor(
                    F.least(F.lit(1.0), F.lit(float(scale)) / F.sqrt(F.sum("__nt")))
                    * F.count("*")
                )
                + 1
            ).alias("quota"),
        )
    )


def temperature_mix(
    docs: DataFrame,
    scale: float = 50.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    quotas: DataFrame | None = None,
) -> DataFrame:
    """The kept rows: each source's quota filled in md5(text) hash
    order (id tiebreak) — deterministic across engines, runs, and
    partitionings. Returns the input columns unchanged. Pass a
    precomputed ``quotas`` frame to avoid re-aggregating when the
    caller already built one."""
    if quotas is None:
        quotas = temperature_quotas(docs, scale, text_col, source_col)
    w = Window.partitionBy(source_col).orderBy(F.md5(text_col), id_col)
    return (
        docs.join(F.broadcast(quotas.select(source_col, "quota")), source_col)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.col("quota"))
        .drop("__rk", "quota")
    )
