"""Product quantization (PQ) ANN — the compressed-codes scale path.

IVF (ml/ivf.py) prunes WHICH vectors a query scores; PQ shrinks WHAT
is stored and scored: each d-dim vector becomes ``m`` uint8-sized
codes (one per d/m-dim subspace, each quantized against its own
k-centroid codebook), so a 64-dim float corpus (256 B/row) becomes
m=8 codes (8 B/row) — a 100 TB embedding store fits hot in ~3 TB of
executor memory. Search is asymmetric distance computation (ADC,
Jégou et al., TPAMI 2011): per query, precompute an m×k lookup table
of exact subspace distances, then every corpus row scores with m
table lookups — no float math per candidate.

Spark mapping (everything DataFrame ops, no Python in the hot path):
- **train**: m independent KMeans fits over array slices of a sample
  — the codebook is m×k×(d/m) doubles, kilobytes, always broadcast.
- **encode**: posexplode the m slices → broadcast-join the codebook →
  per-(id, sub) argmin window → collect m codes per id. One narrow
  pass over the corpus plus one groupBy on id.
- **search**: the query-side LUT is built the same way (tiny), then
  corpus_codes ⋈ broadcast(LUT) scores via a pure JVM zip_with/
  aggregate expression over the code array. The corpus never
  shuffles; per-query top-k is a partitioned window.

At 100 TB: encode once, store ``(id, codes)`` bucketed by id
(sources/writers.write_bucketed); combine with IVF cell assignment so
a probe scans nprobe/k of the code table with LUT scoring.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class PqModel:
    codebooks: DataFrame  # sub int, code int, cvec array<double>
    m: int
    k: int
    sub_dim: int


def _sliced(df: DataFrame, vec_col: str, m: int, sub_dim: int) -> DataFrame:
    """(..., sub, subvec) — posexplode of the m contiguous slices."""
    slices = F.array(
        *[F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim) for j in range(m)]
    )
    return df.select(
        "*", F.posexplode(slices).alias("sub", "subvec")
    ).drop(vec_col)


def _sq_l2(a: str, b: str) -> F.Column:
    """Sequential double-precision squared L2 distance (JVM-side)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    seed: int = 0,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> PqModel:
    """Fit m per-subspace KMeans codebooks. ``sample_fraction`` keeps
    training bounded at scale — codebooks converge on a sample; only
    encode touches every row."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    sample = corpus.sample(sample_fraction, seed=seed) if sample_fraction else corpus
    sample = sample.select(vec_col).cache()
    rows: list[tuple[int, int, list[float]]] = []
    for j in range(m):
        sub = sample.select(
            array_to_vector(F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim)).alias(
                "features"
            )
        )
        model = KMeans(k=k, seed=seed + j, featuresCol="features").fit(sub)
        for code, center in enumerate(model.clusterCenters()):
            rows.append((j, code, [float(x) for x in center]))
    sample.unpersist()
    codebooks = corpus.sparkSession.createDataFrame(
        rows, "sub int, code int, cvec array<double>"
    )
    return PqModel(codebooks=codebooks, m=m, k=k, sub_dim=sub_dim)


def pq_encode(
    corpus: DataFrame,
    model: PqModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> length m): nearest codebook entry per
    subspace. Narrow scan + broadcast join + argmin window keyed on
    (id, sub) + one groupBy(id) — the only shuffle is on id."""
    sliced = _sliced(
        corpus.select(F.col(id_col).alias("id"), vec_col), vec_col, model.m, model.sub_dim
    )
    dists = sliced.join(F.broadcast(model.codebooks), "sub").withColumn(
        "d", _sq_l2("subvec", "cvec")
    )
    w = Window.partitionBy("id", "sub").orderBy("d", "code")
    assigned = (
        dists.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "sub", "code")
    )
    return assigned.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def pq_topk(
    corpus_codes: DataFrame,
    model: PqModel,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: (query_id, cand_id, adist, rank), rank 1 = nearest
    (smallest approximate squared L2). The corpus side is the code
    table only; each row costs m integer lookups into the broadcast
    per-query LUT."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    lut_rows = (
        _sliced(q, "qv", model.m, model.sub_dim)
        .join(F.broadcast(model.codebooks), "sub")
        .withColumn("pd", _sq_l2("subvec", "cvec"))
        .groupBy("query_id", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("code", "pd"))), lambda s: s["pd"]
            ).alias("row")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "row"))), lambda s: s["row"]
            ).alias("lut")
        )
    )
    scored = (
        corpus_codes.crossJoin(F.broadcast(lut_rows))
        .where(F.col("id") != F.col("query_id"))
        .withColumn(
            "adist",
            F.round(
                F.aggregate(
                    F.zip_with(
                        "codes",
                        "lut",
                        lambda c, row: F.element_at(row, c.cast("int") + F.lit(1)),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist", "id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("cand_id"), "adist", "rank")
    )
