"""IVF (inverted-file) approximate nearest neighbor — the
coarse-quantizer scale path promised alongside SRP-LSH
(operators/similarity.py).

Build: KMeans (k centroids) partitions the corpus into cells; each
vector is assigned once (one narrow transform, centroids broadcast).
Search: a query scores only the vectors in its ``nprobe`` nearest
cells — corpus scanned ∝ nprobe/k instead of 1.0 — then exact cosine
re-ranks the candidates.

Everything is DataFrame ops: the centroid table is tiny (k×dim) and
broadcast; the candidate join shuffles only (cell_id, vector) pairs.
At 100 TB you'd persist ``assign`` partitioned by cell_id so a probe
prunes partitions instead of scanning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


@dataclass
class IvfIndex:
    centroids: DataFrame  # cid int, cvec array<double>
    assigned: DataFrame  # id, vec, cid


def build_ivf(
    corpus: DataFrame,
    k: int = 16,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> IvfIndex:
    """``sample_fraction`` bounds the centroid FIT at scale (cell
    geometry converges on a sample); assignment always covers every
    row."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("features", array_to_vector("vec"))
    fit_on = vecs.sample(sample_fraction, seed=seed) if sample_fraction else vecs
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(fit_on)
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, cvec array<double>",
    )
    assigned = (
        model.transform(vecs)
        .select("id", "vec", F.col("prediction").alias("cid"))
    )
    return IvfIndex(centroids=centroids, assigned=assigned)


def ivf_topk(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the nprobe closest cells per query,
    exact-cosine re-rank inside them. Same output schema as
    brute_force_topk/lsh_topk — the three are swappable."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    probed = (
        q.crossJoin(F.broadcast(index.centroids))
        .withColumn("sim", cosine("qe", "cvec"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")
            ),
        )
        .where(F.col("crank") <= nprobe)
        .select("query_id", "qe", "cid")
    )
    cands = (
        index.assigned.join(F.broadcast(probed), "cid")
        .where(F.col("id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine("qe", "vec"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "id")
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("cand_id"), "cos", "rank")
    )


def persist_ivf(index: IvfIndex, path: str) -> None:
    """Write the index with the corpus partitioned BY CELL — the 100 TB
    layout: a probe of nprobe cells then reads nprobe/k of the files
    via partition PRUNING (directory-level skip, visible as
    PartitionFilters in the scan), instead of scanning the corpus and
    filtering. Centroids are a single tiny file next to it."""
    index.assigned.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/assigned")
    index.centroids.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf(spark, path: str) -> IvfIndex:
    assigned = spark.read.parquet(f"{path}/assigned").select(
        "id", "vec", F.col("cid").cast("int").alias("cid")
    )
    centroids = spark.read.parquet(f"{path}/centroids")
    return IvfIndex(centroids=centroids, assigned=assigned)
