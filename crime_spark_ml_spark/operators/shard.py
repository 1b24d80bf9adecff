"""Deterministic training-shard routing, content manifests, and
per-epoch pseudo-shuffling — the SINK side of a training-data
pipeline: once data is cleaned/deduped/mixed, it must land in a fixed
number of shards whose membership, order, and content are REPRODUCIBLE
(same inputs → byte-identical shards), so a training run can be
resumed, audited, or exactly re-created.

Everything routes through md5 (not xxhash64) deliberately: md5 exists
identically in DuckDB, so shard membership, manifest checksums, and
epoch order are all value-oracle-checkable (plans/datapipe.py
dp_shard_manifest / dp_epoch_shuffle), and the routing is stable
across Spark versions/configs (hash()/xxhash64 are
implementation-defined seeds, fine for transient shuffles, wrong for
durable shard identity).

Scale shape: routing and checksums are row-local JVM expressions; the
only shuffle is the one repartition by shard id at write time (the
organization shuffle every sharded sink pays); the manifest is one
groupBy over shard ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_int32(col: Column | str) -> Column:
    """First 8 hex chars of md5 as a non-negative BIGINT (32-bit
    range) — the portable hash kernel (Spark ``conv`` hex→dec equals
    DuckDB ``('0x'||…)::BIGINT``, verified in the oracle suite)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 8), 16, 10
    ).cast("bigint")


def shard_id(id_col: Column | str, n_shards: int) -> Column:
    """Stable shard for a record id: md5-route then mod. Content- and
    layout-independent — the same id lands in the same shard on any
    cluster, any partitioning, any Spark version."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return F.pmod(md5_int32(id_col), F.lit(n_shards)).cast("int")


def epoch_order_key(id_col: Column | str, epoch: int | Column) -> Column:
    """Deterministic per-epoch pseudo-shuffle key: md5 of
    ``epoch:id``. Ordering by it is a reproducible permutation that
    differs per epoch — the standard trick for epoch-varying sample
    order without materializing permutations (order is derivable from
    (epoch, id) alone, so any worker can re-derive its slice).
    ``epoch`` may be a literal int or a Column (one plan fanning out
    several epochs at once); both share this one key format, which the
    dp_epoch_shuffle oracle re-implements hex-for-hex."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    e = F.lit(str(epoch)) if isinstance(epoch, int) else epoch.cast("string")
    return F.md5(F.concat(e, F.lit(":"), c.cast("string")))


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard audit row: (shard, n_rows, n_chars, checksum), where
    checksum is the SUM of the rows' md5-int32 over ``text`` — order-
    independent (sum commutes), so two shard writes with different
    internal order still produce the same manifest iff they hold the
    same multiset of rows. NULL text hashes as '' (explicit, so a NULL
    and an empty string collide rather than silently dropping rows)."""
    return (
        df.select(
            shard_id(id_col, n_shards).alias("shard"),
            F.length(F.coalesce(text_col, F.lit(""))).alias("__len"),
            md5_int32(F.coalesce(F.col(text_col), F.lit(""))).alias("__h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__len").alias("n_chars"),
            F.sum("__h").alias("checksum"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write ``df`` into ``n_shards`` parquet shard directories
    (shard=K/) plus a ``_manifest`` sidecar parquet, and return the
    manifest. One repartition by shard id (each shard = one file, the
    reproducible layout), rows sorted by id within a shard so shard
    bytes are deterministic, not just shard membership."""
    from ..sources.writers import write_sidecar

    keyed = df.withColumn("shard", shard_id(id_col, n_shards))
    (
        keyed.repartition("shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/shards")
    )
    # manifest from the WRITTEN shards, not a second pass over df: one
    # routing computation total, and the manifest describes exactly the
    # bytes on disk even if df's lineage is non-deterministic between
    # actions
    spark = df.sparkSession
    manifest = shard_manifest(
        spark.read.parquet(f"{path}/shards"), n_shards,
        id_col=id_col, text_col=text_col,
    )
    write_sidecar(manifest, f"{path}/_manifest")
    return manifest


def verify_shards(spark, path: str, n_shards: int, id_col: str = "doc_id",
                  text_col: str = "text") -> bool:
    """Recompute the manifest from the written shards and compare to
    the persisted one — the resume/audit check: True iff every shard's
    (n_rows, n_chars, checksum) matches. Reads shard data once."""
    from ..sources.writers import read_sidecar_rows

    stored = {
        int(r["shard"]): (int(r["n_rows"]), int(r["n_chars"]), int(r["checksum"]))
        for r in read_sidecar_rows(f"{path}/_manifest")
    }
    actual = {
        r.shard: (r.n_rows, r.n_chars, r.checksum)
        for r in shard_manifest(
            spark.read.parquet(f"{path}/shards"), n_shards,
            id_col=id_col, text_col=text_col,
        ).collect()
    }
    return stored == actual
