"""Deterministic training shards (operators/shard.py): stable
md5 routing, order-independent manifests, writer round-trip with the
resume/audit check, and epoch pseudo-shuffle permutation properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.shard import (
    epoch_order_key,
    md5_int32,
    shard_id,
    shard_manifest,
    verify_shards,
    write_training_shards,
)
from crime_spark_ml_spark.sources.catalog import load_table


def test_shard_routing_stable_across_partitioning(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id: r.s for r in docs.select("doc_id", shard_id("doc_id", 8).alias("s")).collect()}
    b = {
        r.doc_id: r.s
        for r in docs.repartition(13)
        .select("doc_id", shard_id("doc_id", 8).alias("s"))
        .collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))  # every shard populated


def test_manifest_is_order_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m1 = {r.shard: (r.n_rows, r.n_chars, r.checksum) for r in shard_manifest(docs, 4).collect()}
    m2 = {
        r.shard: (r.n_rows, r.n_chars, r.checksum)
        for r in shard_manifest(docs.orderBy(F.desc("doc_id")).repartition(7), 4).collect()
    }
    assert m1 == m2


def test_write_verify_roundtrip_and_tamper_detection(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=4)
    assert manifest.count() == 4
    assert verify_shards(spark, path, n_shards=4)
    # tamper: copy with one shard's rows dropped -> checksum mismatch
    # (fresh root: overwriting a parquet dir mid-read races the scan)
    import shutil

    path2 = str(tmp_path / "tampered")
    shutil.copytree(path, path2)
    shutil.rmtree(f"{path2}/shards/shard=2")
    assert not verify_shards(spark, path2, n_shards=4)


def test_epoch_orders_are_distinct_permutations(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ids = sorted(r.doc_id for r in docs.collect())
    orders = {}
    for epoch in (0, 1, 2):
        ordered = [
            r.doc_id
            for r in docs.withColumn("k", epoch_order_key("doc_id", epoch))
            .orderBy("k", "doc_id")
            .collect()
        ]
        assert sorted(ordered) == ids  # a permutation, nothing lost
        orders[epoch] = ordered
    assert orders[0] != orders[1] != orders[2]
    # re-derivable: same epoch gives the identical order again
    again = [
        r.doc_id
        for r in docs.withColumn("k", epoch_order_key("doc_id", 1))
        .orderBy("k", "doc_id")
        .collect()
    ]
    assert again == orders[1]


def test_shard_id_rejects_bad_count(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shard_id("doc_id", 0)


def test_md5_int32_matches_python(spark):
    import hashlib

    df = spark.createDataFrame([("abc",), ("",), ("42",)], "v string")
    got = {r.v: r.h for r in df.select("v", md5_int32("v").alias("h")).collect()}
    for v in ("abc", "", "42"):
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
