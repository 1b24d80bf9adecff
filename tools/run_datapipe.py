#!/usr/bin/env python
"""Run the LLM training-data pipeline end-to-end over the documents
table: normalize → exact dedup → near-dup dedup (MinHash-LSH +
connected components, min-id representative) → temperature source
mix → chunk → pack → held-out hash sample, writing each stage as parquet.

Usage:
  python tools/run_datapipe.py [--sf-dir /root/testdata/sf0.01] [--out DIR]
                               [--chunk 20] [--pack-budget 100]

Every stage is the same operator the registered queries use — this CLI
just composes them into the one-command corpus pass a pipeline operator
would schedule, and prints a per-stage row-count funnel.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crime_spark_ml_spark.operators.chunk import chunk_documents  # noqa: E402
from crime_spark_ml_spark.operators.dedup import (  # noqa: E402
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_candidates,
)
from crime_spark_ml_spark.operators.mix import temperature_mix  # noqa: E402
from crime_spark_ml_spark.session import get_spark  # noqa: E402
from crime_spark_ml_spark.sources.catalog import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--pack-budget", type=int, default=100)
    ap.add_argument("--mix-scale", type=float, default=50.0, dest="mix_scale")
    args = ap.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="datapipe_out_")
    spark = get_spark("datapipe")
    funnel: list[tuple[str, int]] = []

    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    funnel.append(("input_docs", docs.count()))

    # 1. normalize (lower/strip/collapse — idempotent, row-local)
    normalized = docs.withColumn(
        "text",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
            )
        ),
    )

    # 2. exact dedup: min-id winner per md5 digest
    winners = exact_dedup(normalized).select("doc_id")
    exact_kept = normalized.join(winners, "doc_id")
    funnel.append(("after_exact_dedup", exact_kept.count()))

    # 3. near-dup dedup: LSH candidates → components → min-id rep
    pairs = minhash_lsh_candidates(
        exact_kept, parallelism=spark.sparkContext.defaultParallelism
    )
    clusters = duplicate_clusters(pairs, exact_kept.select("doc_id"))
    reps = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    deduped = exact_kept.join(reps.select("doc_id"), "doc_id")
    deduped.write.mode("overwrite").parquet(f"{out}/deduped")
    # read the materialized stage back: downstream stages and counts
    # must not re-derive the whole normalize+LSH+clustering lineage
    # (each action would re-run the full corpus pass)
    deduped = spark.read.parquet(f"{out}/deduped")
    funnel.append(("after_near_dedup", deduped.count()))

    # 4. temperature source mixing: per-source quota ∝ n_docs·tokens^-0.5
    # (sampled tokens ~ tokens^0.5 — upweights small sources); 0 disables
    if args.mix_scale > 0:
        mixed = temperature_mix(deduped, scale=args.mix_scale)
        mixed.write.mode("overwrite").parquet(f"{out}/mixed")
        # materialize-then-read like stage 3: downstream actions must not
        # re-run the mix aggregations per action
        deduped = spark.read.parquet(f"{out}/mixed")
        funnel.append(("after_temperature_mix", deduped.count()))

    # 5. chunk (non-overlapping windows for packing)
    chunks = chunk_documents(deduped, chunk_size=args.chunk, stride=args.chunk).join(
        F.broadcast(deduped.select("doc_id", "source")), "doc_id"
    )
    funnel.append(("chunks", chunks.count()))

    # 6. pack: per-source cumulative quota
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(F.col("n_tokens").cast("long")).over(w), F.lit(0))
    packed = chunks.withColumn(
        "pack_id", F.floor(cum / args.pack_budget).cast("int")
    )
    packed.write.mode("overwrite").partitionBy("source").parquet(f"{out}/packed")
    funnel.append(
        ("packs", packed.select("source", "pack_id").distinct().count())
    )

    # 7. held-out sample: deterministic content-hash carve (~25%)
    heldout = deduped.where(
        F.substring(F.md5("text"), 1, 1).isin("0", "1", "2", "3")
    )
    heldout.write.mode("overwrite").parquet(f"{out}/heldout")
    funnel.append(("heldout_docs", heldout.count()))

    for stage, n in funnel:
        print(f"{stage:22s} {n}")
    print(f"outputs under {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
