#!/usr/bin/env python
"""Build, persist, and probe an IVF×PQ ANN index from the command line.

Usage:
  python tools/run_ann.py build [--sf-dir DIR] [--index PATH]
                                [--cells 16] [--m 8] [--codes 16]
  python tools/run_ann.py probe --index PATH [--sf-dir DIR]
                                [--query-ids 0,1,2] [--k 5] [--nprobe 4]

``build`` trains the coarse quantizer + residual codebooks (bounded
driver-side fits), encodes the corpus, and writes the cell-partitioned
code store; ``probe`` reads ONLY the probed cells (partition pruning)
and prints the top-k neighbors per query. Same operators the
registered dp_ann_* queries use — this CLI is the one-command face a
similarity-search operator would schedule.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crime_spark_ml_spark.ml.ivfpq import (  # noqa: E402
    build_ivfpq,
    persist_ivfpq,
    probe_ivfpq,
)
from crime_spark_ml_spark.session import get_spark  # noqa: E402
from crime_spark_ml_spark.sources.catalog import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "probe"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--index", default=None)
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--codes", type=int, default=16)
    ap.add_argument("--query-ids", default="0,1,2,3,4")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=4)
    args = ap.parse_args()
    spark = get_spark("ann-cli")
    emb = load_table(spark, args.sf_dir, "embeddings")

    if args.mode == "build":
        path = args.index or tempfile.mkdtemp(prefix="ivfpq_index_")
        n = emb.count()
        frac = None  # train_pq/build_ivf auto-bound above their row cap
        index = build_ivfpq(
            emb,
            k_cells=args.cells,
            m=args.m,
            k=args.codes,
            seed=0,
            train_fraction=frac,
        )
        persist_ivfpq(index, path)
        n_cells = index.centroids.count()
        print(f"indexed {n} vectors into {n_cells} cells at {path}")
        return 0

    if not args.index or not os.path.isdir(args.index):
        print("probe requires --index pointing at a built index", file=sys.stderr)
        return 2
    ids = [int(x) for x in args.query_ids.split(",") if x != ""]
    queries = emb.where(F.col("vec_id").isin(ids))
    top = probe_ivfpq(
        spark, args.index, queries, k=args.k, nprobe=args.nprobe
    ).orderBy("query_id", "rank")
    for r in top.collect():
        print(f"query {r.query_id}  #{r.rank}: vec {r.cand_id}  adist {r.adist}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
