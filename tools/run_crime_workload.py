#!/usr/bin/env python
"""Run the reference's complete crime workload end-to-end.

Usage:
  python tools/run_crime_workload.py --synthesize 5000 [--out DIR]
  python tools/run_crime_workload.py --train train.csv --test test.csv [--out DIR]

With --synthesize, a deterministic crime-shaped dataset is generated
first (sources/crimegen.py) and written as CSV, then consumed exactly
like the reference consumes the Kaggle files.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crime_spark_ml_spark.session import get_spark  # noqa: E402
from crime_spark_ml_spark.workload import run_crime_workload  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train")
    ap.add_argument("--test")
    ap.add_argument("--synthesize", type=int, default=0)
    ap.add_argument("--out")
    args = ap.parse_args()
    spark = get_spark("crime-workload")
    train_path, test_path = args.train, args.test
    if args.synthesize:
        from crime_spark_ml_spark.sources.crimegen import crime_table, crime_test_table

        base = tempfile.mkdtemp(prefix="crime_csv_")
        train_path = os.path.join(base, "train")
        test_path = os.path.join(base, "test")
        crime_table(spark, args.synthesize).coalesce(1).write.option(
            "header", "true"
        ).csv(train_path)
        crime_test_table(spark, max(args.synthesize // 3, 10)).coalesce(1).write.option(
            "header", "true"
        ).csv(test_path)
        print(f"synthesized {args.synthesize} train rows under {base}")
    if not train_path:
        ap.error("--train or --synthesize required")
    res = run_crime_workload(
        spark, train_path, test_path, output_path=args.out, num_trees=20, max_depth=8
    )
    print("== category counts (top 5) ==")
    res.category_counts.show(5, truncate=False)
    print("== district counts ==")
    res.district_counts.show(10, truncate=False)
    print("== district x category pivot (first 3 cols) ==")
    res.district_category_pivot.select(
        res.district_category_pivot.columns[:4]
    ).show(10, truncate=False)
    print("== top-8 |corr| with Category ==")
    res.corr_with_target.show(truncate=False)
    print(f"== holdout accuracy: {res.accuracy:.4f} ==")
    print(f"== predictions: {res.predictions.count()} rows ==")
    if args.out:
        print(f"prediction table written to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
