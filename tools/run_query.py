#!/usr/bin/env python
"""Run any registered query by name against a fixture directory.

Usage:
  python tools/run_query.py q1_pricing_summary
  python tools/run_query.py dp_dedup_pipeline --sf-dir /root/testdata/sf0.1
  python tools/run_query.py ev_sessionize --explain           # plan only
  python tools/run_query.py dp_ann_bruteforce --limit 50
  python tools/run_query.py --list [--tag streaming]

The single-query CLI a user points at their own parquet directory
(any dir with the fixture table layout works — the registered builders
only ever read through sources/catalog.load_table). ``--explain``
prints the formatted physical plan instead of executing, ``--oracle``
prints the registered DuckDB oracle SQL for the query (or a note that
it is rows-only by contract).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crime_spark_ml_spark.plans.registry import load_all_plans  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--limit", type=int, default=20, help="rows to show (0 = all)")
    ap.add_argument("--explain", action="store_true", help="print the physical plan, don't execute")
    ap.add_argument("--oracle", action="store_true", help="print the registered oracle SQL")
    ap.add_argument("--list", action="store_true", dest="list_queries", help="list registered queries")
    ap.add_argument("--tag", default=None, help="filter --list by tag substring")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    specs = load_all_plans()
    if args.list_queries:
        for name in sorted(specs):
            s = specs[name]
            if args.tag and not any(args.tag in t for t in s.tags):
                continue
            kind = "oracle" if s.oracle else "rows-only"
            print(f"{name:40s} [{kind}] tags={','.join(s.tags)}")
        return
    if not args.query:
        sys.exit("error: pass a query name or --list")
    if args.query not in specs:
        import difflib

        hint = difflib.get_close_matches(args.query, specs, n=3)
        sys.exit(f"error: unknown query {args.query!r}" + (f" — did you mean {hint}?" if hint else ""))
    spec = specs[args.query]
    if args.oracle:
        print(spec.oracle.strip() if spec.oracle else "(rows-only by contract — no SQL oracle registered)")
        return

    from crime_spark_ml_spark.session import get_spark

    spark = get_spark("run-query", cpus=args.cpus)
    df = spec.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return
    n = df.count()
    df.show(args.limit if args.limit else n, truncate=False)
    print(f"[{args.query}] {n} rows at {args.sf_dir}")


if __name__ == "__main__":
    main()
