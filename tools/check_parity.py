#!/usr/bin/env python
"""CLI mirror of the driver's correctness gate.

Usage: python tools/check_parity.py [sf_dir] [query ...]
Default sf_dir: /root/testdata/sf0.01 (the driver's correctness scale).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crime_spark_ml_spark.plans.parity import run_parity  # noqa: E402
from crime_spark_ml_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    # a mistyped sf_dir must NOT silently become a query-name filter
    # (the gate would run zero queries and exit 0)
    if args and not os.path.isdir(args[0]) and ("/" in args[0] or "\\" in args[0]):
        print(f"error: sf_dir {args[0]!r} is not a directory", file=sys.stderr)
        return 2
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = [a for a in args if not os.path.isdir(a)] or None
    if only:
        # every requested name must exist — a typo among several valid
        # names must not silently skip the query the user meant to check
        from crime_spark_ml_spark.plans.registry import all_queries

        unknown = sorted(set(only) - set(all_queries()))
        if unknown:
            print(f"error: unknown query name(s): {unknown}", file=sys.stderr)
            return 2
    spark = get_spark("check-parity")
    results = run_parity(spark, sf_dir, only=only)
    if not results:
        print(f"error: no registered queries matched filter {only}", file=sys.stderr)
        return 2
    bad = 0
    for r in results:
        flag = "OK " if r.ok else "!! "
        print(f"{flag}{r.name:34s} {r.status:10s} rows={r.spark_rows:<7d} {r.detail}")
        bad += 0 if r.ok else 1
    print(f"\n{len(results) - bad}/{len(results)} queries pass parity at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
