#!/usr/bin/env python
"""Oracle parity under a VANILLA SparkSession — the session shape the
driver actually uses (its own builder, unknown confs, possibly
non-UTC). The repo's get_spark sets UTC + nanosAsLong + AQE; this
probe deliberately sets NONE of them except a hostile half-hour-offset
timezone, so any query whose values depend on a repo session conf
fails here before it fails in a driver window. TIMESTAMP_NTZ
discipline (sources/catalog.normalize_events) is what makes this hold.

Usage: python tools/run_vanilla_probe.py [sf_dir] [query ...]
Default: a family-spanning ~100-query sample at sf0.01; pass names to
probe specific queries, or 'all' for the full registry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from crime_spark_ml_spark.plans.parity import _duckdb_conn, compare_query  # noqa: E402
from crime_spark_ml_spark.plans.registry import load_all_plans  # noqa: E402


def _sample(names: list[str]) -> list[str]:
    fams: dict[str, list[str]] = {}
    for n in names:
        fams.setdefault(n.split("_", 1)[0], []).append(n)
    out: set[str] = set()
    for ns in fams.values():
        out.update(ns[:3] + ns[-2:])
    out.update(
        n
        for n in (
            "ev_window_tumbling", "ev_sessionize", "ev_gap_fill",
            "ev_busy_time_per_day", "fn_date_suite", "ev_funnel_latency",
            "stream_batch_parity", "dp_latest_snapshot",
            "w_session_window_native", "ev_time_weighted_avg",
            "dp_wellformed_audit",
        )
        if n in names
    )
    return sorted(out)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = [a for a in args if not os.path.isdir(a)]
    spark = (
        SparkSession.builder.master("local[8]")
        # half-hour offset: the nastiest common timezone
        .config("spark.sql.session.timeZone", "Asia/Kolkata")
        .appName("vanilla-probe")
        .getOrCreate()
    )
    specs = load_all_plans()
    names = sorted(specs)
    targets = names if only == ["all"] else (only or _sample(names))
    con = _duckdb_conn(sf_dir)
    bad = 0
    try:
        for n in targets:
            r = compare_query(n, specs[n], spark, con, sf_dir)
            flag = "OK " if r.ok else "!! "
            print(f"{flag}{n:36s} {r.status:10s} {r.detail}")
            bad += 0 if r.ok else 1
    finally:
        con.close()
    print(f"\n{len(targets) - bad}/{len(targets)} pass on the vanilla session")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
