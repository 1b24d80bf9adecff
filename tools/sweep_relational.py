"""Exploratory sweep: run every relational-oracle query against a
degenerate clone of the TPC-H-ish fixtures (NULL keys, NULL measures,
empty strings, dangling FKs, out-of-domain values — everything the
driver fixtures never contain) and report engine/oracle divergences.

Usage: python tools/sweep_relational.py [only_query ...]
The permanent pin lives in tests/test_parity_harness.py; this tool is
the iteration loop for fixing divergences.
"""

from __future__ import annotations

import datetime
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"

REL_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def build_degenerate_relational_dir(
    base_dir: str, out_dir: str, nonfinite: bool = False
) -> str:
    """Clone base_dir, appending degenerate rows to every relational
    table. Non-relational tables symlink through unchanged. Key ranges
    start at 900001/990001/... so they never collide with fixture keys.

    ``nonfinite=True`` additionally appends NaN/±Inf measure rows
    (keys 910001+) — kept OUT of the default clone because the
    analytics family's finite-measure adoption is a separate campaign
    (exploration found 29 engine/oracle divergences, dominated by
    DuckDB raising on NaN→DECIMAL where Spark's cast silently NULLs);
    today only the ingest gate (dp_wellformed_audit) contracts to
    count them.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    touched = {f"{t}.parquet" for t in REL_TABLES}
    for f in os.listdir(base_dir):
        if f.endswith(".parquet") and f not in touched:
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(base_dir, f), dst)

    d = lambda *a: datetime.datetime(*a)  # noqa: E731
    extras = {
        # orphan custkey / dangling custkey / NULL+empty strings /
        # NULL price+date / out-of-domain status+priority / negatives
        "orders": [
            (900001, None, "F", 100.0, d(1995, 6, 1), "1-URGENT"),
            (900002, 999999, "O", 200.0, d(1996, 7, 2), "5-LOW"),
            (900003, 1, None, None, d(1997, 8, 3), None),
            (900004, 1, "", 0.0, None, ""),
            (900005, 1, "X", -50.0, d(1998, 9, 4), "9-WEIRD"),
        ],
        # all-NULL measures / dangling orderkey + zero measures /
        # discount=1.0 + empty flags / NULL orderkey / negative qty +
        # NULL shipdate
        "lineitem": [
            (900001, None, None, 1, None, None, None, None, None, None, None),
            (999999, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", d(1995, 1, 1)),
            (900002, 1, 1, 2, 5.0, 100.0, 1.0, 0.1, "", "", d(1995, 2, 2)),
            (None, 1, 1, 3, 2.0, 50.0, 0.05, 0.02, "R", "F", d(1995, 3, 3)),
            (900003, 1, 1, 1, -3.0, -10.0, 0.5, 0.0, "A", "F", None),
        ],
        # all-NULL attrs / empty strings + dangling nationkey /
        # negative acctbal / customer with no orders
        "customer": [
            (990001, None, None, None, None),
            (990002, "", 999, 0.0, ""),
            (990003, "degenerate negative", 0, -100.0, "BUILDING"),
            (990004, "no orders customer", 1, 50.0, "MACHINERY"),
        ],
        "supplier": [
            (980001, None, None, None),
            (980002, "", 999, -5.0),
        ],
        # NULLs / empties / lowercase p_type + negative size+price
        "part": [
            (970001, None, None, None, None, None),
            (970002, "", "", "", 0, 0.0),
            (970003, "weird part", "BRAND#99", "promo lowercase", -1, -2.5),
        ],
        "nation": [
            (901, None, None),
            (902, "", 999),
        ],
        "region": [
            (91, None),
            (92, ""),
        ],
    }
    if nonfinite:
        nan, inf = float("nan"), float("inf")
        extras["orders"] += [
            (910001, 1, "F", nan, d(1995, 5, 5), "1-URGENT"),
            (910002, 1, "O", inf, d(1995, 5, 6), "5-LOW"),
            (910003, 1, "O", -inf, d(1995, 5, 7), "5-LOW"),
        ]
        extras["lineitem"] += [
            (910001, 1, 1, 1, nan, nan, 0.05, 0.01, "N", "O", d(1995, 5, 5)),
            (910002, 1, 1, 1, inf, inf, 0.05, 0.01, "N", "O", d(1995, 5, 6)),
            (910003, 1, 1, 1, 5.0, 100.0, nan, inf, "R", "F", d(1995, 5, 7)),
        ]
    for t in REL_TABLES:
        orig = pq.read_table(os.path.join(base_dir, f"{t}.parquet"))
        cols = list(zip(*extras[t]))
        arrays = [
            pa.array(list(cols[i]), orig.schema.field(i).type)
            for i in range(len(orig.schema))
        ]
        extra = pa.table(dict(zip(orig.schema.names, arrays))).cast(orig.schema)
        pq.write_table(pa.concat_tables([orig, extra]), os.path.join(out_dir, f"{t}.parquet"))
    return out_dir


def relational_oracle_queries(specs) -> list[str]:
    pat = re.compile(r"\b(" + "|".join(REL_TABLES) + r")\b")
    return sorted(n for n, s in specs.items() if s.oracle and pat.search(s.oracle))


def main() -> None:
    from crime_spark_ml_spark.plans.parity import _duckdb_conn, compare_query
    from crime_spark_ml_spark.plans.registry import load_all_plans
    from crime_spark_ml_spark.session import get_spark

    only = set(sys.argv[1:])
    out = os.path.join(tempfile.gettempdir(), "sf_degenerate_relational")
    sf = build_degenerate_relational_dir(SF_SMOKE, out)
    specs = load_all_plans()
    names = relational_oracle_queries(specs)
    if only:
        names = [n for n in names if n in only]
    spark = get_spark("sweep-relational", cpus=8, shuffle_partitions=8)
    con = _duckdb_conn(sf)
    n_ok = 0
    failures = []
    try:
        for name in names:
            try:
                r = compare_query(name, specs[name], spark, con, sf)
            except Exception as e:  # noqa: BLE001
                failures.append(f"{name}: EXC {type(e).__name__}: {e}")
                print(f"FAIL {name}: EXC {type(e).__name__}: {e}", flush=True)
                continue
            if r.ok:
                n_ok += 1
                print(f"OK   {name}", flush=True)
            else:
                failures.append(f"{name}: {r.status} {r.detail}")
                print(f"FAIL {name}: {r.status} {r.detail[:300]}", flush=True)
    finally:
        con.close()
    print(f"\n{n_ok}/{len(names)} ok, {len(failures)} failures")
    for f in failures:
        print(" -", f[:400])


if __name__ == "__main__":
    main()
