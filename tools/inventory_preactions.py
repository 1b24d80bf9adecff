"""Inventory plan-BUILD-time DataFrame actions across the registry.

A registered plan function should normally return a lazy DataFrame; any
collect/first/count/take/toPandas it runs while BUILDING the plan is an
extra job per query at scale (the r06 verdict nit). This tool
intercepts the Python-level DataFrame action methods during every
plan-build at sf0.001 and prints which plans run which actions — the
data behind tests/test_plan_linter.py's pre-action allow-list.

Usage: python tools/inventory_preactions.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACTIONS = ("collect", "first", "head", "count", "take", "toPandas", "toLocalIterator")


def inventory(spark, sf_dir: str, specs: dict) -> dict[str, list[str]]:
    """{plan name: sorted action methods it invoked during build}.
    Errors surface as an '<ERROR: …>' pseudo-action so a broken build
    cannot masquerade as action-free."""
    from pyspark.sql import DataFrame

    recorded: dict[str, set[str]] = {}
    orig = {m: getattr(DataFrame, m) for m in ACTIONS}
    current: list[str | None] = [None]

    def wrap(m):
        f = orig[m]

        def inner(self, *a, **k):
            if current[0] is not None:
                recorded.setdefault(current[0], set()).add(m)
            return f(self, *a, **k)

        return inner

    try:
        for m in ACTIONS:
            setattr(DataFrame, m, wrap(m))
        for name in sorted(specs):
            current[0] = name
            try:
                specs[name].fn(spark, sf_dir)
            except Exception as e:  # noqa: BLE001 — inventory must complete
                recorded.setdefault(name, set()).add(
                    f"<ERROR: {type(e).__name__}: {e}>"
                )
    finally:
        current[0] = None
        for m, f in orig.items():
            setattr(DataFrame, m, f)
    return {n: sorted(ms) for n, ms in sorted(recorded.items())}


def main() -> None:
    from crime_spark_ml_spark.plans.registry import load_all_plans
    from crime_spark_ml_spark.session import get_spark

    spark = get_spark("preaction-inventory", cpus=8, shuffle_partitions=8)
    got = inventory(spark, "/root/testdata/sf0.001", load_all_plans())
    for name, methods in got.items():
        print(f"{name}: {', '.join(methods)}")
    print(f"\n{len(got)} plans run build-time actions")


if __name__ == "__main__":
    main()
