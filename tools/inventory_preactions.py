"""Inventory plan-BUILD-time DataFrame actions across the registry.

A registered plan function should normally return a lazy DataFrame; any
collect/first/count/take/toPandas it runs while BUILDING the plan is an
extra job per query at scale (the r06 verdict nit). This tool
intercepts the Python-level DataFrame action methods during every
plan-build at sf0.001 and prints which plans run which actions FROM
WHERE — the data behind tests/test_plan_linter.py's pre-action
allow-list.

Usage: python tools/inventory_preactions.py
"""

from __future__ import annotations

import contextlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACTIONS = ("collect", "first", "head", "count", "take", "toPandas", "toLocalIterator")


@contextlib.contextmanager
def action_recorder():
    """Context manager intercepting DataFrame actions; yields a set of
    '<method>@<file>:<function>' strings attributing each OUTERMOST
    action to the first non-pyspark caller frame. Patches the CONCRETE
    class (Spark 4: pyspark.sql.DataFrame is the abstract facade;
    classic.dataframe.DataFrame overrides every action, and first ->
    head -> take -> collect chain internally, so only the outermost
    call is recorded)."""
    from pyspark.sql.classic.dataframe import DataFrame

    recorded: set[str] = set()
    orig = {m: getattr(DataFrame, m) for m in ACTIONS}
    depth = [0]

    def caller() -> str:
        for frame in reversed(traceback.extract_stack()[:-2]):
            f = frame.filename
            if "pyspark" in f or f.endswith("inventory_preactions.py"):
                continue
            return f"{os.path.basename(f)}:{frame.name}"
        return "<unknown>"

    def wrap(m):
        f = orig[m]

        def inner(self, *a, **k):
            if depth[0] == 0:
                recorded.add(f"{m}@{caller()}")
            depth[0] += 1
            try:
                return f(self, *a, **k)
            finally:
                depth[0] -= 1

        return inner

    try:
        for m in ACTIONS:
            setattr(DataFrame, m, wrap(m))
        yield recorded
    finally:
        for m, f in orig.items():
            setattr(DataFrame, m, f)


def inventory(spark, sf_dir: str, specs: dict) -> dict[str, list[str]]:
    """{plan name: sorted 'method@caller' strings during build}.
    Errors surface as an '<ERROR: …>' pseudo-action so a broken build
    cannot masquerade as action-free."""
    out: dict[str, list[str]] = {}
    for name in sorted(specs):
        with action_recorder() as rec:
            try:
                specs[name].fn(spark, sf_dir)
            except Exception as e:  # noqa: BLE001 — inventory must complete
                rec.add(f"<ERROR: {type(e).__name__}: {e}>")
        if rec:
            out[name] = sorted(rec)
    return out


def main() -> None:
    from crime_spark_ml_spark.plans.registry import load_all_plans
    from crime_spark_ml_spark.session import get_spark

    spark = get_spark("preaction-inventory", cpus=8, shuffle_partitions=8)
    got = inventory(spark, "/root/testdata/sf0.001", load_all_plans())
    for name, methods in got.items():
        print(f"{name}: {'; '.join(methods)}")
    print(f"\n{len(got)} plans run build-time actions")


if __name__ == "__main__":
    main()
