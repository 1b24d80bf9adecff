#!/usr/bin/env python
"""Physical-plan audit over the whole registry → PLAN_AUDIT.md.

The plan linter (tests/test_plan_linter.py) is the hard gate — no
CartesianProduct, no row-UDF nodes, BroadcastNestedLoopJoin only via
the justified allow-list. This tool is the OBSERVABILITY half: for
every registered query it records the structural cost drivers a
scale review asks about —

- number of Exchange (shuffle) nodes, and how many of them AQE turned
  into broadcasts or reused,
- broadcast-join count (small sides shipped instead of shuffled),
- whether the parquet scans carry PushedFilters (predicate reached
  storage) and how many columns the ReadSchema retains (pruning),
- whole-stage-codegen span count (JVM-compiled pipeline sections).

Usage: python tools/plan_report.py [sf_dir] [out_md]
Plans are built at sf0.001 by default — node structure, not data, is
what's audited (AQE runtime re-plans are noted by the driver bench,
not here).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crime_spark_ml_spark.plans.registry import load_all_plans  # noqa: E402
from crime_spark_ml_spark.session import get_spark  # noqa: E402

# queries that EXECUTE work at plan-build time (streaming runs, index
# builds, ML fits) — their returned frame is a materialized result, so
# the structural numbers describe the final local relation, not the
# pipeline; mark them so the report is honest
MATERIALIZED = re.compile(
    r"^(stream_|dp_ann_(ivfpq|selfcheck|refine)|dp_dedup_pipeline|ml_|dp_pagerank)"
)


def audit(df, plan: str) -> dict[str, int | bool]:
    # AQE prints the INITIAL plan without codegen markers; the codegen
    # explain mode reports subtree count directly
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    codegen = df._jdf.queryExecution().explainString(mode)
    found = re.search(r"Found (\d+) WholeStageCodegen", codegen)
    return {
        "exchanges": plan.count("Exchange "),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "codegen_spans": int(found.group(1)) if found else 0,
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "scans": plan.count("Scan parquet"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.md"
    spark = get_spark("plan-report")
    # AQE inserts codegen per-stage at EXECUTION, so an unexecuted
    # adaptive plan always reports 0 subtrees; audit the static plan
    # (AQE only improves on it at runtime — never adds shuffles)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    specs = load_all_plans()
    rows = []
    for name in sorted(specs):
        try:
            df = specs[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append((name, audit(df, plan), bool(MATERIALIZED.match(name)), None))
        except Exception as exc:  # a broken plan must be visible, not skipped
            rows.append((name, {}, False, str(exc)[:120]))

    lines = [
        "# PLAN_AUDIT — structural cost audit of every registered query",
        "",
        f"Built at `{sf_dir}`; {len(rows)} queries. `mat` marks queries that",
        "materialize inside the builder (streaming runs, index builds, ML",
        "fits) — their plan describes the final local relation, and their",
        "pipeline cost is audited by their own plan-pin tests instead.",
        "",
        "| query | exchanges | bcast joins | SMJ | codegen spans | pushed filters | scans | mat |",
        "|---|---|---|---|---|---|---|---|",
    ]
    errors = []
    for name, a, mat, err in rows:
        if err is not None:
            errors.append((name, err))
            continue
        lines.append(
            f"| {name} | {a['exchanges']} | {a['broadcast_joins']} | "
            f"{a['sortmerge_joins']} | {a['codegen_spans']} | "
            f"{'yes' if a['pushed_filters'] else '—'} | {a['scans']} | "
            f"{'yes' if mat else ''} |"
        )
    if errors:
        lines += ["", "## Plan-build errors", ""]
        lines += [f"- **{n}**: {e}" for n, e in errors]
    totals = [a for _, a, m, e in rows if e is None and not m]
    if totals:
        lines += [
            "",
            f"Pipeline queries (non-materialized): {len(totals)}; "
            f"total exchanges {sum(a['exchanges'] for a in totals)}, "
            f"broadcast joins {sum(a['broadcast_joins'] for a in totals)}, "
            f"sort-merge joins {sum(a['sortmerge_joins'] for a in totals)}; "
            f"{sum(1 for a in totals if a['pushed_filters'])} carry pushed filters.",
        ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}: {len(rows) - len(errors)} audited, {len(errors)} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
