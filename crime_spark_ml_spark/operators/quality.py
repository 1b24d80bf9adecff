"""Declarative data-quality constraints — the validation gate a
training-data (or any ingest) pipeline runs before trusting a table:
completeness, uniqueness, ranges, accepted values, pattern
conformance, referential integrity.

Design (the Deequ shape, in plain Spark): each check compiles to ONE
aggregate expression counting VIOLATIONS, and a whole suite evaluates
in a single pass over the table — one `agg(*exprs)` job producing one
row, exploded into a (check, violations, passed) report. No per-check
scans, no Python in the row path; at 100 TB a 20-check suite costs
exactly one table scan with partial aggregation. Referential integrity
is the one check that inherently needs a second relation — it's a
separate left-anti-style count kept out of the single-pass suite.

Checks report violation COUNTS rather than booleans so thresholds are
the caller's policy (0 for keys, a tolerance for free-text patterns),
and so the report is itself ORACLE-CHECKABLE as data
(plans/datapipe.py::dp_quality_suite hash-matches the full report
against DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    violations: Column  # aggregate expression counting violating rows


def not_null(col: str, name: str | None = None) -> Check:
    return Check(
        name or f"not_null({col})",
        F.count_if(F.col(col).isNull()),
    )


def unique(col: str, name: str | None = None) -> Check:
    """Violations = surplus non-null duplicates (n_non_null − n_distinct).
    NULLs are completeness's business (pair with not_null), not
    uniqueness's."""
    return Check(
        name or f"unique({col})",
        F.count(col) - F.count_distinct(F.col(col)),
    )


def in_range(
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    name: str | None = None,
) -> Check:
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Check(name or f"in_range({col})", F.count_if(cond))


def accepted_values(col: str, values: Sequence[str], name: str | None = None) -> Check:
    """NULL is not a value violation (pair with not_null)."""
    return Check(
        name or f"accepted_values({col})",
        F.count_if(F.col(col).isNotNull() & ~F.col(col).isin(list(values))),
    )


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    """Java-regex ∩ RE2 common subset, same policy as functions/text."""
    return Check(
        name or f"matches({col})",
        F.count_if(F.col(col).isNotNull() & ~F.col(col).rlike(pattern)),
    )


def check_suite(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation pass and return the
    report: (check, violations, passed) ordered by check name. The
    single wide agg is the whole point — a suite is one scan however
    many checks it carries."""
    if not checks:
        raise ValueError("empty check suite")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")
    row = df.agg(
        *[c.violations.cast("bigint").alias(f"__c{i}") for i, c in enumerate(checks)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"), F.col(f"__c{i}").alias("violations")
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("r"))
        .select(
            F.col("r.check").alias("check"),
            F.col("r.violations").alias("violations"),
            (F.col("r.violations") == 0).alias("passed"),
        )
        .orderBy("check")
    )


def ref_integrity(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphan count: child rows whose non-null ``fk`` has no match in
    ``parent.pk`` — a left-anti join aggregated to one row, the one
    check that inherently touches two relations. Returns the same
    report schema as check_suite for unioning."""
    orphans = (
        child.where(F.col(fk).isNotNull())
        .join(parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti")
        .agg(F.count("*").alias("violations"))
    )
    return orphans.select(
        F.lit(f"ref_integrity({fk}->{pk})").alias("check"),
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )
