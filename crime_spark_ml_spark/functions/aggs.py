"""Aggregate-expression helpers.

``dec_sum``: floating-point SUM is order-dependent (IEEE addition is
non-associative), so a distributed partial+final sum of doubles is not
bit-reproducible across engines or even across runs with different
partitioning. For oracle-checked results we sum in DECIMAL — exact and
order-independent — and cast the total back to DOUBLE. The per-row
double→decimal rounding is deterministic, so Spark and DuckDB produce
identical totals regardless of partitioning. This is also the right
call at 100 TB: reproducible aggregates across retries/AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, scale: int = 4, precision: int = 28) -> Column:
    """Exact SUM over doubles via decimal accumulation, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dec_sum_sql(expr: str, scale: int = 4, precision: int = 28) -> str:
    """The DuckDB-side twin of ``dec_sum`` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def try_corr(x: str, y: str) -> Column:
    """ANSI-safe Pearson correlation: NULL instead of DIVIDE_BY_ZERO
    when either column has zero variance (Spark 4's ANSI default makes
    ``F.corr`` throw on constant columns)."""
    cx, cy = F.col(x).cast("double"), F.col(y).cast("double")
    cov = F.avg(cx * cy) - F.avg(cx) * F.avg(cy)
    return F.try_divide(cov, F.stddev_pop(cx) * F.stddev_pop(cy))
