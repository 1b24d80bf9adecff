"""Vector column expressions over ``array<float>`` embeddings.

All arithmetic is JVM-side via higher-order functions (zip_with /
aggregate) inside whole-stage codegen — no Python UDFs in the hot
path. Accumulation is sequential in DOUBLE, which is bit-reproducible
and matches DuckDB's ``list_dot_product(CAST(... AS DOUBLE[]))``
(verified bit-for-bit), so cosine results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.expr(
        f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )


def l2_normalize(a: str) -> Column:
    """Unit-L2 copy of a float/double array (array<double> out).

    Zero-norm vectors pass through unchanged (an all-zero embedding
    stays all-zero instead of NaN-ing), NULL stays NULL. The norm is
    bound ONCE via the one-element-array transform idiom (the
    build_ivfpq residual-binding pattern) — a bare
    ``transform(a, v -> v / sqrt(aggregate(a, ...)))`` re-evaluates
    the aggregate subtree per element, dim× row work."""
    n = (
        f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    return F.expr(
        f"element_at(transform(array({n}), "
        f"n -> CASE WHEN n = 0.0 THEN transform({a}, v -> CAST(v AS DOUBLE)) "
        f"ELSE transform({a}, v -> CAST(v AS DOUBLE) / n) END), 1)"
    )


def cosine(a: str, b: str) -> Column:
    """NULL (never ANSI DIVIDE_BY_ZERO) for zero-norm vectors —
    matching the pandas twin's defined-on-everything behavior."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of ``cosine`` — same sequential double arithmetic."""
    da, db = f"CAST({a} AS DOUBLE[])", f"CAST({b} AS DOUBLE[])"
    return (
        f"(list_dot_product({da}, {db}) / "
        f"(sqrt(list_dot_product({da}, {da})) * sqrt(list_dot_product({db}, {db}))))"
    )
