"""Vector column expressions over ``array<float>`` embeddings.

Arithmetic is sequential in DOUBLE, which is bit-reproducible and
matches DuckDB's ``list_dot_product(CAST(... AS DOUBLE[]))`` (verified
bit-for-bit), so cosine results are oracle-checkable. Two equivalent
dot-product forms exist: ``dot`` (Catalyst zip_with/aggregate fold —
fine when evaluated once per row) and ``dot_arrow`` (vectorized numpy
twin behind one ArrowEvalPython — the bulk-scoring path; the HOF fold
is CodegenFallback and interpreted per element, which dominates when a
join produces millions of scored pairs). Both fold in the same index
order with the same float64 ops, pinned bit-identical in
tests/test_datapipe.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def dot(a: str, b: str) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


@pandas_udf(DoubleType())  # DoubleType object: a DDL string would need a live session at import
def _dot_seq_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized twin of ``dot``: per row, the products are
    accumulated one dimension at a time (``acc += x_d * y_d`` over a
    python loop on d, vectorized across rows) — the SAME sequential
    left fold as the zip_with/aggregate expression, NOT numpy's
    pairwise ``(a*b).sum()``, so results are bit-identical for
    well-formed inputs. NULL arrays and length-mismatched pairs yield
    NULL (zip_with pads the short side with NULLs, nulling the fold).
    Deviation, documented: a NaN *element* yields NULL here (Arrow's
    pandas bridge folds NaN into null) where the expression yields NaN
    — every caller scores norm-paired cosines where a NaN element
    already NaNs the JVM norm product, so the composed try_divide cos
    is NULL-identical either way; keep non-finite-capable inputs on
    ``dot`` if the raw dot of NaN vectors ever matters."""
    n = len(a)
    out = np.full(n, np.nan, dtype=np.float64)
    av, bv = a.values, b.values
    lens = np.fromiter(
        (
            -1 if x is None or y is None or len(x) != len(y) else len(x)
            for x, y in zip(av, bv)
        ),
        dtype=np.int64,
        count=n,
    )
    for d in np.unique(lens):
        if d < 0:
            continue
        idx = np.nonzero(lens == d)[0]
        if d == 0:
            out[idx] = 0.0
            continue
        A = np.concatenate(av[idx].tolist()).astype(np.float64).reshape(len(idx), d)
        B = np.concatenate(bv[idx].tolist()).astype(np.float64).reshape(len(idx), d)
        # seed 0.0 + accumulate per dim — the exact fold order of the
        # expression (signed zeros included), not numpy pairwise sum
        acc = np.zeros(len(idx), dtype=np.float64)
        for col in range(d):
            acc += A[:, col] * B[:, col]
        out[idx] = acc
    return pd.Series(out)


# deterministic in fact, but marked otherwise so the optimizer cannot
# clone the evaluation below a pushed filter (guide §4.4: one
# ArrowEvalPython, not one per consumer of the cos column)
_dot_seq_pd_once = _dot_seq_pd.asNondeterministic()


def dot_arrow(a: str, b: str) -> Column:
    """``dot`` computed in one ArrowEvalPython batch pass — use for
    bulk pair scoring (candidate joins); see ``_dot_seq_pd``."""
    return _dot_seq_pd_once(F.col(a), F.col(b))


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
