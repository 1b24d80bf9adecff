"""Z-score standardization (reference crime.py:127-134,143-150: per-column
``(x − mean) / std`` with pandas' sample std, ddof=1).

Scale design: the stats are a one-row aggregate (computed with a
map-side-combinable ``avg``/``stddev_samp``); broadcasting that row
back with a crossJoin costs nothing and keeps the transform itself a
narrow map — no window over the full table, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore(df: DataFrame, cols: list[str], suffix: str = "_z") -> DataFrame:
    """Append ``<col><suffix>`` standardized columns."""
    stats = df.agg(
        *[F.avg(c).alias(f"__avg_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"__std_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        # try_divide: NULL for zero-variance columns instead of the
        # ANSI DIVIDE_BY_ZERO job abort
        out = out.withColumn(
            c + suffix,
            F.try_divide(F.col(c) - F.col(f"__avg_{c}"), F.col(f"__std_{c}")),
        )
    return out.drop(*[f"__avg_{c}" for c in cols], *[f"__std_{c}" for c in cols])
