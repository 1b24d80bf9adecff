"""Reshaping: pivot (crime.py:72-73) and melt (crime.py:161-163).

Pivot at scale: Spark's ``pivot(col)`` without a value list runs an
extra distinct-scan job to discover pivot columns; the engine always
passes the value list explicitly (SURVEY.md §4). Output width =
#values, so pivots stay narrow aggregates — safe at any row count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_counts(df: DataFrame, index: str, columns: str, values: Sequence[str]) -> DataFrame:
    """Contingency table: count of rows per (index, columns) pair, one
    output column per pivot value, missing combos filled with 0
    (pandas ``pivot_table(aggfunc=len, fill_value=0)`` semantics)."""
    return df.groupBy(index).pivot(columns, list(values)).count().na.fill(0)


def melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long (pandas ``melt`` semantics; Spark's native unpivot)."""
    return df.unpivot(list(ids), list(values), var_name, value_name)
