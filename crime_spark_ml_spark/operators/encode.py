"""Label encoding — the reference's core column transform.

Semantics: sklearn ``LabelEncoder`` per column (reference crime.py:38-39
``d = defaultdict(LabelEncoder); sf.apply(lambda x: d[x.name].fit_transform(x))``
and per-column at crime.py:111-120): dense integer codes 0..n-1 assigned
in **lexicographically ascending** order of the distinct values
(sklearn uses ``np.unique``).

Scale design: a global ``dense_rank`` window over the full table would
funnel every row through one partition. Instead we build the per-column
dictionary from DISTINCT values (cardinality ≤ distinct count, tiny
relative to 100 TB of rows), rank only the dictionary, and broadcast-
join codes back — one shuffle for the distinct, zero for the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_dictionary(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of ``col`` with dense codes in ascending order."""
    w = Window.orderBy(F.col(col))
    return (
        df.select(col)
        .where(F.col(col).isNotNull())
        .distinct()
        .withColumn(f"{col}_code", (F.row_number().over(w) - F.lit(1)).cast("int"))
    )


def label_encode(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append ``<col>_code`` for each requested column (E1/E2).

    Fit-on-this-frame semantics; for train/test flows fit the
    dictionaries on train via ``label_dictionary`` and join onto test
    (the reference's independent re-fit on test, crime.py:117-120, is a
    leakage bug we do not replicate by default — SURVEY.md §2.4 E2).
    """
    out = df
    for c in cols:
        out = out.join(F.broadcast(label_dictionary(df, c)), on=c, how="left")
    return out
