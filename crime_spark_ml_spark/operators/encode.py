"""Label encoding — the reference's core column transform.

Semantics: sklearn ``LabelEncoder`` per column (reference crime.py:38-39
``d = defaultdict(LabelEncoder); sf.apply(lambda x: d[x.name].fit_transform(x))``
and per-column at crime.py:111-120): dense integer codes 0..n-1 assigned
in **lexicographically ascending** order of the distinct values
(sklearn uses ``np.unique``).

Scale design: a global ``dense_rank`` window over the full table would
funnel every row through one partition. Instead we build the per-column
dictionary from DISTINCT values, and rank the dictionary itself WITHOUT
a global window: range-partition it by value (ascending ranges land in
ascending partition ids), rank within each partition in parallel, and
add per-partition offsets (a tiny driver-side prefix sum). Works for
near-unique columns (the reference encodes even its timestamp column,
crime.py:38-39) as well as small dictionaries. Codes then broadcast- or
shuffle-join back depending on dictionary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.rank import global_row_number


def label_dictionary(df: DataFrame, col: str) -> DataFrame:
    """Distinct values of ``col`` with dense codes 0..n-1 in ascending
    order — distributed ranking, no single-partition global sort (the
    shared ``rank.global_row_number`` prefix-sum helper)."""
    distinct = df.select(col).where(F.col(col).isNotNull()).distinct()
    ranked, _ = global_row_number(distinct, [col], out_col="__g")
    return ranked.select(
        col, (F.col("__g") - 1).cast("int").alias(f"{col}_code")
    )


def label_encode(df: DataFrame, cols: list[str], broadcast: bool = True) -> DataFrame:
    """Append ``<col>_code`` for each requested column (E1/E2).

    Fit-on-this-frame semantics; for train/test flows fit the
    dictionaries on train via ``label_dictionary`` and join onto test
    (the reference's independent re-fit on test, crime.py:117-120, is a
    leakage bug we do not replicate by default — SURVEY.md §2.4 E2).

    ``broadcast=True`` hints the dictionary join — right for the usual
    low-cardinality categorical. Pass ``broadcast=False`` for
    near-unique columns (timestamps, addresses): their dictionaries are
    table-sized and must shuffle-join instead.
    """
    out = df
    for c in cols:
        dic = label_dictionary(df, c)
        if broadcast:
            dic = F.broadcast(dic)
        out = out.join(dic, on=c, how="left")
    return out
