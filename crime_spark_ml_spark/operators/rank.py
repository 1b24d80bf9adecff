"""Distributed exact global ranking — no single-partition window.

A bare ``row_number() OVER (ORDER BY ...)`` funnels the whole relation
through one task; at 100 TB that is the canonical scale-killer. This
module holds the shared range-partitioned alternative used by label
encoding (SURVEY.md §2.4 E1, reference crime.py:38-39), WoE binning,
Gini ranking, and the group-sequential look assignment:

    repartitionByRange on the total order (ascending key ranges land in
    ascending partition ids) -> row_number within each partition in
    parallel -> driver-side prefix sum of the <=#partitions partition
    sizes -> broadcast the offsets back.

The only collect is #partitions ints, so the pattern survives any
corpus size; the order columns must form a deterministic TOTAL order
(include a unique tie-break key), which every caller needs anyway for
engine-parity determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order_cols: list, out_col: str = "__g"
) -> tuple[DataFrame, int]:
    """Append an exact 1-based global row number over ``order_cols``.

    Returns ``(df + out_col, n_rows)`` — the total count falls out of
    the prefix sum for free, saving callers a second pass. Internal
    ``__pid``/``__r``/``__off`` columns are dropped from the result.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    ranked = ranged.withColumn("__r", F.row_number().over(w))
    # per-partition sizes → prefix-sum offsets (≤ #partitions rows on the driver)
    sizes = sorted(
        (r["__pid"], r["n"])
        for r in ranked.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in sizes:
        offsets[pid] = acc
        acc += cnt
    offset_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long"
    )
    out = (
        ranked.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__r"))
        .drop("__pid", "__r", "__off")
    )
    return out, acc


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    out_col: str = "__g",
) -> DataFrame:
    """Exact 1-based row number over ``order_cols`` WITHIN each group —
    the grouped twin of :func:`global_row_number`, for when the groups
    themselves are data-sized (a plain ``partitionBy(group)`` window
    would funnel each whole group through one task).

    Range-partition on (group, order) so each partition holds
    contiguous runs; row_number within (partition, group) in parallel;
    collect the per-(partition, group) sizes (≤ #partitions × #groups
    rows — callers should have FEW groups, e.g. a model/arm column)
    and broadcast per-group prefix offsets back.
    """
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*gcols, *ocols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid", *gcols).orderBy(*ocols)
    ranked = ranged.withColumn("__r", F.row_number().over(w))
    sizes = (
        ranked.groupBy("__pid", *gcols)
        .agg(F.count("*").alias("n"))
        .collect()
    )
    acc: dict[tuple, int] = {}
    rows = []
    for r in sorted(sizes, key=lambda r: (tuple(str(r[c]) for c in group_cols), r["__pid"])):
        key = tuple(r[c] for c in group_cols)
        rows.append((r["__pid"], *key, acc.get(key, 0)))
        acc[key] = acc.get(key, 0) + r["n"]
    schema_groups = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in group_cols
    )
    offset_df = df.sparkSession.createDataFrame(
        rows, f"__pid int, {schema_groups}, __off long"
    )
    return (
        ranked.join(F.broadcast(offset_df), ["__pid", *group_cols])
        .withColumn(out_col, F.col("__off") + F.col("__r"))
        .drop("__pid", "__r", "__off")
    )


def grouped_prefix_sums(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    sums: dict[str, str],
) -> DataFrame:
    """Exact running totals over ``order_cols`` within each group,
    without funneling a group through one task — the prefix-SUM twin
    of :func:`grouped_row_number`, for sequential-walk statistics
    (SPRT log-likelihood paths, CUSUM) whose groups are data-sized.

    ``sums`` maps value column -> output running-total column (pass a
    literal-1 column for a running count). Same machinery: range-
    partition on (group, order), cumulative sums within each
    (partition, group) in parallel, collect the per-(partition, group)
    TOTALS (≤ #partitions × #groups tiny rows), prefix them per group
    on the driver, broadcast the offsets back.
    """
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*gcols, *ocols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("__pid", *gcols)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranged
    for vcol, out in sums.items():
        cum = cum.withColumn(out, F.sum(vcol).over(w))
    totals = (
        cum.groupBy("__pid", *gcols)
        .agg(*[F.sum(v).alias(f"__t_{o}") for v, o in sums.items()])
        .collect()
    )
    acc: dict[tuple, list[int]] = {}
    rows = []
    outs = list(sums.values())
    for r in sorted(
        totals, key=lambda r: (tuple(str(r[c]) for c in group_cols), r["__pid"])
    ):
        key = tuple(r[c] for c in group_cols)
        offs = acc.get(key, [0] * len(outs))
        rows.append((r["__pid"], *key, *offs))
        acc[key] = [o + (r[f"__t_{out}"] or 0) for o, out in zip(offs, outs)]
    schema_groups = ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in group_cols)
    schema_offs = ", ".join(f"__off_{o} long" for o in outs)
    offset_df = df.sparkSession.createDataFrame(
        rows, f"__pid int, {schema_groups}, {schema_offs}"
    )
    out_df = cum.join(F.broadcast(offset_df), ["__pid", *group_cols])
    for o in outs:
        out_df = out_df.withColumn(o, F.col(o) + F.col(f"__off_{o}")).drop(
            f"__off_{o}"
        )
    return out_df.drop("__pid")
