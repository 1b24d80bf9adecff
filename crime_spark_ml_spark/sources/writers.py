"""Typed sinks (SURVEY.md §2.1 S4/S5).

The reference's sinks are ``print`` and an in-memory prediction table
(crime.py:205-206). At scale a sink is a partitioned columnar write:
- ``write_parquet``: snappy parquet, optionally partitioned by a
  low-cardinality column (partition pruning for downstream readers).
- ``write_predictions``: the S5 prediction table as parquet.

``repartition(n)`` before write controls file count — the classic
small-files guard: one shuffle buys right-sized files instead of
one tiny file per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    out = df
    if n_files is not None:
        out = df.repartition(n_files, *partition_by) if partition_by else df.repartition(n_files)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_predictions(predictions: DataFrame, path: str) -> None:
    """S5: the Id/Category prediction table (crime.py:205)."""
    write_parquet(predictions, path, n_files=1)
