"""CIFAR pickle batches as a Spark 4 Python DataSource — the
engine-native way to mount a custom file format into the catalog
(``spark.read.format("cifarbatch")``), complementing the
binaryFile+mapInPandas reader in imagebatch.py (reference spec
stream.py:40-50). Two independent implementations of the same format
let tests cross-check them row for row.

What the DataSource API buys over the mapInPandas reader:

- ``partitions()`` declares one InputPartition PER BATCH FILE, so
  Spark schedules file-level parallelism natively (same unit as the
  binaryFile scan, but visible to the scheduler as a partition count
  instead of hidden inside a glob).
- ``pushFilters()`` receives the query's predicates BEFORE partition
  planning: an ``EqualTo``/``In``/``StringStartsWith`` on ``path``
  prunes whole files driver-side — the custom-format analog of
  parquet partition pruning; every other filter is returned as
  unsupported so Spark keeps evaluating it post-scan (correctness
  never depends on the pushdown).
- ``read()`` runs on executors and yields plain tuples; the pickle
  bytes never visit the driver.

SECURITY: unpickling executes arbitrary code — trusted dataset files
only, the same assumption the reference's ``pickle.load`` makes.
"""

from __future__ import annotations

import glob as _glob
import os
import pickle
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    StringStartsWith,
)

from .imagebatch import CIFAR_SCHEMA


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _basename_keep(flt: Filter) -> "callable | None":
    """A basename predicate for the path-pruning filters we support,
    or None when the filter must stay Spark-side."""
    if flt.attribute != ("path",):
        return None
    if isinstance(flt, EqualTo):
        return lambda base, v=flt.value: base == v
    if isinstance(flt, In):
        return lambda base, vs=set(flt.values): base in vs
    if isinstance(flt, StringStartsWith):
        return lambda base, p=flt.value: base.startswith(p)
    return None


class CifarBatchReader(DataSourceReader):
    def __init__(self, options):
        directory = options.get("path")
        if not directory:
            raise ValueError("cifarbatch requires .option('path', <dir>)")
        pattern = options.get("glob", "data_batch_*")
        self._files = sorted(_glob.glob(os.path.join(directory, pattern)))

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        for flt in filters:
            keep = _basename_keep(flt)
            if keep is None:
                yield flt  # unsupported -> Spark evaluates it post-scan
            else:
                self._files = [f for f in self._files if keep(os.path.basename(f))]

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(f) for f in self._files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            obj = pickle.load(f, encoding="bytes")
        base = os.path.basename(partition.path)
        for idx, (row, label) in enumerate(zip(obj[b"data"], obj[b"labels"])):
            yield (base, idx, [int(v) for v in row], int(label))


class CifarBatchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cifarbatch"

    def schema(self) -> str:
        return CIFAR_SCHEMA

    def reader(self, schema) -> CifarBatchReader:
        return CifarBatchReader(self.options)


def register_cifarbatch(spark) -> None:
    """Idempotent format registration (latest registration wins).
    Python-source filter pushdown is opt-in per session; without the
    flag Spark refuses to initialize a reader that implements
    pushFilters, so registration owns turning it on."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CifarBatchDataSource)
