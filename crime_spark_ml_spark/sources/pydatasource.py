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


# ---------------------------------------------------------------- streaming
# The reference's tabular wire format (stream.py:184-204, one JSON
# frame per producer send) as a Spark 4 STREAMING Python DataSource:
# each frame file is one micro-batch, the committed offset is the
# number of frames consumed, and readBetweenOffsets replays an exact
# frame range on recovery — engine-managed exactly-once over the same
# payloads streaming/wire.py parses from sockets.

import json

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class WireStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("wirestream requires .option('path', <dir>)")
        self._n_numeric = int(options.get("n_numeric", 1))
        self._n_string = int(options.get("n_string", 0))

    def _files(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self._dir, "*.frame")))

    def _rows(self, path: str) -> Iterator[tuple]:
        with open(path) as f:
            payload = json.load(f)
        base = os.path.basename(path)
        n = self._n_numeric
        for idx in sorted(payload, key=int):
            rec = payload[idx]
            numeric = [
                None if rec.get(f"feature{i}") is None else float(rec[f"feature{i}"])
                for i in range(n)
            ]
            strings = [rec.get(f"feature{n + i}") for i in range(self._n_string)]
            yield (base, int(idx), *numeric, *strings)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        files = self._files()
        i = start["i"]
        if i >= len(files):
            return iter([]), start  # nothing new; offset unchanged
        # one frame per micro-batch — the producer's send cadence.
        # Materialized: the engine's prefetch cache copy.copy()s the
        # iterator, which a generator cannot survive (a frame is one
        # producer send — bounded by construction)
        return iter(list(self._rows(files[i]))), {"i": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._files()
        for path in files[start["i"] : end["i"]]:
            yield from self._rows(path)


class WireStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wirestream"

    def schema(self) -> str:
        n = int(self.options.get("n_numeric", 1))
        m = int(self.options.get("n_string", 0))
        cols = ["frame_file string", "row_idx int"]
        cols += [f"feature{i} double" for i in range(n)]
        cols += [f"feature{n + i} string" for i in range(m)]
        return ", ".join(cols)

    def simpleStreamReader(self, schema) -> WireStreamReader:
        return WireStreamReader(self.options)


def register_wirestream(spark) -> None:
    spark.dataSource.register(WireStreamDataSource)
