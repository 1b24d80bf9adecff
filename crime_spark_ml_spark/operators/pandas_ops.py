"""Arrow-vectorized Python operators — the sanctioned slow path.

Policy (SURVEY.md §2.11): built-in JVM expressions first; when Python
is genuinely needed (native libs, custom stateful logic), only
Arrow-batched forms — ``pandas_udf``, ``applyInPandas``,
``applyInPandasWithState`` — never row-at-a-time Python UDFs.

Each operator here exists as a *twin* of a JVM implementation so tests
can pin equivalence and benchmarks can quantify the JVM-vs-Arrow gap:
- ``cosine_pandas_udf``      ↔ functions/vectors.cosine
- ``source_stats_apply``     ↔ a groupBy aggregate
- ``running_totals_stateful``↔ streaming windowed_counts (but with
  arbitrary per-group Python state — the escape hatch Structured
  Streaming's built-in aggs can't express)
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def cosine_pandas_udf():
    """Vectorized cosine over two array<float> columns (Arrow batches;
    numpy math). Twin of the JVM higher-order-function cosine.
    Built lazily — pandas_udf resolves its return type against the
    active SparkSession, so decorating at import time would require a
    session before the module can load."""

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        def one(x: Any, y: Any) -> float:
            xv = np.asarray(x, dtype="float64")
            yv = np.asarray(y, dtype="float64")
            denom = float(np.sqrt(xv @ xv) * np.sqrt(yv @ yv))
            return float(xv @ yv) / denom if denom else 0.0

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    return _cos


SOURCE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("mean_chars", T.DoubleType()),
        T.StructField("max_chars", T.LongType()),
    ]
)


def source_stats_apply(docs: DataFrame) -> DataFrame:
    """Per-source document stats via applyInPandas (each group becomes
    one pandas frame in a worker). Twin of the pure-SQL aggregate —
    used where the per-group logic outgrows SQL (model scoring,
    scipy stats, …)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "mean_chars": [round(float(pdf["n_chars"].mean()), 6)],
                "max_chars": [int(pdf["n_chars"].max())],
            }
        )

    return docs.select("source", "n_chars").groupBy("source").applyInPandas(
        stats, SOURCE_STATS_SCHEMA
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per event_type running count + value sum, re-emitted every
    micro-batch. State is a 2-field tuple per key — sharded by the
    grouping key across executors, checkpointed by the engine."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, val = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            cnt += len(pdf)
            val += float(pdf["value"].sum())
        state.update((cnt, val))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "total_events": [cnt],
                "total_value": [round(val, 6)],
            }
        )

    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cosine_scores_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """brute-force scoring with the pandas-UDF cosine (benchmark twin
    of operators/similarity.brute_force_topk's JVM path)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("ce"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn("cos", cosine_pandas_udf()(F.col("qe"), F.col("ce")))
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """The SAME running-totals operator through transformWithState
    (Spark 4's arbitrary-stateful successor to applyInPandasWithState):
    per event_type running count + value sum in a ValueState,
    re-emitted every micro-batch. tests pin cross-API equivalence —
    both stateful APIs over the same staged two-batch stream must
    produce identical final totals, so a migration between them is
    attested mechanical.

    CONTAINER GATE (same convention as the image codecs in
    operators/multimodal.py): transformWithState's state-server
    protocol is protobuf-encoded, and this container has no working
    ``google.protobuf`` — the engine's streaming runner crashes at
    init with an ImportError, not here. Fail loudly up front instead;
    the implementation below is complete and runs unchanged on a
    standard Spark 4 cluster (tests/test_streaming.py runs the full
    equivalence pin wherever protobuf imports)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf (the "
            "state-server protocol); not available in this container — "
            "run on a standard Spark 4 cluster"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "total_events long, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            cnt, val = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                cnt += len(pdf)
                val += float(pdf["value"].sum())
            self._totals.update((cnt, val))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "total_events": [cnt],
                    "total_value": [round(val, 6)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=Processor(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_seen", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_seen", T.LongType()),
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("val", T.ArrayType(T.DoubleType())),
    ]
)


def ewma_last_n_stateful(
    events: DataFrame, alpha: float = 0.2, last_n: int = 32
) -> DataFrame:
    """Streaming twin of plans/events.ev_ewma_value: per-user EWMA over
    the user's last ``last_n`` events, as an applyInPandasWithState
    operator. State per key is BOUNDED — the top-``last_n`` events by
    (ts_us, event_id) plus one counter — maintained incrementally
    across micro-batches, so arrival order across batches doesn't
    matter and state never grows with the stream. Each batch re-emits
    (total_seen, n_events, unrounded ewma); the fold replays the kept
    window oldest-first with the same IEEE double recursion as the
    batch twin (rounding is left to the caller — Python's round()
    banker's-rounds, F.round half-ups)."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            total, ts, eid, val = state.get
            ts, eid, val = list(ts), list(eid), list(val)
        else:
            total, ts, eid, val = 0, [], [], []
        for pdf in batches:
            total += len(pdf)
            ts.extend(int(x) for x in pdf["ts_us"])
            eid.extend(int(x) for x in pdf["event_id"])
            val.extend(float(x) for x in pdf["value"])
        order = np.lexsort((np.asarray(eid), np.asarray(ts)))[-last_n:]
        ts = [ts[i] for i in order]
        eid = [eid[i] for i in order]
        val = [val[i] for i in order]
        state.update((total, ts, eid, val))
        acc = val[0]
        for x in val[1:]:
            acc = alpha * x + (1.0 - alpha) * acc
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_seen": [total],
                "n_events": [len(val)],
                "ewma": [acc],
            }
        )

    return (
        events.select("user_id", "ts_us", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=EWMA_OUT_SCHEMA,
            stateStructType=_EWMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def geo_mean_udaf():
    """Arrow-batched GROUPED_AGG pandas UDF (a user-defined AGGREGATE
    — the one pandas-UDF variant the rest of this module doesn't
    cover): geometric mean of a numeric column. Executes as an
    ArrowAggregatePython node (never BatchEvalPython). Determinism:
    grouped-agg input order is partition-dependent, so the values are
    SORTED before an fsum-based reduction — the result is independent
    of shuffle layout down to the last ulp."""

    @pandas_udf("double")
    def _geo_mean(v: pd.Series) -> float:
        import math

        vals = sorted(float(x) for x in v)
        return math.exp(math.fsum(math.log(x) for x in vals) / len(vals))

    return _geo_mean


def bloom_probe_udf(pos_broadcast, m_bits: int, k_hashes: int):
    """Arrow-batched Bloom membership probe: recomputes the builder's
    md5 double-hash positions (hashlib and Spark's md5 agree by
    definition) and tests them against the broadcast position set.
    Lives here (not in the plan module) so the pandas type annotations
    resolve — plans use postponed annotations without a module-level
    pandas import."""

    @pandas_udf("boolean")
    def _probe(digs: pd.Series) -> pd.Series:
        import hashlib

        s = pos_broadcast.value

        def probe(d: str) -> bool:
            return all(
                int(hashlib.md5(f"{d}|{j}".encode()).hexdigest()[:12], 16) % m_bits
                in s
                for j in range(1, k_hashes + 1)
            )

        return digs.map(probe)

    return _probe
