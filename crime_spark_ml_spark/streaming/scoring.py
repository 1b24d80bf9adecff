"""In-stream model scoring — the union of the reference's two halves.

The reference was evidently meant to be ONE system (SURVEY.md §0.4:
crime.py's HDFS URI reuses the stream producer's port): a model trained
batch-side, applied to micro-batched records arriving over the wire.
The consumer script is absent from the reference; this module is that
missing piece, Spark-idiomatically: a fitted PipelineModel's
``transform`` is a pure narrow operation, so it applies directly to a
STREAMING DataFrame — same model object, no per-batch re-fit, state-free.

Flow: wire lines → parse_tabular (T2) → assemble features →
model.transform → predictions stream. Works with any non-aggregating
fitted pipeline (indexers with handleInvalid=keep, assemblers, scalers,
classifier).
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .wire import parse_tabular


def score_stream(
    lines: DataFrame,
    model: PipelineModel,
    inner_schema: T.StructType,
    prediction_cols: tuple[str, ...] = ("prediction",),
) -> DataFrame:
    """Parse T2 wire lines and score each record with a fitted model.

    Returns row_idx + the parsed feature columns + the requested
    prediction columns — still a streaming DataFrame; attach any sink.
    """
    parsed = parse_tabular(lines, inner_schema)
    scored = model.transform(parsed)
    keep = ["row_idx", *[f.name for f in inner_schema.fields], *prediction_cols]
    return scored.select(*[c for c in keep if c in scored.columns])
