"""Mergeable quantile sketch (simplified t-digest) authored as Arrow
operators — the custom-sketch pattern for when the built-ins
(percentile_approx's KLL-ish sketch, count_min_sketch, HLL) don't
cover the statistic: per-partition PARTIAL sketches via mapInPandas,
one merge per group key, driver-free estimates.

Design: a digest is (centroid_mean, centroid_weight) pairs, capped at
``compression`` centroids, built by sorting values and slicing into
equal-weight runs (the classic scale-function simplification: uniform
k-weighting — keeps the code obviously correct; tail accuracy is
bounded by weight/2 per centroid). Merging concatenates centroid
lists weight-sorted-by-mean and re-compresses the same way, so merge
is associative up to re-compression — the property that lets 100 TB
of partials collapse tree-wise without ever shipping raw values.

Estimates depend (slightly) on the partition layout — which rows form
which partial — so registered queries hash BAND booleans (est within
a tolerance of exact), not raw estimates; exactness-on-sorted-input
and band tightness are pinned in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compress(means: list[float], weights: list[float], compression: int):
    order = sorted(range(len(means)), key=lambda i: (means[i], weights[i]))
    means = [means[i] for i in order]
    weights = [weights[i] for i in order]
    total = sum(weights)
    if len(means) <= compression:
        return means, weights
    per = total / compression
    out_m: list[float] = []
    out_w: list[float] = []
    acc_w = 0.0
    acc_sum = 0.0
    for m, w in zip(means, weights):
        acc_w += w
        acc_sum += m * w
        if acc_w >= per and len(out_m) < compression - 1:
            out_m.append(acc_sum / acc_w)
            out_w.append(acc_w)
            acc_w = 0.0
            acc_sum = 0.0
    if acc_w > 0:
        out_m.append(acc_sum / acc_w)
        out_w.append(acc_w)
    return out_m, out_w


def partial_digests(
    df: DataFrame, value_col: str, group_col: str, compression: int = 64
) -> DataFrame:
    """Stage 1 — one digest per (input partition × group): mapInPandas
    emits (group, means, weights) rows; raw values never leave their
    partition."""

    out_schema = (
        f"{group_col} string, means array<double>, weights array<double>"
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, list[float]] = {}
        for pdf in batches:
            for g, v in zip(pdf[group_col], pdf[value_col]):
                acc.setdefault(str(g), []).append(float(v))
        rows = []
        for g, vals in sorted(acc.items()):
            vals.sort()
            m, w = _compress(vals, [1.0] * len(vals), compression)
            rows.append({group_col: g, "means": m, "weights": w})
        yield pd.DataFrame(rows, columns=[group_col, "means", "weights"])

    return df.select(group_col, value_col).mapInPandas(build, out_schema)


def merge_digests(
    partials: DataFrame, group_col: str, compression: int = 64
) -> DataFrame:
    """Stage 2 — one shuffle keyed by group, then an Arrow grouped-map
    merge: concatenate centroid lists, re-compress once. The merged
    digest is a few KB per group regardless of input volume."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(group_col, StringType()),
            StructField("means", ArrayType(DoubleType())),
            StructField("weights", ArrayType(DoubleType())),
        ]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        means: list[float] = []
        weights: list[float] = []
        for m, w in zip(pdf["means"], pdf["weights"]):
            means.extend(float(x) for x in m)
            weights.extend(float(x) for x in w)
        m, w = _compress(means, weights, compression)
        return pd.DataFrame(
            [{group_col: pdf[group_col].iloc[0], "means": m, "weights": w}]
        )

    return partials.groupBy(group_col).applyInPandas(merge, schema)


def estimate_quantile(means: list[float], weights: list[float], q: float) -> float:
    """Interpolated quantile from a digest (plain Python — digests are
    kilobyte-scale; estimation is driver- or executor-local)."""
    total = sum(weights)
    target = q * total
    acc = 0.0
    for m, w in zip(means, weights):
        if acc + w >= target:
            return m
        acc += w
    return means[-1]


def digest_quantiles(
    merged: DataFrame, group_col: str, qs: tuple[float, ...]
) -> DataFrame:
    """Stage 3 — estimates as columns, computed row-locally from the
    merged digest arrays by an Arrow UDF-free route: the digest is
    exploded into (cum_weight, mean) and each quantile picks the first
    centroid at or past its target weight (all JVM expressions)."""
    out = merged
    total = F.aggregate("weights", F.lit(0.0), lambda a, x: a + x)
    for q in qs:
        target = F.lit(q) * total
        # index of first centroid whose cumulative weight reaches target
        cum = F.expr(
            "transform(weights, (w, i) -> "
            "aggregate(slice(weights, 1, i + 1), CAST(0 AS DOUBLE), (a, x) -> a + x))"
        )
        idx = F.array_position(
            F.transform(cum, lambda c: c >= target), F.lit(True)
        )
        est = F.when(idx > 0, F.element_at("means", idx.cast("int"))).otherwise(
            F.element_at("means", -1)
        )
        out = out.withColumn(f"p{int(q * 100)}", est)
    return out.drop("means", "weights")
