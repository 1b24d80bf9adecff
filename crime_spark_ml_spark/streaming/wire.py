"""The producer wire format (reference stream.py) and its parsers.

The reference ships only the producer half (SURVEY.md §0.3); its
docstring at stream.py:153-178 is the normative spec this consumer
implements:

- **Tabular batch (T2)**: one JSON object per line; outer keys are row
  indices ``"0".."batch_size-1"``, inner objects are
  ``{"feature0": …, …, "featureN": …}`` (+ ``"label"`` for CIFAR) —
  column names erased to ``feature{i}`` (stream.py:61,193, E9).
- **Text batch (T3)**: one JSON *array* of raw line strings per send
  (stream.py:209-222).

Parsing is pure Catalyst: ``from_json`` with an explicit schema →
``explode`` — runs identically on a batch or streaming DataFrame
(same functions power both; no custom receiver logic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def feature_struct(
    n_numeric: int, n_string: int = 0, with_label: bool = False
) -> T.StructType:
    """The erased-name inner schema: feature0..featureN (numerics
    first, then strings — matching the producer's column order), plus
    the CIFAR-style label (stream.py:62)."""
    fields = [
        T.StructField(f"feature{i}", T.DoubleType()) for i in range(n_numeric)
    ] + [
        T.StructField(f"feature{n_numeric + i}", T.StringType())
        for i in range(n_string)
    ]
    if with_label:
        fields.append(T.StructField("label", T.IntegerType()))
    return T.StructType(fields)


def image_struct(n_pixels: int = 48, nested: bool = False) -> T.StructType:
    """CIFAR-shaped (flat int features, FIXTURES.md §2b) or
    Pokemon-shaped (nested ``img`` matrix, §2c)."""
    if nested:
        return T.StructType(
            [
                T.StructField("img", T.ArrayType(T.ArrayType(T.IntegerType()))),
                T.StructField("label", T.IntegerType()),
            ]
        )
    fields = [T.StructField(f"feature{i}", T.IntegerType()) for i in range(n_pixels)]
    fields.append(T.StructField("label", T.IntegerType()))
    return T.StructType(fields)


def parse_tabular(lines: DataFrame, inner: T.StructType, value_col: str = "value") -> DataFrame:
    """T2: ``{"<row_idx>": {...}}`` lines → typed rows (+ ``row_idx``)."""
    parsed = lines.select(
        F.from_json(F.col(value_col), T.MapType(T.StringType(), inner)).alias("batch")
    )
    return (
        parsed.select(F.explode("batch").alias("row_idx", "rec"))
        .withColumn("row_idx", F.col("row_idx").cast("long"))
        .select("row_idx", "rec.*")
    )


def parse_text(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """T3: JSON array of raw lines → one trimmed line per row."""
    arr = F.from_json(F.col(value_col), T.ArrayType(T.StringType()))
    return (
        lines.select(F.explode(arr).alias("line"))
        .withColumn("line", F.regexp_replace("line", "\n$", ""))
    )


def restore_names(df: DataFrame, names: list[str]) -> DataFrame:
    """Invert the producer's name erasure (E9): feature{i} → names[i]."""
    mapping = {f"feature{i}": n for i, n in enumerate(names)}
    cols: list[Column] = [
        F.col(c).alias(mapping.get(c, c)) for c in df.columns
    ]
    return df.select(*cols)


def flatten_images(parsed: DataFrame, img_col: str = "img") -> DataFrame:
    """Pokemon-shaped batches carry a nested pixel matrix
    (``array<array<int>>``, stream.py:108); the producer's
    ``flatten=True`` option (stream.py:109) is reproduced consumer-side:
    one row-local flatten, no shuffle."""
    return parsed.withColumn("pixels", F.flatten(F.col(img_col))).drop(img_col)
