"""Range join: points joined into [start, end) intervals with NO
equality key — the operator Spark lacks natively (a naive theta join
plans as BroadcastNestedLoopJoin, which is quadratic and only viable
when one side broadcasts).

Scale design: quantize the time axis into fixed-width buckets. Each
interval explodes into the buckets it covers (ceil(len/width)+1 rows —
bounded fan-out for bounded-length intervals); each point maps to
exactly ONE bucket. An equality join on the bucket key then a residual
``start <= ts < end`` filter yields exactly the theta-join pairs, each
produced once (no dedup pass needed, because the point side contributes
a single bucket). The join is a plain hash/SMJ on an integer key:
shuffle-partitionable, AQE-skew-splittable, broadcastable when the
exploded interval side is small.

Floor-division bucketing via pmod keeps pre-1970 (negative) timestamps
correct, matching the convention in plans/events.py / sources/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floor_div(col: str, width: int) -> F.Column:
    return F.expr(f"({col} - pmod({col}, {width})) DIV {width}")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_width: int = 1_800_000_000,  # 30 min in epoch micros
) -> DataFrame:
    """All (point, interval) pairs with start <= ts < end.

    ``bucket_width`` trades interval fan-out against bucket selectivity:
    width ≈ median interval length keeps the explode factor ~2 while a
    point's bucket co-locates only nearby intervals.
    """
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                _floor_div(start_col, bucket_width),
                # end is exclusive: the last covered instant is end-1
                F.expr(
                    f"(({end_col} - 1) - pmod({end_col} - 1, {bucket_width})) "
                    f"DIV {bucket_width}"
                ),
            )
        ),
    )
    pt = points.withColumn("_bkt", _floor_div(ts_col, bucket_width))
    return (
        pt.join(iv, "_bkt")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bkt")
    )
