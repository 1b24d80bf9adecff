"""Skew mitigation: salted join.

A shuffle join keyed on a skewed column sends every row of a hot key
to one reducer. Salting spreads them: the big side gets a salt in
[0, n); the small side is replicated n× (one copy per salt value);
the join key becomes (key, salt). Result is identical to the plain
join; the hot key now occupies n reducers.

AQE's skew-join splitting (on by default in session.py) handles most
cases at runtime; explicit salting remains the tool when a single key
exceeds what one task can hold even after AQE splits, or for
aggregations (salt → partial agg → de-salt final agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALT_SAFE_JOINS = ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side
    salted across ``n_salt`` buckets. ``small`` is replicated n_salt×
    (keep it the genuinely smaller side).

    Only big-side-preserving joins are salt-safe: a right/full outer
    join would emit one null-padded row per *replica* of an unmatched
    small-side key (n_salt duplicates), so those are rejected."""
    if how.lower() not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {_SALT_SAFE_JOINS}; '{how}' would duplicate "
            f"unmatched small-side rows n_salt times (salt the other side instead)"
        )
    big_s = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), n_salt).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")


def salted_group_count(df: DataFrame, key: str, n_salt: int = 8) -> DataFrame:
    """Two-phase skew-safe group count: (key, salt) partial counts →
    final sum per key. Same result as groupBy(key).count(); the hot
    key's partial aggregation spreads over n_salt reducers."""
    return (
        df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), n_salt))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("cnt"))
    )
