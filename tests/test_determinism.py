"""Partitioning-determinism: registered results must not depend on the
shuffle-partition count (the config a cluster operator tunes most).
A query whose output shifts under repartitioning would pass DuckDB
parity at one config and silently drift at another — this pins a
representative slice of the registry at 5 vs the suite's 32 shuffle
partitions. Exact-value queries must match bit-for-bit (sorted rows);
every registered query is already rounded/tie-broken to make that
hold, so any diff here is a real nondeterminism bug."""

from __future__ import annotations

import pytest

from crime_spark_ml_spark.plans.registry import load_all_plans

from conftest import SF_SMOKE

# one representative per plan family: scan-agg, decimal agg, window,
# islands merge, hash join + bloom shape, sampling, quantiles,
# sketch-exact, set ops, PMI ranking
REPRESENTATIVE = [
    "q1_pricing_summary",
    "flagship_district_pivot",
    "w_rank_suite",
    "dp_duplicate_spans",
    "j_runtime_bloom_join",
    "dp_weighted_sample",
    "dp_winsorize",
    "fn_approx_top_k",
    "setop_multiset_all",
    "dp_bigram_pmi",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_under_shuffle_partitions(spark, name):
    fn = load_all_plans()[name].fn
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        low = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        high = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert low == high, f"{name}: result depends on shuffle partition count"
    assert len(low) > 0
