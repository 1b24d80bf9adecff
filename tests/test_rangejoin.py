"""Bucketized keyless range join (operators/rangejoin.py): exact
theta-join semantics — boundary inclusivity, bucket-crossing
intervals, overlap handling, no duplicate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from crime_spark_ml_spark.operators.rangejoin import point_in_interval_join


def _pairs(spark, points, intervals, bucket_width):
    pts = spark.createDataFrame(points, "pid long, ts_us long")
    iv = spark.createDataFrame(intervals, "iid long, start_us long, end_us long")
    out = point_in_interval_join(pts, iv, bucket_width=bucket_width)
    return sorted((r.pid, r.iid) for r in out.collect())


def test_boundaries_inclusive_start_exclusive_end(spark):
    # interval [100, 200): 100 in, 199 in, 200 out, 99 out
    got = _pairs(
        spark,
        [(1, 99), (2, 100), (3, 199), (4, 200)],
        [(7, 100, 200)],
        bucket_width=50,
    )
    assert got == [(2, 7), (3, 7)]


def test_interval_crossing_many_buckets_no_dup_pairs(spark):
    # interval spans 5 buckets (width 10); every in-range point pairs ONCE
    got = _pairs(
        spark,
        [(i, t) for i, t in enumerate(range(0, 60, 7))],
        [(1, 5, 47)],
        bucket_width=10,
    )
    expect = sorted((i, 1) for i, t in enumerate(range(0, 60, 7)) if 5 <= t < 47)
    assert got == expect


def test_overlapping_intervals_each_match_independently(spark):
    got = _pairs(
        spark,
        [(1, 15)],
        [(1, 0, 20), (2, 10, 30), (3, 16, 30)],
        bucket_width=8,
    )
    assert got == [(1, 1), (1, 2)]


def test_brute_force_equivalence_random(spark):
    import random

    rng = random.Random(7)
    points = [(i, rng.randrange(0, 1000)) for i in range(120)]
    intervals = []
    for j in range(25):
        s = rng.randrange(0, 950)
        intervals.append((j, s, s + rng.randrange(1, 120)))
    got = _pairs(spark, points, intervals, bucket_width=37)
    expect = sorted(
        (pid, iid)
        for pid, t in points
        for iid, s, e in intervals
        if s <= t < e
    )
    assert got == expect


def test_negative_timestamps_floor_bucketing(spark):
    # pre-1970 epoch: floor (not truncate-toward-zero) bucketing keeps
    # containment exact across the zero boundary
    got = _pairs(
        spark,
        [(1, -25), (2, -5), (3, 5)],
        [(9, -30, 10)],
        bucket_width=20,
    )
    assert got == [(1, 9), (2, 9), (3, 9)]
