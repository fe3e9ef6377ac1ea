"""Bucketized range join vs a direct nested-loop oracle, including
bucket-boundary edges (the pair must meet in exactly one bucket — no
duplicates, no misses at bucket seams)."""

from pyspark.sql import functions as F

from data_integration_est_spark.ops.range_join import range_join_points


def test_range_join_matches_nested_loop(spark):
    import random

    rnd = random.Random(11)
    pts = [(i, rnd.uniform(0, 1000)) for i in range(300)]
    ivs = [
        (j, lo, lo + rnd.uniform(0, 50))
        for j, lo in ((j, rnd.uniform(-20, 990)) for j in range(80))
    ]
    points = spark.createDataFrame(pts, "pid int, x double")
    intervals = spark.createDataFrame(ivs, "iid int, lo double, hi double")
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points(points, intervals, "x", "lo", "hi", 25.0).collect()
    }
    expect = {
        (pid, iid)
        for pid, x in pts
        for iid, lo, hi in ivs
        if lo <= x <= hi
    }
    assert got == expect and len(expect) > 100


def test_bucket_boundary_exactness(spark):
    # x exactly on bucket edges and interval endpoints
    points = spark.createDataFrame(
        [(1, 100.0), (2, 99.999999), (3, 200.0)], "pid int, x double"
    )
    intervals = spark.createDataFrame(
        [(10, 100.0, 200.0)], "iid int, lo double, hi double"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join_points(points, intervals, "x", "lo", "hi", 100.0).collect()
    )
    assert got == [(1, 10), (3, 10)]  # inclusive at both ends, 99.999999 out
