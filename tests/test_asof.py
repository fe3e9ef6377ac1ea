"""As-of join vs a direct numpy/pandas-semantics oracle (backward /
forward / tolerance); DuckDB's native ASOF JOIN is the gate oracle
(``asof_enrich``)."""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 25.0, "b"), (1, 5.0, "c"), (2, 12.0, "d"), (3, 7.0, "e")],
        "k int, t double, tag string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 10.0, 100.0), (1, 20.0, 200.0), (2, 15.0, 300.0)],
        "k int, t double, v double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v")
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, "ts", ["k"], ["v"]).collect()
    }
    assert out == {"a": 100.0,  # equal ts is inclusive
                   "b": 200.0,  # latest of the two earlier rows
                   "c": None,   # nothing at or before t=5
                   "d": None,   # right row is later (t=15 > 12)
                   "e": None}   # key has no right rows


def test_forward_inclusive(frames):
    left, right = frames
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, "ts", ["k"], ["v"],
                           direction="forward").collect()
    }
    assert out == {"a": 100.0, "b": None, "c": 100.0, "d": 300.0, "e": None}


def test_tolerance_nulls_far_matches(frames):
    left, right = frames
    out = {
        r["tag"]: r["v_asof"]
        for r in asof_join(left, right, "ts", ["k"], ["v"],
                           tolerance=4.0).collect()
    }
    # "b" matched t=20 at lag 5s > 4s -> nulled; "a" lag 0 kept
    assert out["a"] == 100.0
    assert out["b"] is None


def test_matched_ts_carried(frames):
    left, right = frames
    rows = {r["tag"]: r for r in asof_join(left, right, "ts", ["k"], ["v"]).collect()}
    assert rows["b"]["ts_asof"] is not None
    assert rows["c"]["ts_asof"] is None
