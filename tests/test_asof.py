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


def test_property_matches_pandas_merge_asof(spark):
    """Randomized equivalence with pandas.merge_asof — the de-facto
    reference semantics — across directions and tolerances.  Right rows
    carry TWO value columns with ~20% NULLs in one of them, so a
    per-column carry that splices a stale row's value into a matched
    row's NULL field (the pre-r03 bug) fails the tuple comparison."""
    import random

    import pandas as pd

    rnd = random.Random(20260813)
    for trial in range(4):
        direction = ("backward", "forward")[trial % 2]
        tolerance = (None, 7.0)[trial // 2]
        left_rows = sorted(
            (rnd.randint(1, 3), float(rnd.randint(0, 200)))
            for _ in range(60)
        )
        right_rows = sorted(
            (
                (
                    rnd.randint(1, 3),
                    float(rnd.randint(0, 200)),
                    None if rnd.random() < 0.2 else rnd.random(),
                    rnd.random(),
                )
                for _ in range(40)
            ),
            key=lambda r: (r[0], r[1]),
        )
        # merge_asof ties on equal (key, ts) right rows are arbitrary in
        # both engines — dedupe to keep the comparison well-defined
        seen = set()
        right_rows = [
            r for r in right_rows
            if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
        ]
        lpdf = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values("t")
        rpdf = pd.DataFrame(
            right_rows, columns=["k", "t", "v", "w"]
        ).sort_values("t")
        expect = pd.merge_asof(
            lpdf, rpdf, on="t", by="k", direction=direction,
            tolerance=tolerance,
        )

        left = spark.createDataFrame(
            [(int(k), float(t)) for k, t in left_rows], "k int, t double"
        ).select("k", F.timestamp_seconds("t").alias("ts"))
        right = spark.createDataFrame(
            [
                (int(k), float(t), None if v is None else float(v), float(w))
                for k, t, v, w in right_rows
            ],
            "k int, t double, v double, w double",
        ).select("k", F.timestamp_seconds("t").alias("ts"), "v", "w")
        got = asof_join(left, right, "ts", ["k"], ["v", "w"],
                        direction=direction, tolerance=tolerance)
        got_map: dict[tuple, list] = {}
        for r in got.collect():
            got_map.setdefault((r["k"], r["ts"].timestamp()), []).append(
                (r["v_asof"], r["w_asof"])
            )
        for _, e in expect.iterrows():
            key = (int(e["k"]), float(e["t"]))
            vals = got_map[key]
            want = (
                None if pd.isna(e["v"]) else float(e["v"]),
                None if pd.isna(e["w"]) else float(e["w"]),
            )
            assert want in vals, (trial, key, want, vals)


def test_null_right_value_not_spliced(spark):
    """A matched right row with a NULL value column must yield NULL —
    never the previous right row's non-NULL value (ADVICE r02)."""
    left = spark.createDataFrame([(1, 30.0)], "k int, t double").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame(
        [(1, 10.0, 100.0, 1.0), (1, 20.0, None, 2.0)],
        "k int, t double, v double, w double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "v", "w")
    row = asof_join(left, right, "ts", ["k"], ["v", "w"]).collect()[0]
    # match is the t=20 row: v must be its NULL, w its 2.0
    assert row["v_asof"] is None
    assert row["w_asof"] == 2.0
    assert row["ts_asof"].timestamp() == 20.0


def test_hot_key_single_window(spark):
    """One pathologically hot key (99% of rows) funnels through a single
    window task — correctness must hold there, and the plan must stay the
    documented shape: ONE shuffle on the key feeding ONE Window, with no
    theta join (SCALE.md round-3 as-of rule).  AQE splits skewed joins,
    not windows, so this is the skew case the rule is about."""
    n_hot = 5_000
    left_rows = [(0, float(t) + 0.5) for t in range(n_hot)] + [
        (k, 42.5) for k in range(1, 6)
    ]
    # right rows every 10s on the hot key; value encodes its own ts
    right_rows = [(0, float(t), float(t)) for t in range(0, n_hot, 10)] + [
        (k, 40.0, 40.0) for k in range(1, 6)
    ]
    left = spark.createDataFrame(left_rows, "k int, t double").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame(right_rows, "k int, t double, v double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "v"
    )
    out = asof_join(left, right, "ts", ["k"], ["v"])

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1
    assert "Join" not in plan  # union + window, never a range/theta join

    got = out.collect()
    assert len(got) == len(left_rows)
    for r in got:
        t = r["ts"].timestamp()
        want = (t // 10) * 10 if r["k"] == 0 else 40.0
        assert r["v_asof"] == want, (r["k"], t, r["v_asof"], want)


def test_matched_ts_carried(frames):
    left, right = frames
    rows = {r["tag"]: r for r in asof_join(left, right, "ts", ["k"], ["v"]).collect()}
    assert rows["b"]["ts_asof"] is not None
    assert rows["c"]["ts_asof"] is None
