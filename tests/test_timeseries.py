"""Time-grid resampling (`ops/timeseries`) — pandas resample/asfreq is
the reference implementation: per-key grids, all four fill policies,
and the grid-contiguity/observation-count invariants."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.timeseries import resample_timeseries

STEP = 600  # 10-minute grid


def _mk_events(spark, seed=7, n=300):
    rng = random.Random(seed)
    base = 1_700_000_000
    rows = [
        (
            f"k{rng.randint(0, 2)}",
            base + rng.randint(0, 200) * 137,  # irregular, gappy
            float(rng.randint(1, 50)),
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "key string, secs long, v double")
    return df.select(
        "key", F.timestamp_seconds("secs").alias("ts"), "v"
    ), rows


def _pandas_oracle(rows, fill, agg="sum"):
    pdf = pd.DataFrame(rows, columns=["key", "secs", "v"])
    pdf["bucket"] = (pdf["secs"] // STEP) * STEP
    out = {}
    for k, g in pdf.groupby("key"):
        s = g.groupby("bucket")["v"].agg(agg)
        full = s.reindex(
            range(int(s.index.min()), int(s.index.max()) + STEP, STEP)
        )
        if fill == "zero":
            full = full.fillna(0.0)
        elif fill == "ffill":
            full = full.ffill()
        elif fill == "linear":
            full = pd.Series(
                full.values,
                index=range(len(full)), dtype="float64",
            ).interpolate("linear", limit_direction="both").set_axis(
                full.index
            )
        for b, val in full.items():
            out[(k, int(b))] = None if pd.isna(val) else float(val)
    return out


@pytest.mark.parametrize("fill", ["none", "zero", "ffill", "linear"])
def test_matches_pandas_resample(spark, fill):
    df, rows = _mk_events(spark)
    got = {
        (r["key"], int(r["bucket"].timestamp())): r["sum_v"]
        for r in resample_timeseries(
            df, "ts", "v", "key", STEP, "sum", fill
        ).collect()
    }
    want = _pandas_oracle(rows, fill)
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, (fill, k)
        else:
            assert got[k] == pytest.approx(want[k], rel=1e-12), (fill, k)


def test_grid_contiguous_and_nobs(spark):
    df, rows = _mk_events(spark)
    out = resample_timeseries(df, "ts", "v", "key", STEP).collect()
    assert sum(r["n_obs"] for r in out) == len(rows)
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(int(r["bucket"].timestamp()))
    for k, bs in by_key.items():
        bs = sorted(bs)
        assert bs == list(range(bs[0], bs[-1] + STEP, STEP)), k


def test_avg_agg_and_validation(spark):
    df, _ = _mk_events(spark)
    out = resample_timeseries(
        df, "ts", "v", "key", STEP, agg="avg", fill="none",
        out_col="mean_v",
    )
    assert "mean_v" in out.columns
    with pytest.raises(ValueError):
        resample_timeseries(df, "ts", "v", "key", STEP, fill="bogus")
    with pytest.raises(ValueError):
        resample_timeseries(df, "ts", "v", "key", 0)


def test_plan_no_cross_join(spark):
    df, _ = _mk_events(spark)
    plan = (
        resample_timeseries(df, "ts", "v", "key", STEP, fill="linear")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_agg_allowlist(spark):
    """r11 ADVICE fix: the aggregate name is validated against an
    allowlist instead of being interpolated into the plan raw — a typo
    (or injected SQL) raises ValueError at call time."""
    from data_integration_est_spark.ops.timeseries import resample_timeseries

    df = spark.createDataFrame(
        [("k", "2024-01-01 00:10:00", 2.0),
         ("k", "2024-01-01 02:20:00", 4.0)],
        "key string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="agg must be one of"):
        resample_timeseries(df, "ts", "v", "key", agg="sumx")
    with pytest.raises(ValueError, match="agg must be one of"):
        resample_timeseries(df, "ts", "v", "key",
                            agg="sum(v)); DROP TABLE t; --")
    got = {
        (r["key"], str(r["bucket"])): r["max_v"]
        for r in resample_timeseries(
            df, "ts", "v", "key", agg="max", fill="ffill"
        ).collect()
    }
    assert got[("k", "2024-01-01 00:00:00")] == 2.0
    assert got[("k", "2024-01-01 01:00:00")] == 2.0  # carried
    assert got[("k", "2024-01-01 02:00:00")] == 4.0
