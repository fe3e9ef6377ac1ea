"""Portable quantile histogram (`ops/qsketch`) — pinned against the
streaming monitor's python read-off (the shared semantics), the
histogram monoid laws, and the bin-resolution error contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.qsketch import (
    qhist_build,
    qhist_count_distinct_bins,
    qhist_merge,
    qhist_quantiles,
)
from data_integration_est_spark.streaming.monitor import _read_off

LO, HI, BINS = 0.0, 1000.0, 64
QS = (0.25, 0.5, 0.9)


@pytest.fixture(scope="module")
def vals(spark):
    rng = random.Random(31)
    rows = [
        (f"k{i % 3}", rng.gauss(300 + 100 * (i % 3), 120))
        for i in range(5000)
    ]
    # out-of-range mass on both sides exercises the clamp
    rows += [("k0", -50.0)] * 20 + [("k1", 5000.0)] * 20
    return spark.createDataFrame(rows, "key string, v double"), rows


def test_quantiles_match_monitor_read_off(spark, vals):
    df, rows = vals
    sk = qhist_build(df, "v", LO, HI, BINS, group_cols=["key"])
    got = {
        r["key"]: (r["n"], r["q25"], r["q50"], r["q90"])
        for r in qhist_quantiles(
            sk, LO, HI, BINS, QS, group_cols=["key"]
        ).collect()
    }
    width = (HI - LO) / BINS
    for k in ("k0", "k1", "k2"):
        counts = [0] * BINS
        for kk, v in rows:
            if kk == k:
                b = min(max(int((v - LO) // width), 0), BINS - 1)
                counts[b] += 1
        n, ests = _read_off(counts, LO, width, BINS, QS)
        assert got[k][0] == n
        assert got[k][1:] == tuple(ests), k


def test_error_contract_vs_exact(spark, vals):
    df, rows = vals
    sk = qhist_build(df, "v", LO, HI, BINS, group_cols=["key"])
    q = {
        r["key"]: r["q50"]
        for r in qhist_quantiles(
            sk, LO, HI, BINS, (0.5,), group_cols=["key"]
        ).collect()
    }
    width = (HI - LO) / BINS
    for k in ("k0", "k1", "k2"):
        xs = sorted(min(max(v, LO), HI) for kk, v in rows if kk == k)
        exact = xs[int(0.5 * len(xs))]
        assert abs(q[k] - exact) <= width + 1e-9, k


def test_merge_monoid(spark, vals):
    df, _ = vals
    a = df.filter(F.col("v") < 300)
    b = df.filter(F.col("v") >= 300)
    merged = qhist_merge(
        qhist_build(a, "v", LO, HI, BINS, group_cols=["key"]),
        qhist_build(b, "v", LO, HI, BINS, group_cols=["key"]),
    )
    direct = qhist_build(df, "v", LO, HI, BINS, group_cols=["key"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_occupancy_and_validation(spark, vals):
    df, rows = vals
    sk = qhist_build(df, "v", LO, HI, BINS, group_cols=["key"])
    occ = {r["key"]: r for r in qhist_count_distinct_bins(
        sk, ["key"]).collect()}
    assert sum(r["n"] for r in occ.values()) == len(rows)
    assert all(2 <= r["n_bins"] <= BINS for r in occ.values())
    with pytest.raises(ValueError):
        qhist_build(df, "v", 10.0, 1.0, BINS)
    with pytest.raises(ValueError):
        qhist_quantiles(sk, LO, HI, BINS, (0.0,))


def test_read_off_plan_has_no_collect_shape(spark, vals):
    df, _ = vals
    sk = qhist_build(df, "v", LO, HI, BINS, group_cols=["key"])
    out = qhist_quantiles(sk, LO, HI, BINS, QS, group_cols=["key"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "CartesianProduct" not in plan


def test_quantile_labels_full_precision_no_collision(spark, vals):
    """Sub-percent quantiles get full-precision labels (r11 ADVICE fix:
    q=0.25 vs q=0.254 must not share a column), and true collisions
    raise instead of silently duplicating an aggregate column."""
    df, _ = vals
    sk = qhist_build(df, "v", LO, HI, BINS, group_cols=["key"])
    out = qhist_quantiles(
        sk, LO, HI, BINS, (0.25, 0.254, 0.995), group_cols=["key"]
    )
    assert out.columns == ["key", "n", "q25", "q25_4", "q99_5"]
    assert out.count() == 3
    with pytest.raises(ValueError, match="collide"):
        qhist_quantiles(sk, LO, HI, BINS, (0.5, 0.5))


def test_merge_mismatched_params_raises(spark, vals):
    """r11 (r10 verdict #5): the build parameters ride the sketch as
    schema metadata, so merging or reading off histograms with
    different (lo, hi, bins) fails loudly at plan time."""
    df, _ = vals
    a = qhist_build(df, "v", LO, HI, BINS)
    b = qhist_build(df, "v", LO, HI, 32)
    c = qhist_build(df, "v", LO, 500.0, BINS)
    with pytest.raises(ValueError, match="mismatched"):
        qhist_merge(a, b)
    with pytest.raises(ValueError, match="mismatched"):
        qhist_merge(a, c)
    with pytest.raises(ValueError, match="built with"):
        qhist_quantiles(a, LO, HI, 32, QS)
    # like-parameterized merges and read-offs are untouched, and the
    # metadata survives the merge itself
    m = qhist_merge(a, qhist_build(df, "v", LO, HI, BINS))
    assert qhist_quantiles(m, LO, HI, BINS, QS).count() == 1
    # a hand-built sketch table (no metadata) stays accepted
    plain = spark.createDataFrame([(0, 10), (1, 5)], "bin long, cnt long")
    assert qhist_quantiles(plain, 0.0, 2.0, 2, (0.5,)).count() == 1
