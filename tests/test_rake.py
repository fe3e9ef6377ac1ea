"""Raking / IPF (``kernels/rake``): converged margins must equal the
targets, weights stay positive, and the factor chain must match an
independent numpy IPF on the same data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.rake import RakingError, rake


@pytest.fixture(scope="module")
def sample(spark):
    # 2 x 3 cells with unbalanced counts
    rows = []
    i = 0
    for a, b, n in [("m", "x", 10), ("m", "y", 5), ("m", "z", 15),
                    ("f", "x", 20), ("f", "y", 25), ("f", "z", 5)]:
        for _ in range(n):
            rows.append((i, a, b, 1.0 + (i % 7) / 7.0))
            i += 1
    return spark.createDataFrame(rows, "id long, a string, b string, d double").cache()


MARGINS = {
    "a": {"m": 100.0, "f": 140.0},
    "b": {"x": 90.0, "y": 80.0, "z": 70.0},
}


def test_rake_converges_to_margins(sample):
    out = rake(sample, MARGINS, d_col="d", max_iter=50, tol=1e-10)
    for col, targets in MARGINS.items():
        got = {
            r[col]: r["s"]
            for r in out.groupBy(col).agg(F.sum("w_rake").alias("s")).collect()
        }
        for lvl, t in targets.items():
            assert got[lvl] == pytest.approx(t, rel=1e-8), (col, lvl)
    assert out.filter(F.col("w_rake") <= 0).count() == 0


def test_rake_matches_numpy_ipf(sample):
    """Fixed 4 sweeps, no early stop: the per-cell raked mass must equal
    an independent numpy IPF run with the same sweep order."""
    pdf = sample.toPandas()
    cells = pdf.groupby(["a", "b"])["d"].sum()
    w = {k: float(v) for k, v in cells.items()}
    for _ in range(4):
        for col, targets in MARGINS.items():
            idx = 0 if col == "a" else 1
            sums: dict = {}
            for k, v in w.items():
                sums[k[idx]] = sums.get(k[idx], 0.0) + v
            w = {k: v * targets[k[idx]] / sums[k[idx]] for k, v in w.items()}

    out = rake(sample, MARGINS, d_col="d", max_iter=4, tol=None)
    got = {
        (r["a"], r["b"]): r["s"]
        for r in out.groupBy("a", "b").agg(F.sum("w_rake").alias("s")).collect()
    }
    assert set(got) == set(w)
    for k in w:
        assert got[k] == pytest.approx(w[k], rel=1e-10), k


def test_rake_unknown_level_raises(sample):
    bad = {"a": {"m": 100.0}, "b": MARGINS["b"]}  # data has level "f" too
    with pytest.raises(RakingError, match="no target"):
        rake(sample, bad, d_col="d")


def test_rake_no_margins_raises(sample):
    with pytest.raises(RakingError, match="at least one margin"):
        rake(sample, {}, d_col="d")


def test_rake_plan_is_single_projection(sample):
    """The returned frame must not stack per-sweep joins: the raked
    weight is one map-literal projection over the input."""
    out = rake(sample, MARGINS, d_col="d", max_iter=5, tol=None)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_poststratify_hits_targets_and_matches_numpy(spark):
    """r6: postStratify — each stratum's weight total must equal its
    population count exactly; equals rake with one margin."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_integration_est_spark.kernels.rake import poststratify, rake

    rows = [(i, ["a", "b", "c"][i % 3], 1.0 + (i % 4)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string, d double")
    pop = {"a": 500.0, "b": 800.0, "c": 250.0}
    out = poststratify(df, "g", pop, d_col="d")
    got = {r["g"]: r["t"] for r in
           out.groupBy("g").agg(F.sum("w_ps").alias("t")).collect()}
    for g, target in pop.items():
        assert got[g] == pytest.approx(target, rel=1e-12)
    # one-margin rake converges to the same weights in one sweep
    raked = rake(df, {"g": pop}, d_col="d", max_iter=1, tol=None)
    a = sorted(r["w_ps"] for r in out.select("w_ps").collect())
    b = sorted(r["w_rake"] for r in raked.select("w_rake").collect())
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_poststratify_validates(spark):
    from data_integration_est_spark.kernels.rake import RakingError, poststratify

    df = spark.createDataFrame([(1, "a", 1.0)], "id long, g string, d double")
    with pytest.raises(RakingError, match="empty"):
        poststratify(df, "g", {}, d_col="d")
    with pytest.raises(RakingError, match="no population count"):
        poststratify(df, "g", {"zzz": 10.0}, d_col="d")


def _np_trim(w, lo, hi, groups=None, iters=1):
    """Numpy replica of one-or-more trim-and-redistribute passes."""
    w = w.astype(float).copy()
    g = np.zeros(len(w), dtype=int) if groups is None else groups
    for _ in range(iters):
        clip = np.clip(w, lo, hi)
        interior = (w > lo) & (w < hi)
        out = clip.copy()
        dirty = False
        for gv in np.unique(g):
            m = g == gv
            ex = float((w[m] - clip[m]).sum())
            mass = float(clip[m & interior].sum())
            if ex != 0.0:
                dirty = True
                out[m & interior] = clip[m & interior] * (1.0 + ex / mass)
        w = out
        if not dirty:
            break
    return w


def test_trim_redistribute_matches_numpy_and_preserves_totals(spark):
    from data_integration_est_spark.kernels.rake import (
        trim_weights_redistribute as trim_weights,
    )

    rows = [(i, i % 3, 0.5 + (i * 13 % 29) / 2.0) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, h long, d double")
    w = np.array([r[2] for r in rows])
    g = np.array([r[1] for r in rows])

    out = trim_weights(df, "d", lower=2.0, upper=9.0, by="h").orderBy("id")
    got = np.array([r["w_tr"] for r in out.collect()])
    want = _np_trim(w, 2.0, 9.0, groups=g)
    assert np.allclose(got, want, atol=1e-9)
    # per-group totals preserved exactly
    for gv in (0, 1, 2):
        assert got[g == gv].sum() == pytest.approx(w[g == gv].sum(), rel=1e-12)
    # trimmed rows sit AT the bounds, interior rows inside-or-redistributed
    assert got.min() >= 2.0 - 1e-9


def test_trim_redistribute_global_and_one_sided(spark):
    from data_integration_est_spark.kernels.rake import (
        trim_weights_redistribute as trim_weights,
    )

    rows = [(i, 1.0 + (i * 7 % 23)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, d double")
    w = np.array([r[1] for r in rows])
    got = np.array([
        r["w_tr"] for r in
        trim_weights(df, "d", upper=15.0).orderBy("id").collect()
    ])
    want = _np_trim(w, -np.inf, 15.0)
    assert np.allclose(got, want, atol=1e-9)
    assert got.sum() == pytest.approx(w.sum(), rel=1e-12)
    assert got.max() > 15.0 - 1e-9  # redistribution pushed someone up


def test_trim_redistribute_strict_iterates_until_clean(spark):
    from data_integration_est_spark.kernels.rake import (
        trim_weights_redistribute as trim_weights,
    )

    # heavy mass at the cap: one pass overflows interior rows
    rows = [(i, 20.0 if i < 30 else 9.0 if i < 60 else 1.0)
            for i in range(90)]
    df = spark.createDataFrame(rows, "id long, d double")
    w = np.array([r[1] for r in rows])
    got = np.array([
        r["w_tr"] for r in
        trim_weights(df, "d", upper=10.0, strict=True, max_iter=10)
        .orderBy("id").collect()
    ])
    assert got.max() <= 10.0 + 1e-9
    assert got.sum() == pytest.approx(w.sum(), rel=1e-12)
    want = _np_trim(w, -np.inf, 10.0, iters=10)
    assert np.allclose(got, want, atol=1e-9)


def test_trim_redistribute_validation(spark):
    from data_integration_est_spark.kernels.rake import (
        trim_weights_redistribute as trim_weights,
    )

    df = spark.createDataFrame([(0, 5.0), (1, 7.0)], "id long, d double")
    with pytest.raises(RakingError, match="at least one bound"):
        trim_weights(df, "d")
    with pytest.raises(RakingError, match="lower"):
        trim_weights(df, "d", lower=9.0, upper=3.0)
    # all rows above the cap -> infeasible, refused upfront
    with pytest.raises(RakingError, match="INFEASIBLE"):
        trim_weights(df, "d", upper=1.0)


def test_trim_redistribute_infeasible_bounds_refuse_upfront(spark):
    from data_integration_est_spark.kernels.rake import (
        trim_weights_redistribute as trim_weights,
    )

    # mean weight 25 > cap 20: total cannot survive under the bounds
    df = spark.createDataFrame(
        [(i, 25.0 + (i % 3)) for i in range(30)], "id long, d double")
    with pytest.raises(RakingError, match="INFEASIBLE"):
        trim_weights(df, "d", upper=20.0)
