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
