"""Fellegi–Sunter EM linkage (``ops/fs_linkage``).

Oracle strategy: EM on a PLANTED two-class mixture must recover the
planted m/u/p parameters (the standard identifiability check), the
pattern posteriors must rank matches above non-matches, and the
classify join must be a broadcast that preserves pair count.
"""

import math

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.fs_linkage import (
    fs_classify, fs_em, _em_on_counts,
)


def _planted_pairs(spark, n_match=630, n_non=10080):
    """Deterministic planted mixture over THREE fields (the minimum for
    Fellegi–Sunter identifiability under conditional independence: 2^k-1
    pattern degrees of freedom must cover 2k+1 parameters, so k >= 3).

    Conditional independence is EXACT by construction: the fields use
    pairwise-coprime moduli (20/10, 7, 9) and the class sizes are exact
    multiples of the cycle lengths (lcm(10,7,9)=630, lcm(20,7,9)=1260),
    so within each class the residues are jointly uniform and the three
    indicators are independent with rates
    matches  0.9, 6/7, 8/9   /   non-matches 0.05, 1/7, 1/9.
    No RNG anywhere."""
    base = spark.range(n_match + n_non).withColumn(
        "is_m", (F.col("id") < n_match).cast("int")
    )
    return base.select(
        "is_m",
        F.when(
            F.col("is_m") == 1, (F.col("id") % 10 != 0).cast("int")
        ).otherwise((F.col("id") % 20 == 3).cast("int")).alias("g1"),
        F.when(
            F.col("is_m") == 1, (F.col("id") % 7 != 0).cast("int")
        ).otherwise((F.col("id") % 7 == 1).cast("int")).alias("g2"),
        F.when(
            F.col("is_m") == 1, (F.col("id") % 9 != 0).cast("int")
        ).otherwise((F.col("id") % 9 == 2).cast("int")).alias("g3"),
    )


class TestEMRecovery:
    def test_recovers_planted_mixture(self, spark):
        pairs = _planted_pairs(spark)
        model = fs_em(pairs, ["g1", "g2", "g3"], n_iter=120)
        # planted: m = (0.9, 6/7, 8/9), u = (0.05, 1/7, 1/9), p = 630/10710
        assert model.m[0] == pytest.approx(0.9, abs=0.05)
        assert model.m[1] == pytest.approx(6 / 7, abs=0.05)
        assert model.m[2] == pytest.approx(8 / 9, abs=0.05)
        assert model.u[0] == pytest.approx(0.05, abs=0.02)
        assert model.u[1] == pytest.approx(1 / 7, abs=0.03)
        assert model.u[2] == pytest.approx(1 / 9, abs=0.03)
        assert model.p == pytest.approx(630 / 10710, abs=0.02)

    def test_posterior_monotone_in_agreement(self, spark):
        pairs = _planted_pairs(spark)
        model = fs_em(pairs, ["g1", "g2", "g3"], n_iter=120)
        post = {p["gamma"]: p["posterior"] for p in model.patterns}
        assert post[(1, 1, 1)] > post[(1, 1, 0)] > post[(0, 0, 0)]
        assert post[(1, 1, 1)] > post[(0, 1, 1)] > post[(0, 0, 0)]

    def test_log2_weight_consistent_with_params(self, spark):
        pairs = _planted_pairs(spark)
        model = fs_em(pairs, ["g1", "g2", "g3"], n_iter=30)
        for pat in model.patterns:
            expect = sum(
                math.log2(model.m[j] / model.u[j])
                if pat["gamma"][j]
                else math.log2((1 - model.m[j]) / (1 - model.u[j]))
                for j in range(3)
            )
            assert pat["log2_weight"] == pytest.approx(expect, rel=1e-12)

    def test_deterministic(self, spark):
        pairs = _planted_pairs(spark)
        a = fs_em(pairs, ["g1", "g2", "g3"], n_iter=25)
        b = fs_em(pairs, ["g1", "g2", "g3"], n_iter=25)
        assert a.m == b.m and a.u == b.u and a.p == b.p

    def test_em_counts_kernel_matches_direct_formula(self):
        # one hand-checked E/M step on a 2-pattern table
        counts = [((0,), 50.0), ((1,), 50.0)]
        m, u, p = _em_on_counts(counts, 1, 1, 0.9, 0.1, 0.5)
        # w(g=1) = .5*.9/(.5*.9+.5*.1) = .9 ; w(g=0) = .5*.1/(.5*.1+.5*.9) = .1
        # m = 50*.9 / (50*.1 + 50*.9) = .9 ; u = 50*.1/(50*.9+50*.1) = .1
        # p = (50*.1 + 50*.9)/100 = .5
        assert m[0] == pytest.approx(0.9)
        assert u[0] == pytest.approx(0.1)
        assert p == pytest.approx(0.5)


class TestClassify:
    def test_three_way_decision_and_count_preserved(self, spark):
        pairs = _planted_pairs(spark)
        model = fs_em(pairs, ["g1", "g2", "g3"], n_iter=120)
        out = fs_classify(pairs, model, upper=0.5, lower=0.01)
        assert out.count() == pairs.count()
        by_dec = {
            r["decision"]: r["n"]
            for r in out.groupBy("decision").agg(F.count("*").alias("n")).collect()
        }
        assert set(by_dec) <= {"match", "non_match", "review"}
        # full-agreement matches must be classified as matches
        full = out.filter(
            (F.col("g1") == 1) & (F.col("g2") == 1) & (F.col("g3") == 1)
        ).first()
        assert full["decision"] == "match"

    def test_classify_plan_broadcasts_weights(self, spark):
        pairs = _planted_pairs(spark)
        model = fs_em(pairs, ["g1", "g2", "g3"], n_iter=10)
        plan = fs_classify(pairs, model)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_guard_bad_bounds(self, spark):
        pairs = _planted_pairs(spark)
        model = fs_em(pairs, ["g1", "g2", "g3"], n_iter=5)
        with pytest.raises(ValueError, match="lower <= upper"):
            fs_classify(pairs, model, upper=0.2, lower=0.8)


class TestGuards:
    def test_empty_agree_cols(self, spark):
        pairs = _planted_pairs(spark)
        with pytest.raises(ValueError, match="at least one"):
            fs_em(pairs, [])

    def test_non_binary_column(self, spark):
        bad = spark.range(10).select((F.col("id") % 3).alias("g1"))
        with pytest.raises(ValueError, match="must be 0/1"):
            fs_em(bad, ["g1"])

    def test_null_column(self, spark):
        bad = spark.range(10).select(
            F.when(F.col("id") % 2 == 0, 1).otherwise(None).alias("g1")
        )
        with pytest.raises(ValueError, match="must be 0/1"):
            fs_em(bad, ["g1"])


class TestDegenerateEM:
    """Round-9 ADVICE: without [eps, 1-eps] clamping a field that
    never (or always) agrees drives m/u to an exact 0/1, zeroing a
    pattern's class mass (ZeroDivision) and breaking the log2 weights."""

    def test_never_agreeing_field_stays_finite(self, spark):
        import math

        # g2 never agrees anywhere; g1 carries the real signal
        pairs = spark.range(400).select(
            (F.col("id") % 4 == 0).cast("int").alias("g1"),
            F.lit(0).alias("g2"),
        )
        model = fs_em(pairs, ["g1", "g2"], n_iter=200)
        for v in (*model.m, *model.u, model.p):
            assert 0.0 < v < 1.0 and math.isfinite(v)
        out = fs_classify(pairs, model)
        ws = [r["log2_weight"]
              for r in out.select("log2_weight").distinct().collect()]
        assert all(math.isfinite(w) for w in ws)

    def test_always_agreeing_field_stays_finite(self, spark):
        import math

        pairs = spark.range(400).select(
            (F.col("id") % 4 == 0).cast("int").alias("g1"),
            F.lit(1).alias("g2"),
        )
        model = fs_em(pairs, ["g1", "g2"], n_iter=200)
        for v in (*model.m, *model.u, model.p):
            assert 0.0 < v < 1.0 and math.isfinite(v)
