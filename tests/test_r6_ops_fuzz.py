"""Seeded randomized property tests for the round-6 operator families —
the r5-fuzz pattern: every trial draws a fresh configuration and checks
an exact invariant (python/numpy replay or an algebraic identity)."""

import random
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign


def test_clean_text_is_idempotent_fuzz(spark):
    """clean(clean(x)) == clean(x) on adversarial unicode soup."""
    from data_integration_est_spark.ops.text import clean_text

    rng = random.Random(31)
    pool = (
        [chr(c) for c in range(0x20, 0x7F)]
        + ["\u200b", "\u00ad", "\u00a0", "\u2018", "\u201c", "\u2014",
           "\u2026", "\t", "\n", "\u3000", "\u0007"]
    )
    rows = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randint(0, 120))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = clean_text(df).select("doc_id", F.col("text_clean").alias("text"))
    twice = clean_text(once)
    assert twice.filter(F.col("text") != F.col("text_clean")).count() == 0


def test_bpe_fuzz_matches_python(spark):
    from data_integration_est_spark.ops.bpe import learn_bpe

    rng = random.Random(7)
    words = ["".join(rng.choice("abcde") for _ in range(rng.randint(1, 6)))
             for _ in range(40)]
    # run-heavy words (r7): back-to-back pair occurrences are exactly
    # where the r6 single-space representation under-merged
    words += ["aaaa", "abab", "aaab", "bbbbbb", "ababab", "aaaaa"]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(3, 15)))
             for _ in range(30)]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges, vocab = learn_bpe(df, num_merges=6, checkpoint_every=3)

    wf = Counter(w for t in texts for w in t.split())
    reps = {w: list(w) for w in wf}
    want = []
    for _ in range(6):
        pairs = Counter()
        for w, cnt in wf.items():
            r = reps[w]
            for i in range(len(r) - 1):
                pairs[(r[i], r[i + 1])] += cnt
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((a, b, n))
        for w, r in reps.items():
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and r[i] == a and r[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(r[i]); i += 1
            reps[w] = out
    assert merges == want


def test_poststratify_then_total_is_exact_fuzz(spark):
    from data_integration_est_spark.kernels.rake import poststratify

    rng = np.random.default_rng(13)
    for trial in range(3):
        n = int(rng.integers(50, 300))
        levels = [f"s{j}" for j in range(int(rng.integers(2, 6)))]
        rows = [
            (i, levels[int(rng.integers(0, len(levels)))],
             float(rng.uniform(0.5, 3.0)))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, g string, d double")
        present = {r["g"] for r in df.select("g").distinct().collect()}
        pop = {g: float(rng.uniform(50, 500)) for g in present}
        out = poststratify(df, "g", pop, d_col="d")
        got = {r["g"]: r["t"] for r in
               out.groupBy("g").agg(F.sum("w_ps").alias("t")).collect()}
        for g in present:
            assert got[g] == pytest.approx(pop[g], rel=1e-12), (trial, g)


def test_trimmed_mean_fuzz_matches_numpy(spark):
    from data_integration_est_spark.kernels.quantile import trimmed_mean

    rng = np.random.default_rng(23)
    n = 5000
    y = np.round(rng.gamma(2.0, 10.0, n), 3)
    w = rng.integers(1, 6, n).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, w)], "y double, w double"
    )
    des = SurveyDesign(df=df, weight_col="w")
    for lo, hi in [(0.05, 0.95), (0.2, 0.8)]:
        r = trimmed_mean(des, "y", lo, hi).collect()[0]
        o = np.argsort(y, kind="mergesort"); cw = np.cumsum(w[o])
        ql = float(y[o][np.searchsorted(cw, lo * w.sum(), side="left")])
        qh = float(y[o][np.searchsorted(cw, hi * w.sum(), side="left")])
        m = (y >= ql) & (y <= qh)
        assert r["q_lo"] == ql and r["q_hi"] == qh
        assert r["mean"] == pytest.approx(
            float((w[m] * y[m]).sum() / w[m].sum()), rel=1e-12)


def test_calibrate_raking_random_feasible_totals_fuzz(spark):
    from data_integration_est_spark.kernels.linalg import calibrate_raking

    rng = np.random.default_rng(41)
    n = 400
    x = rng.normal(1.0, 0.3, n)
    d = rng.uniform(0.5, 2.0, n)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, d)], "x double, d double"
    ).withColumn("one", F.lit(1.0))
    X = np.column_stack([np.ones(n), x])
    for trial in range(2):
        f0, f1 = rng.uniform(0.9, 1.2, 2)
        T = np.array([(d * X[:, 0]).sum() * f0, (d * X[:, 1]).sum() * f1])
        res = calibrate_raking(df, ["one", "x"], T, d_col="d")
        out = res.df.select("x", "w_cal").toPandas()
        Xo = np.column_stack([np.ones(len(out)), out.x.to_numpy()])
        np.testing.assert_allclose(Xo.T @ out.w_cal.to_numpy(), T, rtol=1e-8)
        assert (out.w_cal > 0).all(), trial


def test_svyciprop_brackets_p_and_respects_unit_interval(spark):
    from data_integration_est_spark.kernels.stats import svyciprop

    rng = np.random.default_rng(3)
    n = 4000
    z = (rng.random(n) < 0.07).astype(float)   # near-edge proportion
    w = 1.0 + (np.arange(n) % 5)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(z, w)], "z double, w double"
    )
    des = SurveyDesign(df=df, weight_col="w")
    r = svyciprop(des, "z").collect()[0]
    assert 0.0 < r["ci_l"] < r["p"] < r["ci_u"] < 1.0
    wald = svyciprop(des, "z", method="mean").collect()[0]
    # logit interval is asymmetric toward the far edge at small p
    assert (r["ci_u"] - r["p"]) > (r["p"] - r["ci_l"])
    assert wald["p"] == r["p"] and wald["se"] == r["se"]
