"""Round-8 LLM-pipeline ops: SemDeDup, model-based quality cut,
portable HyperLogLog — numpy/exact oracles."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(5)
    n, dim = 120, 16
    base = rng.normal(size=(n, dim))
    # plant near-duplicates: rows 100-119 are jittered copies of 0-19
    base[100:] = base[:20] + rng.normal(scale=0.01, size=(20, dim))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": [list(map(float, v)) for v in base]}
    )
    return spark.createDataFrame(pdf), base


def _numpy_semdedup(V, centroids, threshold):
    """Oracle replay of the documented engine semantics."""
    C = np.asarray(centroids, dtype=float)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    sims = V @ Cn.T
    cl = np.argmax(sims, axis=1)  # first max on ties, like the engine fold
    nrm = np.linalg.norm(V, axis=1)
    csim = sims[np.arange(len(V)), cl] / nrm
    dup = np.zeros(len(V), dtype=bool)
    rank = {}
    for c in np.unique(cl):
        idx = np.where(cl == c)[0]
        order = idx[np.lexsort((idx, -csim[idx]))]  # csim desc, id asc
        Vn = V[order] / nrm[order, None]
        G = np.round(Vn @ Vn.T, 6)
        for i in range(1, len(order)):
            if (G[i, :i] >= threshold).any():
                dup[order[i]] = True
        for r, j in enumerate(order):
            rank[j] = r + 1
    return cl, dup, rank


def test_semdedup_matches_numpy(vec_df):
    from data_integration_est_spark.ops.semdedup import (
        deterministic_centroids, semdedup_flags,
    )

    df, V = vec_df
    cents = deterministic_centroids(df, k=3, n_iter=2)
    fl = {r["vec_id"]: r for r in
          semdedup_flags(df, threshold=0.95, centroids=cents).collect()}
    cl, dup, rank = _numpy_semdedup(V, cents, 0.95)
    assert len(fl) == len(V)
    for i in range(len(V)):
        assert fl[i]["cluster"] == cl[i], i
        assert fl[i]["is_semdup"] == bool(dup[i]), i
        assert fl[i]["c_rank"] == rank[i], i
    # each planted twin pair (j, 100+j) has cosine ~ 0.9999: whichever
    # ranks lower is flagged — at least one of each pair must be a dup
    # whenever the two land in the same cluster (which is nearly always)
    caught = sum(
        fl[j]["is_semdup"] or fl[100 + j]["is_semdup"] for j in range(20)
    )
    assert caught >= 18


def test_semdedup_survivors_and_trained_path(vec_df):
    from data_integration_est_spark.ops.semdedup import semdedup

    df, V = vec_df
    kept = semdedup(df, threshold=0.95, k=3, n_iter=2)
    assert set(kept.columns) == {"vec_id", "embedding"}
    n = kept.count()
    assert 0 < n < 120  # planted dups removed, most rows survive
    # determinism: same call, same survivor set
    ids1 = {r["vec_id"] for r in kept.collect()}
    ids2 = {r["vec_id"] for r in
            semdedup(df, threshold=0.95, k=3, n_iter=2).collect()}
    assert ids1 == ids2


def test_lloyd_deterministic_centroids_fixpoint(spark):
    """Two clearly-separated blobs: 2-means from the two lowest ids (one
    planted in each blob) must recover the blob means exactly."""
    from data_integration_est_spark.ops.semdedup import (
        deterministic_centroids,
    )

    rng = np.random.default_rng(9)
    a = rng.normal(loc=(10, 0, 0), scale=0.1, size=(40, 3))
    b = rng.normal(loc=(-10, 0, 0), scale=0.1, size=(40, 3))
    rows = [(0, list(map(float, a[0])))] + [(1, list(map(float, b[0])))]
    rows += [(i + 2, list(map(float, v))) for i, v in enumerate(np.vstack([a[1:], b[1:]]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = deterministic_centroids(df, k=2, n_iter=3)
    got = sorted(np.asarray(cents)[:, 0])
    assert got[0] == pytest.approx(-10, abs=0.2)
    assert got[1] == pytest.approx(10, abs=0.2)


def test_classifier_quality_cut_matches_numpy(spark):
    from data_integration_est_spark.ops.quality_model import (
        classifier_quality_cut,
    )
    from tests import oracle_np

    rng = np.random.default_rng(17)
    n = 400
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": [f"s{i % 5}" for i in range(n)],
            "f1": rng.normal(size=n),
            "f2": rng.normal(size=n),
        }
    )
    logits = -0.5 + 1.2 * pdf.f1 - 0.8 * pdf.f2
    pdf["y"] = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits))).astype(float)
    df = spark.createDataFrame(pdf)
    kept, fit = classifier_quality_cut(df, ["f1", "f2"], "y", 0.4,
                                       key_cols="source")
    X = np.column_stack([np.ones(n), pdf.f1, pdf.f2])
    beta = oracle_np.irls_logistic(X, pdf.y.to_numpy())
    np.testing.assert_allclose(fit.coef_for(()), beta, rtol=1e-7)
    # survivor set: per-source top ceil(0.4 * 80) = 32 by score
    scores = X @ beta
    want = set()
    for s in pdf.source.unique():
        idx = pdf.index[pdf.source == s].to_numpy()
        order = idx[np.lexsort((idx, -scores[idx]))]
        want.update(pdf.doc_id[order[: math.ceil(0.4 * len(order))]])
    got = {r["doc_id"] for r in kept.collect()}
    assert got == want
    assert "quality_score" in kept.columns


def test_classifier_cut_scores_unlabeled_rows(spark):
    """DCLM shape: rows with null labels are scored and cut but not
    trained on."""
    from data_integration_est_spark.ops.quality_model import (
        classifier_quality_cut,
    )

    rng = np.random.default_rng(3)
    n = 200
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": ["a"] * n,
            "f1": rng.normal(size=n),
        }
    )
    # noisy labels (perfect separation would — correctly — be refused)
    noisy = (pdf.f1 + rng.normal(scale=1.0, size=n) > 0).astype(float)
    pdf["y"] = np.where(pdf.doc_id % 2 == 0, noisy, np.nan)
    df = spark.createDataFrame(pdf)
    kept, fit = classifier_quality_cut(df, ["f1"], "y", 0.5,
                                       key_cols="source", max_iter=50)
    assert kept.count() == 100  # half of ALL rows, not half the labeled
    assert fit.coef_for(())[1] > 0  # learned the positive slope


def test_hll_error_and_merge(spark):
    from data_integration_est_spark.ops.sketches import (
        hll_count_distinct, hll_estimate, hll_merge, hll_registers,
    )

    for true_n in (500, 20_000):
        df = spark.range(0, 3 * true_n).select(
            (F.col("id") % true_n).alias("u")
        )
        est = hll_count_distinct(df, "u", p=12).collect()[0][0]
        # 1.04/sqrt(4096) ~ 1.6% std err; allow 5 sigma
        assert abs(est - true_n) / true_n < 0.08, (true_n, est)
    # merge == direct on overlapping splits
    df = spark.range(0, 10_000).select((F.col("id") % 4_000).alias("u"))
    a, b = df.filter("u < 2500"), df.filter("u >= 1500")
    merged = hll_estimate(
        hll_merge(hll_registers(a, "u", p=11), hll_registers(b, "u", p=11)),
        11,
    ).collect()[0][0]
    direct = hll_count_distinct(df, "u", p=11).collect()[0][0]
    assert merged == direct


def test_hll_grouped_and_guards(spark):
    from data_integration_est_spark.ops.sketches import (
        hll_count_distinct, hll_registers,
    )

    df = spark.range(0, 9_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1_000).alias("u"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") % 50).alias("v"),
    )
    rows = {r["g"]: r["hll_estimate"]
            for r in hll_count_distinct(df, "u", p=12, group_cols=["g"]).collect()}
    assert set(rows) == {"0", "1", "2"}
    for g, e in rows.items():
        # step 3 is coprime to 1000, so each group covers ALL 1000
        # residues of u over a 9000-id span
        assert abs(e - 1000) / 1000 < 0.1, (g, e)
    # nulls skipped: estimate reflects the 50 non-null values
    e50 = hll_count_distinct(df, "v", p=12).collect()[0][0]
    assert abs(e50 - 50) < 10
    with pytest.raises(ValueError):
        hll_registers(df, "u", p=2)


def test_kfold_cv_logistic_matches_numpy(spark):
    """r8: leave-one-fold-out CV via fold explosion + ONE grouped IRLS
    == k separate numpy IRLS fits and holdout metrics."""
    from data_integration_est_spark.ops.crossval import kfold_cv_logistic
    from tests import oracle_np

    rng = np.random.default_rng(29)
    n, k = 600, 3
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "f1": rng.normal(size=n),
            "f2": rng.normal(size=n),
        }
    )
    logits = 0.3 + 0.9 * pdf.f1 - 1.1 * pdf.f2
    pdf["y"] = (rng.uniform(size=n) < 1 / (1 + np.exp(-logits))).astype(float)
    df = spark.createDataFrame(pdf)
    got = {r["fold"]: r for r in
           kfold_cv_logistic(df, "y", ["f1", "f2"], "id", k=k).collect()}
    assert set(got) == {0, 1, 2}
    X = np.column_stack([np.ones(n), pdf.f1, pdf.f2])
    yv = pdf.y.to_numpy()
    fold = (pdf.id % k).to_numpy()
    for j in range(k):
        tr, te = fold != j, fold == j
        beta = oracle_np.irls_logistic(X[tr], yv[tr])
        p = 1 / (1 + np.exp(-(X[te] @ beta)))
        ll = -np.mean(yv[te] * np.log(p) + (1 - yv[te]) * np.log(1 - p))
        acc = np.mean((p >= 0.5) == yv[te])
        br = np.mean((yv[te] - p) ** 2)
        assert got[j]["n_train"] == int(tr.sum())
        assert got[j]["n_test"] == int(te.sum())
        assert got[j]["logloss"] == pytest.approx(ll, abs=2e-6)
        assert got[j]["brier"] == pytest.approx(br, abs=2e-6)
        assert got[j]["accuracy"] == pytest.approx(acc, abs=2e-6)
    with pytest.raises(ValueError):
        kfold_cv_logistic(df, "y", ["f1"], "id", k=1)


def test_hll_estimate_stays_in_plan(spark):
    """Round-10: the read-off is a column expression — no collect()
    round-trip (the plan must be a real aggregate, not a driver-built
    LocalTableScan) — and it must agree with the scalar
    read_off_estimate to float precision on every group."""
    from data_integration_est_spark.ops.sketches import (
        hll_estimate, hll_registers, read_off_estimate,
    )

    df = spark.range(0, 30_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % (F.col("id") % 5 * 700 + 100)).alias("u"),
    )
    regs = hll_registers(df, "u", p=9, group_cols=["g"])
    est = hll_estimate(regs, 9, group_cols=["g"])
    plan = est._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalTableScan" not in plan and "Aggregate" in plan
    # scalar replay over the same registers
    m = 1 << 9
    moments = regs.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count(F.lit(1)).alias("nb"),
    ).collect()
    want = {r["g"]: read_off_estimate(float(r["s"]), int(r["nb"]), m)
            for r in moments}
    got = {r["g"]: r["hll_estimate"] for r in est.collect()}
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], rel=1e-12), g


def test_distinct_monitor_batch_stays_in_plan(spark):
    from data_integration_est_spark.streaming.cardinality import (
        distinct_monitor_batch,
    )

    df = spark.range(0, 8_000).select(
        (F.col("id") % 2).cast("string").alias("k"),
        (F.col("id") % 900).alias("v"),
    )
    out = distinct_monitor_batch(df, "v", "k", p=10)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalTableScan" not in plan and "Aggregate" in plan
    rows = {r["key"]: r for r in out.collect()}
    assert set(rows) == {"0", "1"}
    for k, r in rows.items():
        # 900 is even, so each parity class sees only 450 residues
        assert abs(r["hll_estimate"] - 450) / 450 < 0.12
        assert r["n_registers"] > 0 and r["reg_checksum"] > 0


def test_assign_clusters_arrow_path_matches_expression(spark, monkeypatch):
    """The large-k Arrow matmul assignment must agree with the codegen
    expression path away from dot-product ties (same argmax, same
    centroid_sim to float tolerance).  Force the arrow path by dropping
    the threshold, then compare against the expression path on the
    same centroids."""
    import data_integration_est_spark.ops.similarity as sim
    from data_integration_est_spark.ops.semdedup import assign_clusters

    df = spark.range(0, 500).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            ((F.col("id") * (j + 3)) % 17 - 8.0).cast("double")
            for j in range(8)
        ]).alias("embedding"),
    )
    cents = [[float((i * (j + 2)) % 11 - 5) for j in range(8)]
             for i in range(6)]
    expr_rows = {r["vec_id"]: r for r in
                 assign_clusters(df, cents).collect()}
    monkeypatch.setattr(sim, "_CODEGEN_CENTROID_TERMS", 1)
    arrow_rows = {r["vec_id"]: r for r in
                  assign_clusters(df, cents).collect()}
    assert set(expr_rows) == set(arrow_rows)
    for vid in expr_rows:
        assert expr_rows[vid]["cluster"] == arrow_rows[vid]["cluster"], vid
        assert arrow_rows[vid]["centroid_sim"] == pytest.approx(
            expr_rows[vid]["centroid_sim"], abs=1e-9
        ), vid


def test_kmeans_large_k_does_not_blow_codegen(spark):
    """r10 probe finding: k x dim beyond ~4k literal terms overflowed
    the janino compiler stack.  A k=80, dim=64 run (5,120 terms — above
    the threshold, far below the crash point only via the arrow path)
    must complete and produce k centroids."""
    from data_integration_est_spark.ops.similarity import kmeans_centroids

    df = spark.range(0, 2_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.col("id") * (j + 7), F.lit(101)) / 50.0 - 1.0)
            .cast("double")
            for j in range(64)
        ]).alias("embedding"),
    )
    cents = kmeans_centroids(df, k=80, n_iter=1, init="hash")
    assert len(cents) == 80 and len(cents[0]) == 64
