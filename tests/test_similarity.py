"""ANN operators: brute-force vs LSH vs IVF recall, k-means sanity."""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.persist()
    yield df
    df.unpersist()


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_kmeans_deterministic_and_shaped(emb):
    c1 = sim.kmeans_centroids(emb, k=8, n_iter=2, seed=7)
    c2 = sim.kmeans_centroids(emb, k=8, n_iter=2, seed=7)
    assert c1 == c2
    assert len(c1) == 8
    assert all(len(c) == 64 for c in c1)


def test_ivf_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _pairs(sim.brute_force_knn(emb, queries, k=5))
    approx = _pairs(sim.ivf_knn(emb, queries, k=5, n_clusters=8, n_probe=4, n_iter=2))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"
    # full probe = exhaustive search = exact
    full = _pairs(sim.ivf_knn(emb, queries, k=5, n_clusters=8, n_probe=8, n_iter=2))
    assert full == exact


def test_lsh_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = _pairs(sim.brute_force_knn(emb, queries, k=5))
    # bucket granularity must fit corpus size: 2^3 buckets x 8 tables for
    # the 500-vector sf0.001 corpus gives ~0.87 recall
    approx = _pairs(sim.lsh_knn(emb, queries, k=5, n_bits=3, n_tables=8))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall {recall:.2f} too low"


def test_near_dup_exact_vs_lsh_candidates(emb):
    exact = {
        (r["id_a"], r["id_b"])
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.2).collect()
    }
    cand = sim.lsh_bucket_candidates(emb, n_bits=4, n_tables=8)
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.2, candidates=cand).collect()
    }
    # LSH output is a subset of the exact pairs (no false positives after
    # the verify step) with reasonable recall at these settings
    assert bucketed <= exact
    if exact:
        assert len(bucketed) / len(exact) >= 0.3


# ------------------------------------------------- second moment / PCA
def test_second_moment_matches_numpy(emb):
    import numpy as np

    X = np.stack([r["embedding"] for r in emb.select("embedding").collect()])
    X = X.astype("float64")
    want = (X.T @ X) / len(X)
    got = {(r["i"], r["j"]): r["m"] for r in sim.embedding_second_moment(emb).collect()}
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(0, d, 7):
        for j in range(i, d, 11):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-6)


def test_second_moment_partitioning_invariant(emb):
    a = sorted(map(tuple, sim.embedding_second_moment(emb).collect()))
    b = sorted(map(tuple, sim.embedding_second_moment(emb.repartition(7)).collect()))
    assert a == b


def test_pca_matches_numpy(emb):
    import numpy as np

    comps, vals, mu = sim.pca_components(emb, k=4)
    X = np.stack([r["embedding"] for r in emb.select("embedding").collect()])
    X = X.astype("float64")
    # rounding in the long-form stats perturbs the moments at 1e-6;
    # eigenvalues are stable at that scale, eigenvectors up to sign
    cov = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    assert vals == pytest.approx(w[order], rel=1e-3)
    for c_sp, idx in zip(comps, order):
        c_np = v[:, idx]
        dot = abs(float(c_sp @ c_np))
        assert dot == pytest.approx(1.0, abs=1e-3)


def test_pca_project_is_map_only_and_correct(emb):
    import numpy as np

    comps, _, mu = sim.pca_components(emb, k=2)
    out = sim.pca_project(emb, comps, mu)
    rows = out.select("vec_id", "pc0", "pc1").orderBy("vec_id").collect()
    X = np.stack([
        r["embedding"]
        for r in emb.select("embedding").orderBy("vec_id").collect()
    ]).astype("float64")
    want = (X - mu) @ comps.T
    got = np.array([[r["pc0"], r["pc1"]] for r in rows])
    assert np.allclose(got, want, atol=1e-9)
    # map-only: no exchange in the projection plan
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sim.pca_project(emb, comps, mu).explain()
    assert "Exchange" not in buf.getvalue()


def test_ivf_reuses_precomputed_centroids(spark):
    """r7: centroids= reuses a trained index — results identical to the
    train-per-call convenience mode."""
    import numpy as np

    from data_integration_est_spark.ops.similarity import (
        ivf_candidates, ivf_knn, kmeans_centroids,
    )

    rng = np.random.RandomState(2)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 5")
    cents = kmeans_centroids(df, "embedding", "vec_id", k=4, n_iter=2,
                             seed=42, init_rounds=1)
    a = ivf_knn(df, queries, k=3, n_clusters=4, n_probe=2, n_iter=2,
                init_rounds=1).collect()
    b = ivf_knn(df, queries, k=3, n_probe=2, centroids=cents).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ca = ivf_candidates(df, queries, n_clusters=4, n_probe=2, n_iter=2,
                        init_rounds=1).collect()
    cb = ivf_candidates(df, queries, n_probe=2, centroids=cents).collect()
    assert sorted(map(tuple, ca)) == sorted(map(tuple, cb))


class TestLargeKIvfDispatch:
    """Round-10: all IVF surfaces must survive coarse-quantizer k where
    the folded-literal expression would overflow the codegen compiler,
    and the Arrow path must agree with the expression path."""

    def _corpus(self, spark, n=300, dim=8):
        return spark.range(0, n).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                ((F.col("id") * (j + 3)) % 23 - 11.0).cast("double")
                for j in range(dim)
            ]).alias("embedding"),
        )

    def test_query_probes_arrow_matches_expression(self, spark, monkeypatch):
        import data_integration_est_spark.ops.similarity as sim

        df = self._corpus(spark)
        q = df.limit(12)
        cents = [[float((i * (j + 2)) % 7 - 3) for j in range(8)]
                 for i in range(5)]
        expr_rows = sorted(
            (r["query_id"], r["__c__"])
            for r in sim._query_probes(q, cents, 2, "vec_id", "embedding")
            .collect()
        )
        monkeypatch.setattr(sim, "_CODEGEN_CENTROID_TERMS", 1)
        arrow_rows = sorted(
            (r["query_id"], r["__c__"])
            for r in sim._query_probes(q, cents, 2, "vec_id", "embedding")
            .collect()
        )
        assert expr_rows == arrow_rows

    def test_ivf_knn_large_k_end_to_end(self, spark, monkeypatch):
        import data_integration_est_spark.ops.similarity as sim
        from data_integration_est_spark.ops.similarity import ivf_knn

        df = self._corpus(spark)
        q = df.limit(5)
        res_expr = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_knn(df, q, k=3, n_clusters=6, n_probe=6,
                             n_iter=1).collect()
        }
        monkeypatch.setattr(sim, "_CODEGEN_CENTROID_TERMS", 1)
        res_arrow = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_knn(df, q, k=3, n_clusters=6, n_probe=6,
                             n_iter=1).collect()
        }
        # probing ALL clusters makes IVF exact regardless of centroid
        # path, so the two top-k sets must coincide
        assert res_expr == res_arrow


def test_assign_arrow_bit_identical(spark):
    """r14: assign_nearest_arrow accumulates left-to-right — the same
    IEEE op sequence as the codegen chain — so cluster ids AND max-dot
    values are BIT-identical between the two paths (previously the
    BLAS matmul could flip ulp-level ties)."""
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(400)
    )
    cent_rows = emb.filter(F.col("vec_id") < 7).collect()
    centroids = [[float(v) for v in r["embedding"]] for r in cent_rows]
    expr_df = sim._with_cluster(emb, centroids, "embedding")
    expr_res = sorted(
        (r["vec_id"], r["__c__"]) for r in expr_df.collect()
    )
    arrow_df = sim.assign_nearest_arrow(
        emb, centroids, "embedding", out_dot="__d__"
    )
    arrow_res = sorted(
        (r["vec_id"], r["__c__"]) for r in arrow_df.collect()
    )
    assert expr_res == arrow_res
    # and the dot values equal the expression-path array_max exactly
    sims = F.expr(sim._centroid_sims_sql("embedding", centroids))
    expr_dots = {
        r["vec_id"]: r["d"]
        for r in emb.select("vec_id", F.array_max(sims).alias("d")).collect()
    }
    for r in arrow_df.collect():
        assert expr_dots[r["vec_id"]] == r["__d__"], r["vec_id"]
