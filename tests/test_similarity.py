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
