"""Product quantization (``ops/pq``): encode matches a numpy argmin-L2
replay given the trained codebooks; ADC is exact when the corpus is
generated FROM a small set of per-subspace prototypes; the scorer ranks
by approximate dot product."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.pq import (
    pq_encode, pq_knn, pq_score_expr, pq_train)


def _protos():
    rng = np.random.default_rng(17)
    return [rng.normal(0, 1, (4, 3)).round(3) for _ in range(2)]


@pytest.fixture(scope="module")
def protos():
    return _protos()


@pytest.fixture(scope="module")
def proto_corpus(spark, protos):
    """Vectors whose m=2 subvectors are drawn from 4 prototypes each —
    codebooks of size 4 can represent the corpus exactly."""
    rng = np.random.default_rng(18)
    rows = []
    for i in range(240):
        a = protos[0][rng.integers(0, 4)]
        b = protos[1][rng.integers(0, 4)]
        rows.append((i, [float(v) for v in np.concatenate([a, b])]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, rows


def test_pq_encode_matches_numpy_argmin(proto_corpus):
    df, rows = proto_corpus
    books = pq_train(df, m=2, k=4, n_iter=4)
    enc = {r["vec_id"]: list(r["pq_code"])
           for r in pq_encode(df, books).select("vec_id", "pq_code").collect()}
    for i, vec in rows:
        v = np.asarray(vec)
        for s in range(2):
            sv = v[s * 3:(s + 1) * 3]
            C = np.asarray(books[s])
            d2 = ((C - sv) ** 2).sum(axis=1)
            # keep-first tie-break on both sides
            assert enc[i][s] == int(np.argmin(d2)), (i, s)


def test_pq_adc_exact_with_prototype_codebooks(proto_corpus, protos):
    """With codebooks equal to the true prototypes, every subvector
    encodes to its generator exactly, so the ADC score equals the exact
    dot product and the ADC ranking equals the exact ranking.  (Trained
    codebooks carry k-means local-optimum error — the training path is
    pinned separately by the numpy argmin replay.)"""
    df, rows = proto_corpus
    books = [[[float(v) for v in c] for c in p] for p in protos]
    queries = df.filter(F.col("vec_id") < 5)
    out = pq_knn(df, queries, books, k=3).collect()
    vecs = {i: np.asarray(v) for i, v in rows}
    for r in out:
        exact = float(vecs[r["query_id"]] @ vecs[r["neighbor_id"]])
        assert r["adc_score"] == pytest.approx(exact, rel=1e-6, abs=1e-6)
    # top-1 by ADC == the vector itself (max self-dot on this data)
    top1 = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    # self-similarity need not be max for dot products; just check the
    # ADC ordering equals the exact-dot ordering per query
    ids = sorted(vecs)
    for qid in range(5):
        sims = sorted(
            ((float(vecs[qid] @ vecs[j]), -j) for j in ids), reverse=True
        )[:3]
        want = [-s[1] for s in sims]
        got = [r["neighbor_id"] for r in sorted(
            (x for x in out if x["query_id"] == qid), key=lambda x: x["rank"])]
        assert got == want, qid


def test_pq_train_validates(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m=2, k=2)
    with pytest.raises(ValueError, match="empty"):
        pq_train(df.filter(F.col("vec_id") < 0), m=1, k=2)


def test_pq_candidate_restricted_scoring(proto_corpus):
    df, _ = proto_corpus
    books = pq_train(df, m=2, k=4, n_iter=3)
    queries = df.filter(F.col("vec_id") < 3)
    cand = spark_cand = queries.select(
        F.col("vec_id").alias("query_id")
    ).crossJoin(
        df.filter(F.col("vec_id") % 7 == 0)
        .select(F.col("vec_id").alias("neighbor_id"))
    )
    out = pq_knn(df, queries, books, k=5, candidates=cand).collect()
    assert all(r["neighbor_id"] % 7 == 0 for r in out)
    assert {r["query_id"] for r in out} == {0, 1, 2}


def test_pq_composes_with_ivf_candidates(spark, proto_corpus, protos):
    """The scale path: IVF prunes candidates, PQ scores them in the
    compressed domain — the FAISS IVFxx,PQyy composition."""
    from data_integration_est_spark.ops.similarity import ivf_knn

    df, rows = proto_corpus
    books = [[[float(v) for v in c] for c in p] for p in protos]
    queries = df.filter(F.col("vec_id") < 3)
    cand = ivf_knn(df, queries, k=40, n_clusters=4, n_probe=3,
                   n_iter=2, init_rounds=1).select("query_id", "neighbor_id")
    out = pq_knn(df, queries, books, k=5, candidates=cand).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    assert all(1 <= r["rank"] <= 5 for r in out)
    # exact codebooks: ADC scores equal exact dots on the candidates
    vecs = {i: np.asarray(v) for i, v in rows}
    for r in out:
        exact = float(vecs[r["query_id"]] @ vecs[r["neighbor_id"]])
        assert r["adc_score"] == pytest.approx(exact, rel=1e-6, abs=1e-6)


def test_arrow_and_expr_paths_bit_identical(spark):
    """r14: above _ARROW_MIN_CELLS the train assignment and encode
    dispatch to an Arrow numpy twin — pin that its codebooks and codes
    are BIT-identical to the expression path (left-to-right IEEE
    accumulation, first-max ties; see _l2_argmax_np)."""
    from data_integration_est_spark.ops import pq as pqm

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(300)
    )
    old = pqm._ARROW_MIN_CELLS
    try:
        pqm._ARROW_MIN_CELLS = 10 ** 9  # force expression path
        books_expr = pqm.pq_train(emb, m=8, k=8, n_iter=2)
        enc_expr = sorted(
            (r["vec_id"], tuple(r["pq_code"]))
            for r in pqm.pq_encode(emb, books_expr).select(
                "vec_id", "pq_code").collect()
        )
        pqm._ARROW_MIN_CELLS = 1  # force Arrow path
        books_arrow = pqm.pq_train(emb, m=8, k=8, n_iter=2)
        enc_arrow = sorted(
            (r["vec_id"], tuple(r["pq_code"]))
            for r in pqm.pq_encode(emb, books_expr).select(
                "vec_id", "pq_code").collect()
        )
    finally:
        pqm._ARROW_MIN_CELLS = old
    assert books_expr == books_arrow
    assert enc_expr == enc_arrow


def test_encode_arrow_null_vector_encodes_null(spark):
    from data_integration_est_spark.ops import pq as pqm

    df = spark.createDataFrame(
        [(0, [float(j % 5) for j in range(8)]), (1, None)],
        "vec_id long, embedding array<float>",
    )
    books = pqm.pq_train(df.filter("vec_id = 0"), m=2, k=1, n_iter=1)
    old = pqm._ARROW_MIN_CELLS
    try:
        pqm._ARROW_MIN_CELLS = 1
        rows = {r["vec_id"]: r["pq_code"]
                for r in pqm.pq_encode(df, books).collect()}
    finally:
        pqm._ARROW_MIN_CELLS = old
    assert rows[0] is not None and rows[1] is None
