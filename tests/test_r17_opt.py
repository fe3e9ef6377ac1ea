"""Round-17 optimization pins: the changes must be result-invisible.

1. ``pq_score_expr``'s Arrow LUT twin is bit-identical to the SQL
   expression path (the r16 ``_l2_argmax_np`` discipline applied to the
   LUT build, whose m=16/k=16 expression tree blew janino's 64 KB
   method limit and silently ran interpreted).
2. The exact Lloyd early-exit cannot change ``kmeans_centroids`` /
   ``pq_train`` output: once converged, extra iterations are fixed
   points, so a deeper ``n_iter`` returns the identical matrix.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401 — fixture


def _emb_df(spark, n=64, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(v) for v in rng.standard_normal(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_lut_arrow_bit_identical_to_expr(spark):
    from data_integration_est_spark.ops import pq

    df = _emb_df(spark, n=48, dim=16)
    # m=8, k=8 -> 64 cells == _ARROW_MIN_CELLS: the Arrow gate fires
    books = pq.pq_train(df, m=8, k=8, n_iter=1)
    assert 8 * max(len(b) for b in books) >= pq._ARROW_MIN_CELLS
    q = df.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("__qv__"))
    w_arrow, _ = pq.pq_score_expr("__qv__", "pq_code", books, q)
    arrow_rows = {r["query_id"]: r for r in w_arrow.collect()}
    # force the expression path for the same books
    old = pq._ARROW_MIN_CELLS
    pq._ARROW_MIN_CELLS = 10**9
    try:
        w_expr, _ = pq.pq_score_expr("__qv__", "pq_code", books, q)
        expr_rows = {r["query_id"]: r for r in w_expr.collect()}
    finally:
        pq._ARROW_MIN_CELLS = old
    assert set(arrow_rows) == set(expr_rows)
    for k in arrow_rows:
        for s in range(len(books)):
            a = arrow_rows[k][f"__pqlut{s}__"]
            e = expr_rows[k][f"__pqlut{s}__"]
            # bit-exact, not approx: the twin must replicate the SQL
            # chain's IEEE operation order
            assert a == e, (k, s)


def test_pq_lut_arrow_null_vector_matches_expr(spark):
    from data_integration_est_spark.ops import pq

    df = _emb_df(spark, n=48, dim=16)
    books = pq.pq_train(df, m=8, k=8, n_iter=1)
    q = spark.createDataFrame(
        [(0, [0.5] * 16), (1, None)],
        "query_id long, __qv__ array<double>",
    )
    w_arrow, _ = pq.pq_score_expr("__qv__", "pq_code", books, q)
    row = {r["query_id"]: r for r in w_arrow.collect()}[1]
    # element_at on a NULL array is NULL -> every LUT entry NULL; the
    # twin must agree (an all-NULL array, not a NULL column)
    for s in range(8):
        assert row[f"__pqlut{s}__"] is None or all(
            v is None for v in row[f"__pqlut{s}__"]
        )


def test_kmeans_early_exit_is_fixed_point(spark):
    from data_integration_est_spark.ops.similarity import kmeans_centroids

    # two well-separated blobs: Lloyd converges in <= 2 iterations, so
    # any deeper n_iter must return the identical centroid matrix
    rng = np.random.default_rng(3)
    rows = [
        (i, [float(v) for v in rng.standard_normal(8) * 0.01
             + (5.0 if i % 2 else -5.0)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c4 = kmeans_centroids(df, k=2, n_iter=4, init="hash")
    c12 = kmeans_centroids(df, k=2, n_iter=12, init="hash")
    assert c4 == c12


def test_pq_train_early_exit_is_fixed_point(spark):
    from data_integration_est_spark.ops import pq

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(v) for v in rng.standard_normal(8) * 0.01
             + (3.0 if i % 2 else -3.0)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b4 = pq.pq_train(df, m=2, k=2, n_iter=4)
    b12 = pq.pq_train(df, m=2, k=2, n_iter=12)
    assert b4 == b12
