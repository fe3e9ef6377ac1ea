"""Pinning tests for the r14 ADVICE items (ADVICE.md, round 13).

1. ``q_embedding_neardup`` is the sanctioned all-pairs ground-truth row
   — it must carry ``max_pairs=None`` so the 50M-candidate refusal
   guard cannot fire at sf1 (20k vectors -> ~200M analytic pairs).
2. The ``fs_linkage_patterns`` SQL oracle derives the adaptive block
   modulus with the same OPEN-ENDED power-of-10 rule as the Python
   ``_fs_pairs`` while-loop (the old CASE capped at 1000, diverging at
   >= 150M customers).
3. ``q_ngram_jaccard`` certifies at j >= 0.6, bounded away from the
   0.5 banding crossover where per-pair miss probability reaches ~1%.
4. ``pq_encode`` / ``pq_score_expr`` replace a pre-existing output /
   LUT column instead of duplicating it (withColumn semantics), so a
   second pass over an already-encoded frame cannot poison downstream
   by-name references with ambiguity.
"""

from __future__ import annotations

import inspect

import duckdb
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark import entry_queries as eq
from data_integration_est_spark.ops import pq


def test_embedding_neardup_opts_out_of_pair_guard():
    src = inspect.getsource(eq.q_embedding_neardup)
    assert "max_pairs=None" in src, (
        "q_embedding_neardup is the all-pairs ground-truth row; without "
        "max_pairs=None the 50M guard refuses at sf1"
    )


def _oracle_blockmod(n_cust: int) -> int:
    sql = eq.SQL_FS_LINKAGE
    start = sql.index("WITH blockmod AS (")
    frag = sql[start:sql.index("),", start)]
    expr = frag[frag.index("SELECT"):]
    # run the modulus expression against a synthetic customer count
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM range({n_cust})")
    return con.execute(expr).fetchone()[0]


def _python_blockmod(n_cust: int) -> int:
    mod, thresh = 10, 1_500_000
    while n_cust >= thresh:
        mod, thresh = mod * 10, thresh * 10
    return mod


@pytest.mark.parametrize("n", [
    1, 1000, 149_999, 150_000, 1_499_999, 1_500_000, 14_999_999,
    15_000_000, 149_999_999, 150_000_000, 1_500_000_000,
])
def test_fs_oracle_blockmod_matches_python_rule_open_ended(n):
    assert _oracle_blockmod(n) == _python_blockmod(n), (
        f"SQL oracle and _fs_pairs diverge on the block modulus at "
        f"n_cust={n}"
    )


def test_ngram_jaccard_certifies_away_from_banding_crossover():
    src = inspect.getsource(eq.q_ngram_jaccard)
    assert "threshold=0.6" in src
    assert "WHERE p.jaccard >= 0.6" in eq.SQL_NGRAM_JACCARD
    # at the certified threshold the 16x2 banding's per-pair miss
    # probability is (1 - j^2)^16 <= 0.08% — negligible vs ~1% at 0.5
    assert (1 - 0.6 ** 2) ** 16 < 0.001


def _tiny_emb(spark, n=8, d=4):
    rows = [(i, [float((i * 7 + j * 3) % 5) for j in range(d)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_replaces_existing_out_col(spark):
    df = _tiny_emb(spark)
    books = pq.pq_train(df, m=2, k=4, n_iter=2)
    once = pq.pq_encode(df, books)
    twice = pq.pq_encode(once, books)
    assert twice.columns.count("pq_code") == 1
    # by-name reference must not be ambiguous, and codes are stable
    a = sorted(tuple(r) for r in once.select("vec_id", "pq_code").collect())
    b = sorted(tuple(r) for r in twice.select("vec_id", "pq_code").collect())
    assert a == b


def test_pq_score_expr_idempotent_on_lut_columns(spark):
    df = _tiny_emb(spark)
    books = pq.pq_train(df, m=2, k=4, n_iter=2)
    enc = pq.pq_encode(df, books).withColumn(
        "__qv__", F.col("embedding").cast("array<double>")
    )
    w1, s1 = pq.pq_score_expr("__qv__", "pq_code", books, enc)
    w2, s2 = pq.pq_score_expr("__qv__", "pq_code", books, w1)
    luts = [c for c in w2.columns if c.startswith("__pqlut")]
    assert len(luts) == len(set(luts)) == len(books)
    r1 = sorted((r[0], round(r[1], 9))
                for r in w1.select("vec_id", s1.alias("s")).collect())
    r2 = sorted((r[0], round(r[1], 9))
                for r in w2.select("vec_id", s2.alias("s")).collect())
    assert r1 == r2
