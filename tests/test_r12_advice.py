"""r12 regressions for the three ADVICE.md (r11) findings:

1. ``rng`` md5-stream null-key collision — ``concat_ws`` silently skips
   null columns, so (1, null, 2) and (1, 2) used to hash identically;
2. Bloom/CMS probe-layout validation — probing a table built under
   different (params, stride format) must fail loudly, and an unstamped
   table (pre-r11 persisted) must warn;
3. ``clw_grouped(n_iter=0)`` raised ``NameError`` from the diag readout
   instead of a validation error.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark import rng


def test_md5_stream_null_keys_draw_distinctly(spark):
    # (1, null, 2) vs (1, 2): pre-fix both rendered to "1<US>2" and drew
    # the same uniform; the '<null>' sentinel keeps the tuples distinct
    df = spark.createDataFrame(
        [(1, None, 2), (1, 2, None)], "a int, b int, c int"
    )
    u2 = rng.uniform(["a", "b"], seed=7, stream="md5")
    u3 = rng.uniform(["a", "b", "c"], seed=7, stream="md5")
    rows = df.select(u2.alias("u2"), u3.alias("u3")).collect()
    # same (a, b=null) prefix twice -> u2 equal across rows; but the
    # 3-key draws must differ from each other AND from the 2-key draw
    assert rows[0]["u3"] != rows[1]["u3"]
    assert rows[0]["u2"] != rows[0]["u3"]
    # null key still yields a draw distinct from the same tuple sans null
    d2 = spark.createDataFrame([(1, 2), (1, None)], "a int, b int")
    got = d2.select(rng.uniform(["a", "b"], seed=7, stream="md5").alias("u")).collect()
    assert got[0]["u"] != got[1]["u"]


def test_md5_stream_non_null_draws_unchanged(spark):
    # the coalesce must not move any draw for non-null keys: pin one
    # value produced by the pre-fix rendering (md5 over "3<US>11:u")
    import hashlib

    df = spark.createDataFrame([(3,)], "k int")
    got = df.select(rng.uniform(["k"], seed=11, stream="md5").alias("u")).collect()[0]["u"]
    h = int(hashlib.md5("3\x1f11:u".encode()).hexdigest()[:15], 16)
    expect = ((h & ((1 << 53) - 1)) + 0.5) / float(1 << 53)
    assert got == pytest.approx(expect, abs=0.0)


def test_bloom_probe_param_mismatch_raises(spark):
    from data_integration_est_spark.ops.bloom import bloom_build, bloom_contains

    df = spark.createDataFrame([(i, f"w{i}") for i in range(20)], "id int, w string")
    filt = bloom_build(df, "w", n_bits=1 << 10, n_hashes=3)
    with pytest.raises(ValueError, match="built with"):
        bloom_contains(df, "w", filt, n_bits=1 << 11, n_hashes=3, id_col="id")
    with pytest.raises(ValueError, match="built with"):
        bloom_contains(df, "w", filt, n_bits=1 << 10, n_hashes=4, id_col="id")


def test_bloom_unstamped_table_warns_but_probes(spark):
    from data_integration_est_spark.ops.bloom import bloom_build, bloom_contains

    df = spark.createDataFrame([(i, f"w{i}") for i in range(20)], "id int, w string")
    filt = bloom_build(df, "w", n_bits=1 << 10, n_hashes=3)
    # rebuild the table without metadata (simulates a pre-r11 persisted
    # or hand-built table of unknown layout)
    bare = spark.createDataFrame(filt.collect(), "word_idx bigint, word bigint")
    with pytest.warns(UserWarning, match="UNSTAMPED"):
        out = bloom_contains(df, "w", bare, n_bits=1 << 10, n_hashes=3, id_col="id")
    assert out.filter(F.col("might_contain")).count() == 20


def test_cms_probe_param_mismatch_raises(spark):
    from data_integration_est_spark.ops.cms import cms_build, cms_query

    df = spark.createDataFrame([(i, f"t{i % 5}") for i in range(30)], "id int, t string")
    sk = cms_build(df, "t", depth=3, width=64)
    with pytest.raises(ValueError, match="built with"):
        cms_query(df, "t", sk, depth=3, width=128, id_col="id")


def test_stamped_probe_is_silent(spark):
    from data_integration_est_spark.ops.bloom import bloom_build, bloom_contains

    df = spark.createDataFrame([(i, f"w{i}") for i in range(10)], "id int, w string")
    filt = bloom_build(df, "w", n_bits=1 << 10, n_hashes=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = bloom_contains(df, "w", filt, n_bits=1 << 10, n_hashes=3, id_col="id")
        assert out.filter(F.col("might_contain")).count() == 10


def test_clw_grouped_rejects_zero_iterations(spark):
    from data_integration_est_spark.estimators.vectorized import clw_grouped

    df = spark.createDataFrame(
        [(1, float(i), 1.0 * (i % 3 == 0), i % 2, (i + 1) % 2) for i in range(40)],
        "g int, y double, x double, a int, b int",
    )
    with pytest.raises(ValueError, match="n_iter"):
        clw_grouped(df, "y", ["x"], "a", "b", ["g"], n_iter=0)


def test_ngram_jaccard_refuses_quadratic_blowup(spark):
    """r11 verdict #2: a 100%-duplicated corpus collapses every doc into
    one blocking cell — the blocked join goes quadratic and must refuse
    above ``max_pairs`` instead of hanging (the sf1 run burned a
    20-minute cap on 16M pairs)."""
    from data_integration_est_spark.ops import dedup as dd

    docs = spark.createDataFrame(
        [(i, "the same exact duplicated text again and again") for i in range(200)],
        "doc_id int, text string",
    )
    # all-pairs path: 200*199/2 = 19900 pairs > cap
    with pytest.raises(ValueError, match="candidate pairs > max_pairs"):
        dd.ngram_jaccard_pairs(docs, threshold=0.1, max_pairs=10_000)
    # candidate path: one cell -> same quadratic volume, same refusal
    a = docs.select(F.col("doc_id").alias("id_a"))
    cand = a.join(
        docs.select(F.col("doc_id").alias("id_b")), F.col("id_a") < F.col("id_b")
    )
    with pytest.raises(ValueError, match="candidate pairs > max_pairs"):
        dd.ngram_jaccard_pairs(docs, candidates=cand, threshold=0.1, max_pairs=10_000)
    # under the cap (or disabled) it still verifies
    small = docs.filter(F.col("doc_id") < 20)
    out = dd.ngram_jaccard_pairs(small, threshold=0.1, max_pairs=10_000)
    assert out.count() == 19 * 20 // 2
    out2 = dd.ngram_jaccard_pairs(small, threshold=0.1, max_pairs=None)
    assert out2.count() == 19 * 20 // 2


def test_bounded_persist_evicts_oldest(spark):
    """r12: builders that return lazy results route their persists
    through the session-bounded registry — a long multi-query session
    must not accumulate unbounded cache blocks (the 45th row of an sf1
    window run hung on a 19-second query before this)."""
    from data_integration_est_spark import util

    start = len(util._LIVE_PERSISTS)
    frames = []
    for i in range(util._MAX_LIVE_PERSISTS + 3):
        df = spark.range(10 + i)
        frames.append(util.bounded_persist(df))
        frames[-1].count()
    assert len(util._LIVE_PERSISTS) <= util._MAX_LIVE_PERSISTS
    # the newest frame is still cached; the oldest was evicted
    assert frames[-1].storageLevel.useMemory
    assert not frames[0].storageLevel.useMemory
    # evicted frames still compute correctly (recompute path)
    assert frames[0].count() == 10
    # cleanup so other tests see a quiet registry
    while len(util._LIVE_PERSISTS) > start:
        util._LIVE_PERSISTS.pop()[1].unpersist()
