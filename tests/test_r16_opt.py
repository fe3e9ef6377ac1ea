"""Focused pins for the r16 OPTIMIZATION-round internal changes.

Every optimization this round was required to be result-identical; these
tests pin the specific internals that changed so a future edit cannot
silently drift them:

- the numpy-vectorized media synthesizers vs the original per-byte /
  per-sample Python loops (bit-exact, full small parameter grid),
- `_fit_irls`'s row-count partition sizing: identical 6-dp coefficients
  whether the input arrives single-partition or pre-spread (the sizing
  repartition must not leak into results),
- `pq_knn`'s materialized LUT frame: identical (query, neighbor, rank)
  sets regardless of the query frame's incoming partitioning,
- `dedup_corpus`: identical survivors with `assert_full_recall` on/off
  (the recall certification — and its persisted pair list — must be
  purely observational).
"""

from __future__ import annotations

import itertools
import struct

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops import media_dedup as md


def _ref_wav(group, variant, n=64, rate=8000):
    data = b"".join(
        struct.pack(
            "<h",
            ((group * 7 + i * 13) % 2001) - 1000
            + (50 * variant if i % 37 == 0 else 0),
        )
        for i in range(n)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _ref_ppm(group, variant, w=18, h=16):
    header = f"P6\n{w} {h}\n255\n".encode()
    n = w * h * 3
    return header + bytes(
        ((group * 37 + j) % 199 + (24 * variant if j % 97 == 0 else 0)) % 256
        for j in range(n)
    )


def test_synth_wav_bit_exact_vs_loop():
    for g, v in itertools.product(range(10), range(6)):
        assert md.synth_wav_variant(g, v) == _ref_wav(g, v)
    # non-default geometry + large params
    assert md.synth_wav_variant(123, 7, n=1000, rate=16000) == _ref_wav(
        123, 7, n=1000, rate=16000
    )


def test_synth_ppm_bit_exact_vs_loop():
    for g, v in itertools.product(range(10), range(6)):
        assert md.synth_ppm_variant(g, v) == _ref_ppm(g, v)
    assert md.synth_ppm_variant(999, 4, w=64, h=48) == _ref_ppm(
        999, 4, w=64, h=48
    )


@pytest.fixture(scope="module")
def spark():
    from data_integration_est_spark.session import get_spark

    s = get_spark(app_name="test_r16_opt")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _irls_frame(spark, n=40_000):
    # deterministic, non-separable logistic data on a SINGLE partition
    # (the shape that used to serialize every Newton pass)
    return (
        spark.range(n).coalesce(1)
        .select(
            F.col("id"),
            ((F.col("id") % 97) / 97.0).alias("f1"),
            ((F.col("id") % 31) / 31.0).alias("f2"),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)) / 1000.0
             < 0.3 + 0.4 * ((F.col("id") % 97) / 97.0))
            .cast("double").alias("y"),
        )
    )


def test_fit_irls_partition_sizing_is_result_stable(spark):
    from data_integration_est_spark.kernels.linalg import fit_logistic
    from data_integration_est_spark.util import spread

    base = _irls_frame(spark)
    f1 = fit_logistic(base, "y", ["f1", "f2"], intercept=True, max_iter=25)
    f2 = fit_logistic(
        spread(base), "y", ["f1", "f2"], intercept=True, max_iter=25
    )
    assert f1.converged and f2.converged
    b1 = [round(float(b), 6) for b in f1.coef_for(())]
    b2 = [round(float(b), 6) for b in f2.coef_for(())]
    assert b1 == b2


def test_pq_knn_lut_persist_partition_invariant(spark):
    import numpy as np

    from data_integration_est_spark.ops.pq import pq_knn, pq_train
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    rng = np.random.default_rng(12345)
    rows = [(int(i), [float(x) for x in rng.standard_normal(16)])
            for i in range(300)]
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), False),
    ])
    corpus = spark.createDataFrame(rows, schema)
    books = pq_train(corpus, m=4, k=8, n_iter=1)
    q1 = corpus.filter(F.col("vec_id") < 5).coalesce(1)
    q32 = corpus.filter(F.col("vec_id") < 5).repartition(8)
    r1 = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_knn(corpus, q1, books, k=10).collect()
    )
    r2 = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_knn(corpus, q32, books, k=10).collect()
    )
    assert r1 == r2 and len(r1) == 50


def test_dedup_corpus_assert_is_observational(spark):
    from data_integration_est_spark.ops.dedup import dedup_corpus

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup
        "the quick brown fox leaps over the lazy dog again and again",  # near dup
        "completely unrelated text about spark query optimization work",
        "another unrelated document mentioning parquet column pruning",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    kept_plain = sorted(
        r["doc_id"]
        for r in dedup_corpus(
            docs, threshold=0.5, assert_full_recall=False
        ).collect()
    )
    kept_assert = sorted(
        r["doc_id"]
        for r in dedup_corpus(
            docs, threshold=0.5, assert_full_recall=True
        ).collect()
    )
    assert kept_plain == kept_assert
    assert 0 in kept_plain and 1 not in kept_plain


def test_line_dedup_array_cut_contracts(spark):
    """r16 continuation: line_dedup's reassembly moved from a
    sort_array(collect_list) groupBy to an in-place array filter — pin
    the contracts the old explode shape gave for free: NULL-text docs
    are ABSENT, all-boilerplate docs survive with empty text, and both
    key paths agree after the rewrite."""
    from data_integration_est_spark.ops.dedup import line_dedup

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (0, f"{boiler}\nunique alpha\n\nkeep me"),
            (1, f"intro line\n{boiler}"),
            (2, boiler),          # all-boilerplate -> empty, present
            (3, None),            # NULL text -> absent
            (4, ""),              # empty text -> one empty line, kept
        ],
        "doc_id long, text string",
    )
    for hash_lines in (True, False):
        out = {
            r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_kept"])
            for r in line_dedup(docs, hash_lines=hash_lines).collect()
        }
        assert set(out) == {0, 1, 2, 4}, out
        assert out[0] == ("unique alpha\n\nkeep me", 4, 3)
        assert out[1] == ("intro line", 2, 1)
        assert out[2] == ("", 1, 0)
        assert out[4] == ("", 1, 1)


def test_span_dedup_array_cut_n_removed_is_span_mass(spark):
    """r16 continuation: duplicated_span_dedup counts removals as the
    per-doc span-length sum instead of per-token join flags — pin that
    the count still equals len(text) - len(kept) in tokens on a doc
    with two disjoint merged spans."""
    from data_integration_est_spark.ops.dedup import duplicated_span_dedup

    dup1 = "a b c d"
    dup2 = "w x y z"
    docs = spark.createDataFrame(
        [
            (0, f"{dup1} mid1 mid2 {dup2}"),
            (1, f"{dup1} other tokens here {dup2}"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_dedup(docs, min_len=4, hash_grams=False)
        .collect()
    }
    assert out[0]["text_dedup"] == "mid1 mid2"
    assert out[0]["n_tokens"] == 10 and out[0]["n_removed"] == 8
    assert out[1]["text_dedup"] == "other tokens here"
    assert out[1]["n_tokens"] == 11 and out[1]["n_removed"] == 8
    # NULL-text docs stay ABSENT (the pre-r16 posexplode contract,
    # matching line_dedup; ADVICE r16 — the array-cut LEFT join had
    # silently re-admitted them as all-NULL rows)
    assert 2 not in out
