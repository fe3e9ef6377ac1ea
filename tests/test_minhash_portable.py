"""Portable (md5-stream) MinHash — pinned against a from-scratch
hashlib replay, the banding collision guarantee, and agreement with the
xxhash64 production path's Jaccard behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.dedup import (
    minhash_signatures,
    minhash_signatures_portable,
    word_shingles,
)

K = 16
M = 1 << 48

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),          # exact dup
    (3, "the quick brown fox leaps over the lazy dog"),          # near dup
    (4, "completely different content about spark physical plans"),
    (5, "hi"),                                                   # < n tokens
    (6, ""),                                                     # empty
]


def _py_sig(text: str) -> list[int]:
    toks = text.strip().split()
    if len(toks) >= 3:
        grams = sorted({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)})
    else:
        grams = [text.strip()]
    sig = []
    for i in range(K):
        best = None
        for g in grams:
            hx = hashlib.md5(g.encode()).hexdigest()
            h1, h2 = int(hx[0:12], 16), int(hx[16:28], 16)
            v = (h1 + i * h2) % M
            best = v if best is None else min(best, v)
        sig.append(best)
    return sig


def test_signatures_match_hashlib_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures_portable(df, num_hashes=K).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_sig(text), doc_id


def test_banding_collision_guarantee(spark):
    """Exact duplicates share EVERY band bucket; the near-dup shares
    some (high Jaccard) and the unrelated doc's signature differs."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sigs = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures_portable(df, num_hashes=K).collect()
    }
    assert sigs[1] == sigs[2]
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert agree_near > agree_far
    assert agree_far == 0


def test_portable_tracks_production_jaccard_estimate(spark):
    """Both streams estimate the SAME Jaccard (different hash families,
    same estimator): slot-agreement fractions within 3/16 of each other
    on the near-dup pair."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    port = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures_portable(df, num_hashes=K).collect()
    }
    prod = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures(df, num_hashes=K).collect()
    }
    ap = sum(a == b for a, b in zip(port[1], port[3])) / K
    ax = sum(a == b for a, b in zip(prod[1], prod[3])) / K
    assert abs(ap - ax) <= 3 / K


def test_num_hashes_guard(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_signatures_portable(df, num_hashes=65)


def test_shingle_fallback_consistency(spark):
    """Docs shorter than the shingle width hash their whole trimmed
    text — same convention as word_shingles (pinned so the SQL oracle's
    CASE branch stays in lockstep)."""
    df = spark.createDataFrame([(5, "hi"), (6, "")],
                               "doc_id long, text string")
    sh = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", word_shingles(F.col("text")).alias("s")
        ).collect()
    }
    assert sh[5] == ["hi"] and sh[6] == [""]


class TestSimhashPortable:
    def test_matches_hashlib_replay(self, spark):
        from data_integration_est_spark.ops.dedup import simhash_portable

        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash_portable(df).collect()
        }
        for doc_id, text in DOCS:
            toks = text.strip().split() if text.strip() else [""]
            votes = [0] * 48
            for t in toks:
                h = int(hashlib.md5(t.encode()).hexdigest()[0:12], 16)
                for b in range(48):
                    votes[b] += 1 if (h >> b) & 1 else -1
            want = sum(1 << b for b in range(48) if votes[b] > 0)
            assert got[doc_id] == want, (doc_id, text)
        # identical docs -> identical fingerprints; near-dups are close
        # in Hamming distance, unrelated docs are farther
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        assert got[1] == got[2]
        assert ham(got[1], got[3]) < ham(got[1], got[4])

    def test_n_bits_guard(self, spark):
        from data_integration_est_spark.ops.dedup import simhash_portable

        df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
        with pytest.raises(ValueError):
            simhash_portable(df, n_bits=64)


class TestHyperplaneLshPortable:
    def test_buckets_match_hashlib_replay(self, spark):
        """Portable Rademacher-plane buckets equal the from-scratch
        python computation (planes from md5 of 'hp:{t}:{i}:{d}', bit =
        dot >= 0), and identical vectors land in identical buckets."""
        import numpy as np

        from data_integration_est_spark.ops.similarity import (
            hyperplanes_portable,
            lsh_bucket_candidates_portable,
        )

        rng = np.random.RandomState(7)
        dim, nb, nt = 8, 4, 2
        vecs = [(i, [float(x) for x in rng.randn(dim)]) for i in range(30)]
        vecs.append((30, list(vecs[0][1])))  # exact dup of vec 0
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_bucket_candidates_portable(
                df, dim=dim, n_bits=nb, n_tables=nt
            ).collect()
        }
        # python replay
        buckets = {}
        for t in range(nt):
            planes = hyperplanes_portable(dim, nb, t)
            for vid, v in vecs:
                b = sum(
                    1 << i
                    for i in range(nb)
                    if sum(p * x for p, x in zip(planes[i], v)) >= 0
                )
                buckets.setdefault((t, b), []).append(vid)
        want = set()
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    want.add((ids[i], ids[j]))
        assert got == want
        assert (0, 30) in got  # identical vectors always collide

    def test_planes_are_rademacher(self, spark):
        from data_integration_est_spark.ops.similarity import (
            hyperplanes_portable,
        )

        planes = hyperplanes_portable(16, 4, 0)
        flat = [v for p in planes for v in p]
        assert set(flat) <= {1.0, -1.0}
        # a fixed hash stream: deterministic across calls
        assert planes == hyperplanes_portable(16, 4, 0)
        assert planes != hyperplanes_portable(16, 4, 1)
