"""Randomized replays of the r10 operators against from-scratch python
references: portable Bloom membership, Count-Min frequencies, DSIR
weights + Gumbel races — random values, random shapes, the invariants
that must survive any draw (no false negatives, never undercount, merge
laws, deterministic races)."""

import hashlib
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _h60(v, lo=0, hi=15):
    hx = hashlib.md5(str(v).encode()).hexdigest()
    return int(hx[lo:hi], 16)


def _h2(v):
    hx = hashlib.md5(str(v).encode()).hexdigest()
    return int(hx[0:15], 16), int(hx[16:31], 16)


def test_bloom_fuzz_membership_exact_vs_python(spark):
    """Random member/probe draws at several (m, k): membership flags
    equal the from-scratch python filter BIT-FOR-BIT (not just no
    false negatives — the same false positives too)."""
    from data_integration_est_spark.ops.bloom import bloom_build, bloom_contains

    rng = random.Random(101)
    for m, k in [(512, 2), (2048, 3), (4096, 7)]:
        members = sorted({rng.randint(0, 10_000) for _ in range(150)})
        probes = sorted({rng.randint(0, 10_000) for _ in range(400)})
        bits = set()
        for v in members:
            h1, h2 = _h2(v)
            base, stride = h1 % m, 1 + 2 * (h2 % (m // 2))
            bits.update((base + i * stride) % m for i in range(k))

        def py_might(v):
            h1, h2 = _h2(v)
            base, stride = h1 % m, 1 + 2 * (h2 % (m // 2))
            return all((base + i * stride) % m in bits for i in range(k))

        bl = bloom_build(
            spark.createDataFrame([(v,) for v in members], "v long"),
            "v", m, k,
        )
        got = {
            r["v"]: r["might_contain"]
            for r in bloom_contains(
                spark.createDataFrame([(v,) for v in probes], "v long"),
                "v", bl, m, k, id_col="v",
            ).collect()
        }
        assert got == {v: py_might(v) for v in probes}, (m, k)
        assert all(got[v] for v in probes if v in set(members))


def test_cms_fuzz_counts_exact_vs_python(spark):
    """Random weighted multisets at several (d, w): every probe equals
    the python CMS exactly (same counters, same min), and never
    undercounts the true weighted frequency."""
    from data_integration_est_spark.ops.cms import cms_build, cms_query

    rng = random.Random(202)
    for d, w in [(2, 64), (4, 256), (6, 1024)]:
        items = [rng.randint(0, 50) for _ in range(600)]
        counters = {}
        for v in items:
            h1, h2 = _h2(v)
            base, stride = h1 % w, 1 + 2 * (h2 % (w // 2))
            for j in range(d):
                key = (j, (base + j * stride) % w)
                counters[key] = counters.get(key, 0) + 1

        def py_est(v):
            h1, h2 = _h2(v)
            base, stride = h1 % w, 1 + 2 * (h2 % (w // 2))
            return min(
                counters.get((j, (base + j * stride) % w), 0)
                for j in range(d)
            )

        sk = cms_build(
            spark.createDataFrame([(v,) for v in items], "v long"),
            "v", d, w,
        )
        true = Counter(items)
        probes = sorted(set(items))[:30] + [99_999]
        got = {
            r["v"]: r["cms_count"]
            for r in cms_query(
                spark.createDataFrame([(v,) for v in probes], "v long"),
                "v", sk, d, w, id_col="v",
            ).collect()
        }
        for v in probes:
            assert got[v] == float(py_est(v)), (d, w, v)
            assert got[v] >= true.get(v, 0)


def test_sketch_fuzz_merge_laws(spark):
    """Random 3-way splits: bloom_merge and cms_merge are associative
    and order-insensitive, and equal the single build over the union —
    the monoid law that makes per-shard sketches roll up at 100 TB."""
    from data_integration_est_spark.ops.bloom import bloom_build, bloom_merge
    from data_integration_est_spark.ops.cms import cms_build, cms_merge

    rng = random.Random(303)
    vals = [rng.randint(0, 3000) for _ in range(900)]
    parts = [vals[0::3], vals[1::3], vals[2::3]]
    dfs = [
        spark.createDataFrame([(v,) for v in p], "v long") for p in parts
    ]
    whole = spark.createDataFrame([(v,) for v in vals], "v long")

    def canon(df):
        return sorted(map(tuple, df.collect()))

    b = [bloom_build(d, "v", 1024, 3) for d in dfs]
    assert canon(bloom_merge(b[0], b[1], b[2])) == canon(
        bloom_merge(bloom_merge(b[2], b[0]), b[1])
    ) == canon(bloom_build(whole, "v", 1024, 3))

    c = [cms_build(d, "v", 3, 128) for d in dfs]
    assert canon(cms_merge(c[0], c[1], c[2])) == canon(
        cms_merge(cms_merge(c[2], c[0]), c[1])
    ) == canon(cms_build(whole, "v", 3, 128))


def test_dsir_fuzz_weights_and_race_vs_python(spark):
    """Random corpora from a small vocabulary: log weights match the
    from-scratch python model at 1e-10, and the Gumbel top-k selection
    equals the python race exactly at several k."""
    from data_integration_est_spark.ops.dsir import (
        dsir_importance_weights, dsir_resample,
    )

    rng = random.Random(404)
    vocab = [f"t{i}" for i in range(25)]
    B = 256
    raw = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        for i in range(60)
    }
    target = [
        " ".join(rng.choice(vocab[:8]) for _ in range(rng.randint(1, 10)))
        for _ in range(10)
    ]

    def feats(text):
        toks = [t for t in text.strip().lower().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    raw_m, tgt_m, doc_c = {}, {}, {}
    for did, t in raw.items():
        c = {}
        for f in feats(t):
            b = _h60(f) % B
            c[b] = c.get(b, 0) + 1
            raw_m[b] = raw_m.get(b, 0) + 1
        if c:
            doc_c[did] = c
    for t in target:
        for f in feats(t):
            b = _h60(f) % B
            tgt_m[b] = tgt_m.get(b, 0) + 1
    tt, tr = sum(tgt_m.values()), sum(raw_m.values())
    py_w = {
        did: sum(
            n * (math.log((tgt_m.get(b, 0) + 1.0) / (tt + B))
                 - math.log((raw_m.get(b, 0) + 1.0) / (tr + B)))
            for b, n in c.items()
        )
        for did, c in doc_c.items()
    }

    raw_df = spark.createDataFrame(
        list(raw.items()), "doc_id int, text string"
    )
    tgt_df = spark.createDataFrame([(t,) for t in target], "text string")
    w = dsir_importance_weights(raw_df, tgt_df, "text", "doc_id", B)
    got = {r["doc_id"]: r["log_w"] for r in w.collect()}
    assert set(got) == set(py_w)
    for did in py_w:
        assert got[did] == pytest.approx(py_w[did], rel=1e-10, abs=1e-10)

    def py_key(did):
        u = (_h60(did) + 0.5) / float(1 << 60)
        return py_w[did] - math.log(-math.log(u))

    ranked = sorted(py_w, key=lambda d: (-py_key(d), d))
    for k in (1, 7, 23):
        sel = {r["doc_id"] for r in dsir_resample(w, k, "doc_id").collect()}
        assert sel == set(ranked[:k]), k
