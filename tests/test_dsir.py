"""DSIR importance resampling (`ops/dsir`) — from-scratch numpy oracle
for the hashed-ngram weights, plus the Gumbel top-k contract."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.dsir import (
    dsir_importance_weights,
    dsir_resample,
    hashed_ngram_features,
)

B = 512


def _feats(text: str) -> list[str]:
    toks = [t for t in text.strip().lower().split() if t]
    # whitespace regex split on the trimmed string == str.split() here
    return toks + [
        f"{a} {b}" for a, b in zip(toks, toks[1:])
    ]


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:15], 16) % B


def _np_logw(raw: dict[int, str], target: list[str], alpha=1.0):
    """From-scratch replay: per-doc hashed counts, corpus models,
    log-ratio weights."""
    doc_counts: dict[int, dict[int, int]] = {}
    raw_m: dict[int, int] = {}
    for did, text in raw.items():
        c: dict[int, int] = {}
        for f in _feats(text):
            b = _bucket(f)
            c[b] = c.get(b, 0) + 1
            raw_m[b] = raw_m.get(b, 0) + 1
        if c:
            doc_counts[did] = c
    tgt_m: dict[int, int] = {}
    for text in target:
        for f in _feats(text):
            b = _bucket(f)
            tgt_m[b] = tgt_m.get(b, 0) + 1
    tt, tr = sum(tgt_m.values()), sum(raw_m.values())
    out = {}
    for did, c in doc_counts.items():
        lw = 0.0
        for b, n in c.items():
            lw += n * (
                math.log((tgt_m.get(b, 0) + alpha) / (tt + alpha * B))
                - math.log((raw_m.get(b, 0) + alpha) / (tr + alpha * B))
            )
        out[did] = (sum(c.values()), lw)
    return out


RAW = {
    1: "the cat sat on the mat",
    2: "stock market rally boosts tech shares",
    3: "the dog sat on the log",
    4: "quantum entanglement in photonic lattices",
    5: "cat and dog play on the mat",
    6: "",
    7: "earnings report beats market expectations",
}
TARGET = [
    "the cat and the dog",
    "a cat sat on a mat",
    "the dog chased the cat",
]


class TestWeights:
    def test_matches_hashlib_replay(self, spark):
        raw_df = spark.createDataFrame(
            list(RAW.items()), "doc_id int, text string"
        )
        tgt_df = spark.createDataFrame(
            [(t,) for t in TARGET], "text string"
        )
        got = {
            r["doc_id"]: (r["n_feats"], r["log_w"])
            for r in dsir_importance_weights(
                raw_df, tgt_df, "text", "doc_id", B
            ).collect()
        }
        want = _np_logw(RAW, TARGET)
        assert set(got) == set(want)  # doc 6 (empty) absent from both
        for did, (nf, lw) in want.items():
            assert got[did][0] == nf
            assert got[did][1] == pytest.approx(lw, rel=1e-12)

    def test_target_like_docs_outweigh(self, spark):
        raw_df = spark.createDataFrame(
            list(RAW.items()), "doc_id int, text string"
        )
        tgt_df = spark.createDataFrame([(t,) for t in TARGET], "text string")
        w = {
            r["doc_id"]: r["log_w"]
            for r in dsir_importance_weights(
                raw_df, tgt_df, "text", "doc_id", B
            ).collect()
        }
        # the most target-like doc (cat/mat unigrams AND bigrams) beats
        # the finance/physics docs; the dog/log variant beats finance.
        # (NOT a full ordering: at B=512 with a 3-sentence target,
        # hash collisions + add-1 smoothing legitimately reshuffle the
        # mid-field — doc 7's rare tokens land in lightly-loaded raw
        # buckets, which the likelihood ratio rewards.)
        assert w[1] > max(w[2], w[4], w[7])
        assert w[3] > w[2] and w[5] > w[2]

    def test_features_single_token_doc(self, spark):
        df = spark.createDataFrame([(1, "hello")], "doc_id int, text string")
        rows = hashed_ngram_features(df, "text", "doc_id", B).collect()
        assert len(rows) == 1 and rows[0]["c"] == 1

    def test_bucket_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        with pytest.raises(ValueError):
            hashed_ngram_features(df, "text", "doc_id", n_buckets=8)


class TestResample:
    def _weights(self, spark):
        raw_df = spark.createDataFrame(
            list(RAW.items()), "doc_id int, text string"
        )
        tgt_df = spark.createDataFrame([(t,) for t in TARGET], "text string")
        return dsir_importance_weights(raw_df, tgt_df, "text", "doc_id", B)

    def test_k_geq_n_selects_all(self, spark):
        w = self._weights(spark)
        assert dsir_resample(w, 100, "doc_id").count() == w.count()

    def test_deterministic_and_salt_varies(self, spark):
        w = self._weights(spark)
        s1 = {r["doc_id"] for r in dsir_resample(w, 3, "doc_id").collect()}
        s2 = {r["doc_id"] for r in dsir_resample(w, 3, "doc_id").collect()}
        assert s1 == s2
        salted = {
            frozenset(
                r["doc_id"]
                for r in dsir_resample(w, 3, "doc_id", salt=s).collect()
            )
            for s in ["", "a", "b", "c", "d"]
        }
        assert len(salted) > 1  # the salt actually reseeds the race

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            dsir_resample(self._weights(spark), 0, "doc_id")

    def test_topk_plan_has_no_global_sort(self, spark):
        w = self._weights(spark)
        plan = (
            dsir_resample(w, 3, "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestResampleBy:
    def _weights_with_group(self, spark):
        raw_df = spark.createDataFrame(
            [(i, t, g) for (i, t), g in zip(
                RAW.items(), ["a", "b", "a", "b", "a", "a", "b"]
            )],
            "doc_id int, text string, grp string",
        )
        tgt_df = spark.createDataFrame([(t,) for t in TARGET], "text string")
        w = dsir_importance_weights(raw_df, tgt_df, "text", "doc_id", B)
        return w.join(raw_df.select("doc_id", "grp"), "doc_id")

    def test_per_group_equals_independent_races(self, spark):
        from data_integration_est_spark.ops.dsir import dsir_resample_by

        w = self._weights_with_group(spark)
        by = {
            (r["grp"], r["doc_id"])
            for r in dsir_resample_by(w, 2, "grp").collect()
        }
        # the same race run per group with the global operator
        want = set()
        for g in ["a", "b"]:
            for r in dsir_resample(w.filter(F.col("grp") == g), 2).collect():
                want.add((g, r["doc_id"]))
        assert by == want
        # quota respected per group
        from collections import Counter
        cnt = Counter(g for g, _ in by)
        assert all(v <= 2 for v in cnt.values())

    def test_group_limit_plan(self, spark):
        from data_integration_est_spark.ops.dsir import dsir_resample_by

        w = self._weights_with_group(spark)
        plan = (
            dsir_resample_by(w, 2, "grp")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan


class TestValidation:
    def test_empty_target_raises_loudly(self, spark):
        """r10: a featureless target would make every log ratio the
        same smoothing constant — the selection degenerates to a
        uniform shuffle, so the engine refuses loudly instead."""
        raw_df = spark.createDataFrame(
            list(RAW.items()), "doc_id int, text string"
        )
        for tgt in [[], [("",)], [("   ",)]]:
            tgt_df = spark.createDataFrame(tgt, "text string")
            with pytest.raises(ValueError, match="no features"):
                dsir_importance_weights(raw_df, tgt_df, "text", "doc_id", B)
