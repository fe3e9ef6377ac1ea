"""Portable Bloom filter (`ops/bloom`) — contract and portability tests.

The contract: NEVER a false negative, false positives bounded near the
analytic rate, the word table mergeable (bit_or monoid), and every bit
reproducible from the md5 double-hash spec (a numpy replay recomputes
the whole word table from hashlib)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.bloom import (
    bloom_build,
    bloom_contains,
    bloom_fpr,
    bloom_merge,
    bloom_stats,
    optimal_n_hashes,
)

M, K = 4096, 3


def _np_words(values, n_bits=M, n_hashes=K):
    """From-scratch hashlib replay of the word table."""
    words: dict[int, int] = {}
    for v in values:
        hx = hashlib.md5(str(v).encode()).hexdigest()
        h1 = int(hx[0:15], 16)
        h2 = int(hx[16:31], 16)
        base, stride = h1 % n_bits, 1 + 2 * (h2 % (n_bits // 2))
        for i in range(n_hashes):
            pos = (base + i * stride) % n_bits
            words[pos >> 5] = words.get(pos >> 5, 0) | (1 << (pos % 32))
    return words


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 3000).select(
        (F.col("id") * 7 + 13).alias("v")
    )


class TestBuild:
    def test_word_table_matches_hashlib_replay(self, spark, ids):
        members = ids.filter(F.col("v") % 5 == 3)
        got = {
            r["word_idx"]: r["word"]
            for r in bloom_build(members, "v", M, K).collect()
        }
        vals = [r["v"] for r in members.collect()]
        assert got == _np_words(vals)

    def test_nulls_skipped(self, spark):
        df = spark.createDataFrame(
            [(1,), (None,), (2,)], "v int"
        )
        bl = bloom_build(df, "v", M, K)
        ref = bloom_build(df.dropna(), "v", M, K)
        assert sorted(map(tuple, bl.collect())) == sorted(
            map(tuple, ref.collect())
        )

    def test_param_validation(self, spark, ids):
        with pytest.raises(ValueError):
            bloom_build(ids, "v", n_bits=100, n_hashes=3)  # not a power of 2
        with pytest.raises(ValueError):
            bloom_build(ids, "v", n_bits=4096, n_hashes=0)


class TestMembership:
    def test_no_false_negatives_and_bounded_fpr(self, spark, ids):
        members = ids.filter(F.col("v") % 7 == 2)
        n = members.count()
        bl = bloom_build(members, "v", M, K)
        probed = bloom_contains(
            ids.withColumn("is_m", F.col("v") % 7 == 2),
            "v", bl, M, K, id_col="v",
        )
        agg = probed.agg(
            F.sum((F.col("is_m") & ~F.col("might_contain")).cast("int"))
            .alias("fn"),
            F.sum((~F.col("is_m") & F.col("might_contain")).cast("int"))
            .alias("fp"),
            F.sum((~F.col("is_m")).cast("int")).alias("neg"),
        ).collect()[0]
        assert agg["fn"] == 0
        expect = bloom_fpr(n, M, K)
        # generous: 4x the analytic rate + small-count slack
        assert agg["fp"] <= max(6, 4 * expect * agg["neg"])

    def test_null_probe_is_false(self, spark):
        members = spark.createDataFrame([(1,)], "v int")
        bl = bloom_build(members, "v", M, K)
        df = spark.createDataFrame(
            [(10, None), (11, 1)], "rid int, v int"
        )
        rows = {
            r["rid"]: r["might_contain"]
            for r in bloom_contains(df, "v", bl, M, K, id_col="rid").collect()
        }
        assert rows == {10: False, 11: True}


class TestMergeAndStats:
    def test_merge_equals_union_build(self, spark, ids):
        a = ids.filter(F.col("v") % 3 == 0)
        b = ids.filter(F.col("v") % 3 == 1)
        merged = bloom_merge(
            bloom_build(a, "v", M, K), bloom_build(b, "v", M, K)
        )
        direct = bloom_build(a.unionByName(b), "v", M, K)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_stats_cardinality_estimate(self, spark, ids):
        members = ids.limit(500)
        bl = bloom_build(members, "v", 1 << 16, 5)
        st = bloom_stats(bl, 1 << 16, 5).collect()[0]
        assert st["bits_set"] <= 5 * 500
        assert st["n_estimate"] == pytest.approx(500, rel=0.05)
        assert 0.0 < st["fill_fraction"] < 0.05

    def test_fpr_math(self):
        assert bloom_fpr(0, M, K) == 0.0
        # k=1, n=m*ln2 -> fpr = 1-e^{-ln2} = 0.5
        assert bloom_fpr(int(M * math.log(2)), M, 1) == pytest.approx(
            0.5, abs=0.01
        )
        assert optimal_n_hashes(M, 0) == 1
        assert optimal_n_hashes(4096, 410) == round(
            4096 / 410 * math.log(2)
        )


class TestPlan:
    def test_probe_plan_broadcasts_filter(self, spark, ids):
        members = ids.limit(100)
        bl = bloom_build(members, "v", M, K)
        plan = bloom_contains(
            ids, "v", bl, M, K, id_col="v"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestBloomDecontam:
    """bloom_contamination_flags vs the exact array-intersect variant:
    superset always, equal at generous m."""

    def _frames(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bench = docs.filter(F.col("doc_id") % 17 == 3).select(
            "doc_id", "text"
        )
        return docs, bench

    def test_superset_and_equal_at_generous_m(self, spark, sf_dir):
        from data_integration_est_spark.ops.decontam import (
            bloom_contamination_flags, contamination_flags,
        )

        docs, bench = self._frames(spark, sf_dir)
        exact = contamination_flags(docs, bench, n=5, exact=True).select(
            "doc_id", "n_grams", "n_hits", "contaminated"
        )
        bl = bloom_contamination_flags(
            docs, bench, n=5, n_bits=1 << 22, n_hashes=5
        ).select("doc_id", "n_grams", "n_hits", "contaminated")
        e = {r["doc_id"]: r for r in exact.collect()}
        b = {r["doc_id"]: r for r in bl.collect()}
        assert set(e) == set(b)
        for did, er in e.items():
            br = b[did]
            assert br["n_grams"] == er["n_grams"]
            # one-sided error: bloom hits >= exact hits, never fewer
            assert br["n_hits"] >= er["n_hits"]
            assert br["contaminated"] >= er["contaminated"]
        # at m = 2^22 over a tiny benchmark the fpr is ~0: exact equality
        assert sum(b[d]["n_hits"] for d in b) == sum(
            e[d]["n_hits"] for d in e
        )

    def test_benchmark_docs_flag_themselves(self, spark, sf_dir):
        from data_integration_est_spark.ops.decontam import (
            bloom_contamination_flags,
        )

        docs, bench = self._frames(spark, sf_dir)
        flagged = {
            r["doc_id"]
            for r in bloom_contamination_flags(docs, bench)
            .filter("contaminated = 1").select("doc_id").collect()
        }
        assert {r["doc_id"] for r in bench.collect()} <= flagged


class TestGroupedProbe:
    def test_grouped_filter_probes_as_union_no_false_negatives(self, spark):
        """r10 review fix: a group-built word table has duplicate
        word_idx rows; without the bit_or pre-fold a member present in
        SEVERAL groups over-counted matched bits and probed FALSE."""
        df = spark.createDataFrame(
            [(1, "g1"), (1, "g2"), (2, "g1"), (3, "g2")], "v int, g string"
        )
        bl = bloom_build(df, "v", M, K, group_cols=["g"])
        probe = spark.createDataFrame(
            [(1,), (2,), (3,)], "v int"
        ).withColumn("rid", F.col("v"))
        got = {
            r["v"]: r["might_contain"]
            for r in bloom_contains(probe, "v", bl, M, K,
                                    id_col="rid").collect()
        }
        assert got == {1: True, 2: True, 3: True}

    def test_grouped_probe_per_group(self, spark):
        """group_cols probes each row against its OWN group's words;
        a group the filter never saw probes false."""
        df = spark.createDataFrame(
            [(1, "g1"), (1, "g2"), (2, "g1"), (3, "g2")], "v int, g string"
        )
        bl = bloom_build(df, "v", M, K, group_cols=["g"])
        probe = spark.createDataFrame(
            [(10, 1, "g1"), (11, 1, "g2"), (12, 2, "g2"),
             (13, 3, "g1"), (14, 2, "g9")],
            "rid int, v int, g string",
        )
        got = {
            r["rid"]: r["might_contain"]
            for r in bloom_contains(
                probe, "v", bl, M, K, id_col="rid", group_cols=["g"]
            ).collect()
        }
        # 2 only in g1, 3 only in g2; unseen group g9 is false
        assert got[10] and got[11] and not got[12] and not got[13]
        assert not got[14]


def test_merge_mismatched_params_raises(spark, ids):
    """r11: (m, k) ride the word table as schema metadata — merging
    filters with different layouts raises at plan time instead of
    OR-folding incompatible bit arrays."""
    a = bloom_build(ids, "v", 4096, 3)
    b = bloom_build(ids, "v", 8192, 3)
    c = bloom_build(ids, "v", 4096, 5)
    with pytest.raises(ValueError, match="mismatched"):
        bloom_merge(a, b)
    with pytest.raises(ValueError, match="mismatched"):
        bloom_merge(a, c)
    # like-parameterized merges and hand-built tables stay accepted
    assert bloom_merge(a, bloom_build(ids, "v", 4096, 3)).count() > 0
    plain = spark.createDataFrame([(0, 1)], "word_idx long, word long")
    assert bloom_merge(a, plain).count() > 0
