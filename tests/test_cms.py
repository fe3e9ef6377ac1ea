"""Portable Count-Min sketch (`ops/cms`) — contract tests: estimates
never undercount, exact at generous width, mergeable by addition, and
every counter reproducible from the md5 double-hash spec (hashlib
replay)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.cms import (
    cms_build,
    cms_merge,
    cms_params,
    cms_query,
)

D, W = 4, 512


def _np_counters(values, depth=D, width=W, weights=None):
    counters: dict[tuple[int, int], float] = {}
    for n, v in enumerate(values):
        hx = hashlib.md5(str(v).encode()).hexdigest()
        h1 = int(hx[0:15], 16)
        h2 = int(hx[16:31], 16)
        base, stride = h1 % width, 1 + 2 * (h2 % (width // 2))
        wgt = 1.0 if weights is None else weights[n]
        for j in range(depth):
            key = (j, (base + j * stride) % width)
            counters[key] = counters.get(key, 0.0) + wgt
    return counters


@pytest.fixture(scope="module")
def zipf(spark):
    # value v appears ~ 3000/v times: a heavy head over a long tail
    return spark.range(0, 3000).select(
        (F.floor(3000 / (F.col("id") + 1))).alias("v")
    )


class TestBuild:
    def test_counters_match_hashlib_replay(self, spark, zipf):
        got = {
            (r["j"], r["idx"]): r["cnt"]
            for r in cms_build(zipf, "v", D, W).collect()
        }
        vals = [r["v"] for r in zipf.collect()]
        assert got == _np_counters(vals)

    def test_weighted_build(self, spark):
        df = spark.createDataFrame(
            [("a", 2.5), ("a", 1.5), ("b", 3.0)], "v string, w double"
        )
        sk = cms_build(df, "v", D, W, weight_col="w")
        out = cms_query(
            spark.createDataFrame([(1, "a"), (2, "b")], "rid int, v string"),
            "v", sk, D, W, id_col="rid",
        )
        got = {r["rid"]: r["cms_count"] for r in out.collect()}
        assert got[1] >= 4.0 and got[2] >= 3.0
        # width 512 over 2 distinct values: no collision, exact
        assert got == {1: 4.0, 2: 3.0}

    def test_param_validation(self, spark, zipf):
        with pytest.raises(ValueError):
            cms_build(zipf, "v", depth=0, width=W)
        with pytest.raises(ValueError):
            cms_build(zipf, "v", depth=4, width=8)
        with pytest.raises(ValueError):
            cms_params(0.0, 0.1)


class TestQuery:
    def test_never_undercounts_and_tight_at_width(self, spark, zipf):
        sk = cms_build(zipf, "v", D, W)
        true = Counter(r["v"] for r in zipf.collect())
        items = spark.createDataFrame(
            [(int(v),) for v in true], "v long"
        ).withColumn("rid", F.col("v"))
        got = {
            r["v"]: r["cms_count"]
            for r in cms_query(items, "v", sk, D, W, id_col="rid").collect()
        }
        n = sum(true.values())
        overs = []
        for v, c in true.items():
            assert got[v] >= c  # the one-sided CMS guarantee
            overs.append(got[v] - c)
        # eps = e/W: the standard bound holds with big margin on average
        assert sum(overs) / len(overs) <= math.e / W * n

    def test_unseen_and_null(self, spark, zipf):
        sk = cms_build(zipf, "v", D, W)
        df = spark.createDataFrame(
            [(1, 999_999), (2, None)], "rid int, v long"
        )
        got = {
            r["rid"]: r["cms_count"]
            for r in cms_query(df, "v", sk, D, W, id_col="rid").collect()
        }
        assert got[2] == 0.0
        assert got[1] >= 0.0  # unseen may false-hit but never negative


class TestMerge:
    def test_merge_equals_union_build(self, spark, zipf):
        a = zipf.filter(F.col("v") % 2 == 0)
        b = zipf.filter(F.col("v") % 2 == 1)
        merged = cms_merge(
            cms_build(a, "v", D, W), cms_build(b, "v", D, W)
        )
        direct = cms_build(zipf, "v", D, W)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_params_math(self):
        d, w = cms_params(0.01, 0.05)
        assert d == math.ceil(math.log(20)) and w == math.ceil(math.e / 0.01)


class TestPlan:
    def test_query_broadcasts_sketch(self, spark, zipf):
        sk = cms_build(zipf, "v", D, W)
        plan = cms_query(
            zipf.withColumn("rid", F.col("v")), "v", sk, D, W, id_col="rid"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestGroupedProbe:
    def test_grouped_sketch_probes_as_total_never_undercounts(self, spark):
        """r10 review fix: a group-built sketch has duplicate (j, idx)
        rows; without the sum pre-fold the min ranged over every
        group's counters and silently undercounted (10+3 -> 3)."""
        rows = [("a", "g1")] * 10 + [("a", "g2")] * 3 + [("b", "g1")] * 5
        df = spark.createDataFrame(rows, "v string, g string")
        sk = cms_build(df, "v", D, W, group_cols=["g"])
        probe = spark.createDataFrame(
            [(1, "a"), (2, "b")], "rid int, v string"
        )
        got = {
            r["rid"]: r["cms_count"]
            for r in cms_query(probe, "v", sk, D, W, id_col="rid").collect()
        }
        assert got[1] >= 13.0 and got[2] >= 5.0
        assert got == {1: 13.0, 2: 5.0}  # no collisions at W=512

    def test_grouped_probe_per_group(self, spark):
        """group_cols probes each row against its OWN group's counters;
        unseen (item, group) pairs estimate 0."""
        rows = [("a", "g1")] * 10 + [("a", "g2")] * 3 + [("b", "g1")] * 5
        df = spark.createDataFrame(rows, "v string, g string")
        sk = cms_build(df, "v", D, W, group_cols=["g"])
        probe = spark.createDataFrame(
            [(1, "a", "g1"), (2, "a", "g2"), (3, "b", "g1"),
             (4, "b", "g2"), (5, "a", "g9")],
            "rid int, v string, g string",
        )
        got = {
            r["rid"]: r["cms_count"]
            for r in cms_query(
                probe, "v", sk, D, W, id_col="rid", group_cols=["g"]
            ).collect()
        }
        assert got == {1: 10.0, 2: 3.0, 3: 5.0, 4: 0.0, 5: 0.0}


def test_merge_mismatched_params_raises(spark, zipf):
    """r11: (d, w) ride the counter table as schema metadata — merging
    sketches with different layouts raises at plan time."""
    from data_integration_est_spark.ops.cms import cms_build, cms_merge

    a = cms_build(zipf, "v", depth=4, width=512)
    b = cms_build(zipf, "v", depth=4, width=1024)
    c = cms_build(zipf, "v", depth=2, width=512)
    with pytest.raises(ValueError, match="mismatched"):
        cms_merge(a, b)
    with pytest.raises(ValueError, match="mismatched"):
        cms_merge(a, c)
    assert cms_merge(a, cms_build(zipf, "v", depth=4, width=512)).count() > 0
