"""Snapshot diff + SCD2 merge (``ops/scd``).

Oracle strategy: hand-enumerable snapshots pin every status, the
null-safe comparison semantics, the null_key surfacing, and the
gaps-and-islands interval algebra (including re-appearing values,
which must open a NEW interval — the classic SCD2 trap a naive
groupBy-on-attrs implementation gets wrong).
"""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.scd import scd2_merge, snapshot_diff


class TestSnapshotDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, None, "d")],
            ["k", "v", "s"],
        )
        new = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 21.0, "b"), (5, 50.0, "e"), (4, None, "d")],
            ["k", "v", "s"],
        )
        return old, new

    def test_statuses(self, spark):
        old, new = self._frames(spark)
        out = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
        assert out[1]["status"] == "unchanged"
        assert out[2]["status"] == "changed"
        assert out[2]["changed_cols"] == "v"
        assert out[3]["status"] == "removed"
        assert out[5]["status"] == "added"
        # null == null must compare equal (null-safe), not as a change
        assert out[4]["status"] == "unchanged"

    def test_multi_column_change_sorted(self, spark):
        old = spark.createDataFrame([(1, 1.0, "a")], ["k", "v", "s"])
        new = spark.createDataFrame([(1, 2.0, "z")], ["k", "v", "s"])
        out = snapshot_diff(old, new, ["k"]).collect()[0]
        assert out["changed_cols"] == "s,v"

    def test_null_to_value_is_change(self, spark):
        old = spark.createDataFrame([(1, None)], "k: int, v: double")
        new = spark.createDataFrame([(1, 5.0)], "k: int, v: double")
        out = snapshot_diff(old, new, ["k"]).collect()[0]
        assert out["status"] == "changed" and out["changed_cols"] == "v"

    def test_null_key_surfaced(self, spark):
        old = spark.createDataFrame([(None, 1.0)], "k: int, v: double")
        new = spark.createDataFrame([(None, 1.0)], "k: int, v: double")
        rows = snapshot_diff(old, new, ["k"]).collect()
        assert {r["status"] for r in rows} == {"null_key"}

    def test_compare_cols_default_intersection(self, spark):
        old = spark.createDataFrame([(1, 1.0, "x")], ["k", "v", "only_old"])
        new = spark.createDataFrame([(1, 1.0, 9)], ["k", "v", "only_new"])
        out = snapshot_diff(old, new, ["k"]).collect()[0]
        assert out["status"] == "unchanged"  # only 'v' is compared

    def test_guards(self, spark):
        old, new = self._frames(spark)
        with pytest.raises(ValueError, match="key_cols"):
            snapshot_diff(old, new, [])
        with pytest.raises(ValueError, match="not in new"):
            snapshot_diff(old, new.drop("s"), ["k"], ["s"])


class TestSCD2:
    def _hist(self, spark, rows):
        df = spark.createDataFrame(rows, ["k", "ts", "attr"])
        return {
            (r["k"], r["valid_from"]): r
            for r in scd2_merge(df, ["k"], ["attr"], "ts").collect()
        }

    def test_basic_intervals(self, spark):
        out = self._hist(
            spark,
            [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (2, 1, "x")],
        )
        assert len(out) == 3
        a = out[(1, 1)]
        assert a["attr"] == "a" and a["valid_to"] == 3 and not a["is_current"]
        b = out[(1, 3)]
        assert b["attr"] == "b" and b["valid_to"] is None and b["is_current"]
        x = out[(2, 1)]
        assert x["is_current"] and x["valid_from"] == 1

    def test_reappearing_value_opens_new_interval(self, spark):
        # a -> b -> a must yield THREE intervals, not a merged 'a'
        out = self._hist(spark, [(1, 1, "a"), (1, 2, "b"), (1, 3, "a")])
        assert len(out) == 3
        assert out[(1, 1)]["valid_to"] == 2
        assert out[(1, 2)]["valid_to"] == 3
        assert out[(1, 3)]["is_current"] and out[(1, 3)]["attr"] == "a"

    def test_null_attr_is_a_value(self, spark):
        rows = [(1, 1, None), (1, 2, None), (1, 3, "a")]
        df = spark.createDataFrame(rows, "k: int, ts: int, attr: string")
        out = scd2_merge(df, ["k"], ["attr"], "ts").collect()
        assert len(out) == 2  # null==null: one island, then 'a'

    def test_multi_attr_any_change_splits(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "a", 1.0), (1, 2, "a", 2.0), (1, 3, "a", 2.0)],
            ["k", "ts", "s", "v"],
        )
        out = scd2_merge(df, ["k"], ["s", "v"], "ts").collect()
        assert len(out) == 2

    def test_duplicate_snapshot_row_raises(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "a"), (1, 1, "b")], ["k", "ts", "attr"]
        )
        with pytest.raises(ValueError, match="duplicate"):
            scd2_merge(df, ["k"], ["attr"], "ts")

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, 1, "a")], ["k", "ts", "attr"])
        with pytest.raises(ValueError, match="key_cols and attr_cols"):
            scd2_merge(df, [], ["attr"], "ts")
        with pytest.raises(ValueError, match="not in snapshots"):
            scd2_merge(df, ["k"], ["nope"], "ts")
