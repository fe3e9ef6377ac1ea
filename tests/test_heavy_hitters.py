"""Exact heavy hitters (``ops/heavy_hitters``): the MG candidate pass
must never lose a true heavy hitter (superset guarantee), and the final
output must equal the plain count-and-filter."""

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.heavy_hitters import (
    heavy_hitters, misra_gries_candidates,
)


def _exact(df, col, phi):
    import math

    total = df.select(col).na.drop().count()
    return {
        (r[col], r["n"])
        for r in df.na.drop(subset=[col])
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= math.ceil(phi * total))
        .collect()
    }


def test_heavy_hitters_equals_exact_on_zipf(spark):
    # zipf-ish: value v appears ~N/v times
    df = spark.range(200_000).select(
        (F.floor(F.pow(F.lit(2.0), (F.col("id") % 17).cast("double") / 1.7)))
        .cast("string").alias("v")
    )
    got = {(r["v"], r["count"]) for r in heavy_hitters(df, "v", 0.01).collect()}
    assert got == _exact(df, "v", 0.01)
    assert len(got) > 0


def test_heavy_hitters_diffuse_value_survives(spark):
    """The regression case for the subtract-on-evict rule: one value
    ('needle') drips steadily among rotating noise values.  A summary
    that drops without decrementing evicts it past the error budget."""
    rows = []
    for i in range(50_000):
        rows.append(("needle",) if i % 40 == 0 else (f"noise_{i % 7000}",))
    df = spark.createDataFrame(rows, "v string").repartition(8)
    phi = 0.02  # needle freq = 2.5% > phi
    got = {r["v"] for r in heavy_hitters(df, "v", phi).collect()}
    assert "needle" in got
    assert got == {v for v, _ in _exact(df, "v", phi)}


def test_candidate_set_is_bounded_and_superset(spark):
    import math

    phi = 0.05
    df = spark.range(100_000).select(
        (F.col("id") % 1000).cast("string").alias("v")
    ).repartition(16)
    cand = misra_gries_candidates(df, "v", phi)
    n_cand = cand.count()
    k = math.ceil(1 / phi) + 1
    assert n_cand <= 16 * (k + 1)
    # uniform 1000 values at 0.1% each: none reach 5%, exact set empty
    assert heavy_hitters(df, "v", phi, candidates=cand).count() == 0


def test_injected_candidates_path(spark):
    df = spark.createDataFrame([("a",)] * 60 + [("b",)] * 40, "v string")
    cand = spark.createDataFrame([("a",), ("zzz",)], "v string")
    got = {(r["v"], r["count"])
           for r in heavy_hitters(df, "v", 0.5, candidates=cand).collect()}
    # only candidates are counted; zzz has no rows, b was never offered
    assert got == {("a", 60)}


def test_phi_validation(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="phi"):
        misra_gries_candidates(df, "v", 0.0)


def test_heavy_hitters_by_equals_exact_per_group(spark):
    import math

    from data_integration_est_spark.ops.heavy_hitters import heavy_hitters_by

    # group 'a': skewed; group 'b': uniform; group 'c': one diffuse needle
    rows = []
    for i in range(30_000):
        g = ("a", "b", "c")[i % 3]
        if g == "a":
            v = f"v{(i * i) % 37 % 6}"       # skewed few values
        elif g == "b":
            v = f"u{i % 500}"                # uniform many values
        else:
            v = "needle" if i % 90 == 2 else f"n{i % 800}"  # i%3==2 lands in c
        rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    phi = 0.02
    got = {(r["g"], r["v"], r["n"]) for r in
           heavy_hitters_by(df, "v", "g", phi)
           .withColumnRenamed("count", "n").collect()}
    # exact reference per group
    want = set()
    from collections import Counter
    per_g: dict = {}
    for g, v in rows:
        per_g.setdefault(g, Counter())[v] += 1
    for g, c in per_g.items():
        n_g = sum(c.values())
        for v, n in c.items():
            if n >= math.ceil(phi * n_g):
                want.add((g, v, n))
    assert got == want
    assert any(t[0] == "c" and t[1] == "needle" for t in got)
    assert not any(t[0] == "b" for t in got)  # uniform group has no hitters


def test_heavy_hitters_single_job_recount(spark, monkeypatch):
    """r6: total N folds into the recount pass (null-keyed tail group +
    empty-frame window) — no separate count() job on the base."""
    from data_integration_est_spark.ops.heavy_hitters import heavy_hitters

    df = spark.range(1000).selectExpr("CAST(id % 7 AS STRING) AS tok")
    cls = type(df)
    calls = {"count": 0}
    orig = cls.count

    def spy(self, *a, **k):
        calls["count"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "count", spy)
    out = heavy_hitters(df, "tok", phi=0.1)
    assert calls["count"] == 0  # fully lazy: no eager count during build
    rows = {r["tok"]: r["count"] for r in out.collect()}
    # 7 values x ~143 each, N=1000, threshold ceil(100) -> all 7 survive
    assert len(rows) == 7 and sum(rows.values()) == 1000


def test_heavy_hitters_threshold_edge_lazy_plan(spark):
    from data_integration_est_spark.ops.heavy_hitters import heavy_hitters

    # 90 'a' + 10 'b': phi=0.1 -> ceil(0.1*100)=10, both survive;
    # phi=0.11 -> ceil(11) -> only 'a'
    df = spark.createDataFrame(
        [("a",)] * 90 + [("b",)] * 10, "tok string"
    )
    both = {r["tok"] for r in heavy_hitters(df, "tok", 0.1).collect()}
    only = {r["tok"] for r in heavy_hitters(df, "tok", 0.11).collect()}
    assert both == {"a", "b"} and only == {"a"}


def test_grouped_mg_high_cardinality_guard(spark):
    """r6: a high-cardinality `by` must fail loudly, not silently degrade
    into per-group pandas overhead."""
    import pytest as _pytest

    from data_integration_est_spark.ops.heavy_hitters import (
        heavy_hitters_by, misra_gries_candidates_by)

    df = spark.range(5000).selectExpr(
        "CAST(id AS STRING) AS grp", "CAST(id % 3 AS STRING) AS tok"
    ).coalesce(1)
    with _pytest.raises(Exception, match="distinct 'grp' groups"):
        misra_gries_candidates_by(df, "tok", "grp", 0.2, max_groups=100).collect()
    # and the documented modest-cardinality path still works
    ok = heavy_hitters_by(
        spark.range(300).selectExpr(
            "CAST(id % 3 AS STRING) AS grp", "CAST(id % 5 AS STRING) AS tok"
        ),
        "tok", "grp", 0.15,
    )
    assert ok.count() > 0
