"""Randomized (seeded) property tests for the round-5 operators: each op
against an independent python/numpy reference over several drawn inputs —
the same strategy as test_llm_ops_fuzz / test_formula_fuzz."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.quantile import svyquantile
from data_integration_est_spark.kernels.rake import rake
from data_integration_est_spark.ops.packing import pack_bins


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_pack_bins(spark, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    budget = int(rng.integers(20, 200))
    rows = [
        (i, str(rng.integers(0, 4)), int(rng.integers(0, budget * 2)))
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, t long")
    got = {(r["source"], r["doc_id"]): r["bin"]
           for r in pack_bins(docs, "t", budget=budget, by="source").collect()}
    for s in {r[1] for r in rows}:
        b, fill = 0, 0
        for i, _, t in sorted(r for r in rows if r[1] == s):
            if fill + t > budget and fill > 0:
                b, fill = b + 1, 0
            assert got[(s, i)] == b, (seed, s, i)
            fill += t


@pytest.mark.parametrize("seed", [5, 6])
def test_fuzz_rake_vs_numpy_ipf(spark, seed):
    rng = np.random.default_rng(seed)
    n = 600
    rows = [
        (i, str(rng.integers(0, 3)), str(rng.integers(0, 4)),
         float(rng.uniform(0.5, 3.0)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string, d double")
    margins = {
        "a": {str(k): float(rng.uniform(100, 300)) for k in range(3)},
        "b": {str(k): float(rng.uniform(80, 200)) for k in range(4)},
    }
    out = rake(df, margins, d_col="d", max_iter=3, tol=None)
    got = {
        (r["a"], r["b"]): r["s"]
        for r in out.groupBy("a", "b").agg(F.sum("w_rake").alias("s")).collect()
    }
    # numpy IPF on the cell table, same sweep order
    cells: dict = {}
    for _, a, b, d in rows:
        cells[(a, b)] = cells.get((a, b), 0.0) + d
    for _ in range(3):
        for col, targets in margins.items():
            idx = 0 if col == "a" else 1
            sums: dict = {}
            for k, v in cells.items():
                sums[k[idx]] = sums.get(k[idx], 0.0) + v
            cells = {k: v * targets[k[idx]] / sums[k[idx]] for k, v in cells.items()}
    for k, v in cells.items():
        assert got[k] == pytest.approx(v, rel=1e-9), (seed, k)


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_fuzz_svyquantile(spark, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 5000))
    # mix of continuous values and deliberate ties
    y = np.round(rng.normal(0, 100, n), 1)
    y[rng.integers(0, n, n // 4)] = float(np.round(rng.normal(0, 100), 1))
    w = rng.integers(1, 7, n).astype(float)
    qs = tuple(sorted(rng.uniform(0.02, 0.98, 3)))
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"y": y, "w": w}))
    got = {r["q"]: r["quantile"]
           for r in svyquantile(SurveyDesign(df=df, weight_col="w"), "y", qs=qs).collect()}
    o = np.argsort(y, kind="mergesort")
    cw = np.cumsum(w[o])
    for q in qs:
        want = float(y[o][np.searchsorted(cw, q * w.sum(), side="left")])
        assert got[q] == want, (seed, q)


@pytest.mark.parametrize("seed", [11, 12])
def test_fuzz_hash_split_partition(spark, seed):
    from data_integration_est_spark.ops.mixing import hash_split

    rng = np.random.default_rng(seed)
    cuts = sorted(rng.uniform(0.1, 0.9, 2))
    fr = {"a": cuts[0], "b": cuts[1] - cuts[0], "c": 1.0 - cuts[1]}
    docs = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = hash_split(docs, fr)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 5000
    for name, frac in fr.items():
        got = counts.get(name, 0) / 5000
        assert abs(got - frac) < 0.05, (seed, name, got, frac)
