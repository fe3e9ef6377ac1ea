"""PMI/NPMI collocations (`ops/collocations`) — from-scratch python
counts as the oracle, plus the planted-collocation sanity check."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from data_integration_est_spark.ops.collocations import pmi_collocations


def _texts(seed=5, n=200):
    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(30)]
    out = []
    for _ in range(n):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        # plant a strong collocation pair
        if rng.random() < 0.5:
            i = rng.randint(0, max(0, len(toks)))
            toks[i:i] = ["new", "york"]
        out.append(" ".join(toks))
    return out


def _py_oracle(texts, min_count):
    uni, pair = Counter(), Counter()
    for t in texts:
        toks = [x for x in t.strip().lower().split() if x]
        uni.update(toks)
        pair.update(zip(toks, toks[1:]))
    T, P = sum(uni.values()), sum(pair.values())
    out = {}
    for (v, w), n in pair.items():
        if n < min_count:
            continue
        pmi = math.log((n / P) / ((uni[v] / T) * (uni[w] / T)))
        npmi = pmi / (-math.log(n / P))
        out[(v, w)] = (n, uni[v], uni[w], round(pmi, 6), round(npmi, 6))
    return out


def test_matches_python_counts(spark):
    texts = _texts()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["v"], r["w"]): (
            r["n_pair"], r["n_v"], r["n_w"], r["pmi"], r["npmi"]
        )
        for r in pmi_collocations(df, min_count=3).collect()
    }
    want = _py_oracle(texts, 3)
    assert got == want


def test_planted_collocation_tops_npmi(spark):
    texts = _texts()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    top = pmi_collocations(df, min_count=3, top_k=1).collect()[0]
    assert (top["v"], top["w"]) == ("new", "york")
    assert top["npmi"] > 0.5


def test_validation_and_topk_plan(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        pmi_collocations(df, min_count=0)
    with pytest.raises(ValueError):
        pmi_collocations(df, top_k=0)
    plan = (
        pmi_collocations(df, min_count=1, top_k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
