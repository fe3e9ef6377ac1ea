"""Randomized independent-oracle tests for the round-4 LLM-pipeline ops.

Pattern: draw a few hundred random cases with a FIXED seed, run the
operator as ONE Spark job, then recompute every row's expected value in
pure Python (a second, independent implementation) and compare exactly.
This is the fuzz-with-oracle layer between the hand-picked unit cases
and the DuckDB gate: it sweeps shapes no one thought to write down
(empty docs, whitespace runs, zero-token rows, single-doc streams).
"""

from __future__ import annotations

import random
import re

import pytest

from data_integration_est_spark.ops.decontam import contamination_scan
from data_integration_est_spark.ops.packing import pack_chunks

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "Eta!", "THETA",
         "io-ta", "kappa9", "lam", "mu"]


def _norm_py(text: str) -> str:
    t = re.sub(r"[^a-z0-9\s]", "", text.lower())
    return re.sub(r"\s+", " ", t).strip()


def _grams_py(text: str, n: int) -> set[str]:
    t = _norm_py(text)
    # empty normalized text splits to [''] just like Spark split/trim
    w = t.split(" ") if t != "" else [""]
    if len(w) >= n:
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    return {t}


@pytest.mark.parametrize("seed", [7, 77])
def test_decontam_fuzz_vs_python_oracle(spark, seed):
    rng = random.Random(seed)
    docs, bench = [], []
    for i in range(60):
        n_words = rng.randint(0, 14)
        text = " ".join(rng.choice(WORDS) for _ in range(n_words))
        if rng.random() < 0.3:
            text = text + "   "  # trailing whitespace runs
        docs.append((i, text))
    for j in range(8):
        n_words = rng.randint(3, 9)
        bench.append((1000 + j, " ".join(rng.choice(WORDS) for _ in range(n_words))))

    docs_df = spark.createDataFrame(docs, "doc_id long, text string")
    bench_df = spark.createDataFrame(bench, "doc_id long, text string")
    n = 3
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"])
        for r in contamination_scan(docs_df, bench_df, n=n, exact=True).collect()
    }

    bench_grams = set().union(*(_grams_py(t, n) for _, t in bench))
    for i, text in docs:
        grams = _grams_py(text, n)
        assert got[i] == (len(grams), len(grams & bench_grams)), (i, text)


@pytest.mark.parametrize("seed", [13, 131])
def test_pack_chunks_fuzz_vs_python_oracle(spark, seed):
    rng = random.Random(seed)
    budget = rng.choice([7, 64, 100])
    rows = []
    for i in range(300):
        rows.append((i, f"s{rng.randint(0, 5)}", rng.randint(0, 3 * budget)))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    got = {r["doc_id"]: r for r in pack_chunks(df, "n_tok", budget).collect()}

    # independent python packing per stream
    by_stream: dict[str, list[tuple[int, int]]] = {}
    for i, s, t in rows:
        by_stream.setdefault(s, []).append((i, t))
    for s, members in by_stream.items():
        off = 0
        for i, t in sorted(members):
            start, end = off, off + t
            first = start // budget
            last = max(end - 1, start) // budget
            r = got[i]
            assert (r["start_off"], r["end_off"]) == (start, end), (s, i)
            assert (r["first_chunk"], r["last_chunk"]) == (first, last), (s, i)
            assert r["n_chunks_spanned"] == last - first + 1
            off = end

    # contiguity: per stream, max end == sum of tokens
    for s, members in by_stream.items():
        tot = sum(t for _, t in members)
        assert max(got[i]["end_off"] for i, _ in members) == (tot if members else 0)
