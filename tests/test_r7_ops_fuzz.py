"""Randomized replays of the r7 operators against from-scratch python
references: duplicated-span removal, per-group quality cut, BRR/Fay
replicate variance, trigram LM scoring."""

import math
import random
from collections import Counter, defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_span_dedup_fuzz_matches_python(spark):
    from data_integration_est_spark.ops.dedup import duplicated_span_dedup

    rng = random.Random(19)
    words = [f"w{i}" for i in range(12)]
    texts = []
    for _ in range(40):
        toks = [rng.choice(words) for _ in range(rng.randint(0, 25))]
        texts.append(" ".join(toks))
    # plant guaranteed repeats so the dup set is non-trivial
    motif = "w1 w2 w3 w1 w2"
    texts += [f"{motif} {t}" for t in texts[:5]]
    L = 4
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in duplicated_span_dedup(df, min_len=L, hash_grams=False).collect()
    }

    docs = {i: t.split() for i, t in enumerate(texts)}
    counts = Counter(
        " ".join(tk[i:i + L])
        for tk in docs.values() for i in range(len(tk) - L + 1)
    )
    for did, tk in docs.items():
        starts = [i for i in range(len(tk) - L + 1)
                  if counts[" ".join(tk[i:i + L])] > 1]
        spans = []
        for s in starts:
            if spans and s < spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], s + L))
            else:
                spans.append((s, s + L))
        removed = {i for lo, hi in spans for i in range(lo, hi)}
        kept = " ".join(t for i, t in enumerate(tk) if i not in removed)
        # empty docs tokenize to [''] on both paths
        n_tok = len(tk) if tk else 1
        assert got[did] == (kept, n_tok, len(removed)), did


def test_keep_top_fraction_fuzz_matches_python(spark):
    from data_integration_est_spark.ops.mixing import keep_top_fraction

    rng = random.Random(23)
    rows = [
        (i, f"g{rng.randint(0, 4)}", float(rng.randint(0, 9)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    for frac in (0.17, 0.6, 0.95):
        got = {
            r["doc_id"]
            for r in keep_top_fraction(df, "score", frac, key_cols="source")
            .select("doc_id").collect()
        }
        groups = defaultdict(list)
        for did, src, sc in rows:
            groups[src].append((did, sc))
        want = set()
        for members in groups.values():
            members.sort(key=lambda t: (-t[1], t[0]))
            want.update(
                d for d, _ in members[: math.ceil(len(members) * frac)]
            )
        assert got == want, frac


@pytest.mark.parametrize("n_strata,rho", [(4, 0.0), (9, 0.3), (13, 0.5)])
def test_brr_fuzz_matches_numpy(spark, n_strata, rho):
    from data_integration_est_spark.kernels.replicate import brr_mean

    rng = np.random.RandomState(n_strata * 7 + 1)
    n = 3000
    h = rng.randint(0, n_strata, n)
    p = rng.randint(0, 2, n)
    # ensure every (stratum, psu) cell is populated
    fix = np.arange(2 * n_strata)
    h[: 2 * n_strata] = fix // 2
    p[: 2 * n_strata] = fix % 2
    w = 1.0 + rng.randint(0, 5, n)
    y = rng.normal(10.0, 3.0, n)
    df = spark.createDataFrame(
        [(int(a), int(b), float(c), float(d)) for a, b, c, d in zip(h, p, w, y)],
        "h long, p long, w double, y double",
    )
    got = brr_mean(df, "y", "h", "p", weight_col="w", fay_rho=rho).collect()[0]

    strata = sorted(set(h.tolist()))
    col = {hh: i + 1 for i, hh in enumerate(strata)}
    R = 4
    while R <= len(strata):
        R *= 2
    k = 1.0 - rho
    theta = float(np.sum(w * y) / np.sum(w))
    v = 0.0
    for r in range(R):
        s = np.array([-1.0 if bin(r & col[hh]).count("1") % 2 else 1.0
                      for hh in h])
        f = 1.0 + k * s * (1.0 - 2.0 * p)
        v += (float(np.sum(f * w * y) / np.sum(f * w)) - theta) ** 2
    se = math.sqrt(v / (R * k * k))
    assert got["mean"] == pytest.approx(round(theta, 6), abs=2e-6)
    assert got["se_brr"] == pytest.approx(round(se, 6), abs=2e-6)
    assert got["n_replicates"] == R


def test_trigram_fuzz_matches_python(spark):
    from data_integration_est_spark.ops.text import trigram_logprob_scores

    rng = random.Random(31)
    vocab = list("abcdefg")
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
             for _ in range(50)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in trigram_logprob_scores(df).collect()}

    allp, allt, by_doc = [], [], {}
    for i, t in enumerate(texts):
        tk = t.split()
        allp.extend(zip(tk, tk[1:]))
        ts = list(zip(tk, tk[1:], tk[2:]))
        if ts:
            by_doc[i] = ts
            allt.extend(ts)
    ct, cb = Counter(allt), Counter(allp)
    cv = Counter(v for v, _ in allp)
    cw = Counter(w for _, w in allp)
    T = sum(cw.values())
    for i, ts in by_doc.items():
        lps = [math.log(0.5 * ct[t] / cb[(t[0], t[1])]
                        + 0.375 * cb[(t[1], t[2])] / cv[t[1]]
                        + 0.125 * cw[t[2]] / T) for t in ts]
        assert got[i]["n_trigrams"] == len(ts)
        assert got[i]["avg_logprob3"] == pytest.approx(
            round(sum(lps) / len(lps), 6), abs=2e-6), i
    assert set(got) == set(by_doc)


def test_shuffle_shards_fuzz_matches_python(spark):
    from data_integration_est_spark.ops.mixing import (
        _HASH_MOD, _HASH_MULT, shuffle_shards,
    )

    ids = [i * 37 + 5 for i in range(500)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    for seed, n_shards in [(0, 4), (3, 8), (11, 5)]:
        got = {
            r["doc_id"]: (r["shard"], r["shard_pos"])
            for r in shuffle_shards(df, n_shards, seed=seed).collect()
        }
        keys = {i: ((i % _HASH_MOD) * _HASH_MULT + seed * 7919) % _HASH_MOD
                for i in ids}
        by_shard = {}
        for i in ids:
            by_shard.setdefault(keys[i] % n_shards, []).append(i)
        want = {}
        for sh, members in by_shard.items():
            members.sort(key=lambda i: (keys[i], i))
            for pos, i in enumerate(members, start=1):
                want[i] = (sh, pos)
        assert got == want, (seed, n_shards)
    # different seeds produce different orders
    a = shuffle_shards(df, 4, seed=0).collect()
    b = shuffle_shards(df, 4, seed=1).collect()
    assert {(r["doc_id"], r["shard"], r["shard_pos"]) for r in a} != \
           {(r["doc_id"], r["shard"], r["shard_pos"]) for r in b}
    import pytest as _pt
    with _pt.raises(ValueError, match="n_shards"):
        shuffle_shards(df, 0)


def test_mad_outlier_flags_fuzz_matches_numpy(spark):
    from data_integration_est_spark.ops.outliers import mad_outlier_flags

    rng = np.random.RandomState(3)
    rows = []
    for i in range(600):
        g = f"g{i % 3}"
        v = float(rng.normal(10 * (i % 3), 2))
        if i % 50 == 0:
            v += 100.0  # planted outliers
        rows.append((i, g, v))
    rows.append((600, "g0", None))
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r["id"]: r["is_outlier"]
           for r in mad_outlier_flags(df, "v", key_cols="g", k=3.0).collect()}

    import numpy as _np
    for gname in ("g0", "g1", "g2"):
        vals = _np.array([v for _, g, v in rows if g == gname and v is not None])
        med = _np.percentile(vals, 50)  # numpy linear interpolation == engine
        mad = _np.percentile(_np.abs(vals - med), 50)
        for i, g, v in rows:
            if g != gname or v is None:
                continue
            want = int(abs(v - med) > 3.0 * 1.4826 * mad) if mad > 0 \
                else int(abs(v - med) > 0)
            assert got[i] == want, (i, v)
    assert got[600] is None
    # planted outliers all flagged
    assert all(got[i] == 1 for i in range(0, 600, 50))
    # degenerate MAD: constant-majority group flags only the deviant
    cdf = spark.createDataFrame(
        [(i, 5.0 if i else 9.0) for i in range(10)], "id long, v double"
    )
    flags = {r["id"]: r["is_outlier"]
             for r in mad_outlier_flags(cdf, "v").collect()}
    assert flags[0] == 1 and all(flags[i] == 0 for i in range(1, 10))
    with pytest.raises(ValueError, match="k must"):
        mad_outlier_flags(cdf, "v", k=0)


def test_pairwise_corr_fuzz_matches_numpy(spark):
    from data_integration_est_spark.kernels.stats import pairwise_corr

    rng = np.random.RandomState(17)
    n = 500
    a = rng.normal(0, 1, n)
    b = 0.6 * a + rng.normal(0, 0.8, n)
    c = rng.normal(5, 2, n)
    g = np.array([f"g{i % 2}" for i in range(n)])
    rows = [
        (str(gg), float(x), float(y), None if i % 37 == 0 else float(z))
        for i, (gg, x, y, z) in enumerate(zip(g, a, b, c))
    ]
    df = spark.createDataFrame(rows, "g string, a double, b double, c double")
    got = {
        (r["g"], r["col_a"], r["col_b"]): (r["corr"], r["n"])
        for r in pairwise_corr(df, ["a", "b", "c"], group_cols=["g"]).collect()
    }
    import numpy as _np
    for gg in ("g0", "g1"):
        mask = (g == gg) & ~_np.isnan(
            _np.array([r[3] if r[3] is not None else _np.nan for r in rows])
        )
        sub = {"a": a[mask], "b": b[mask], "c": c[mask]}
        for x, y in (("a", "b"), ("a", "c"), ("b", "c")):
            want = float(_np.corrcoef(sub[x], sub[y])[0, 1])
            cr, nn = got[(gg, x, y)]
            assert nn == int(mask.sum())
            assert cr == pytest.approx(round(want, 6), abs=2e-6), (gg, x, y)
    with pytest.raises(ValueError, match="at least 2"):
        pairwise_corr(df, ["a"])


def test_token_budget_mixture_properties(spark):
    from data_integration_est_spark.ops.mixing import token_budget_mixture

    rows = [(i, ["big", "big", "big", "small"][i % 4], 100 + i % 7)
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["source"]: r for r in
           token_budget_mixture(df, "n_chars", alpha=0.5,
                                budget_tokens=1_000_000.0).collect()}
    # q sums to 1; targets sum to the budget
    assert abs(sum(r["q"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["target_tokens"] for r in out.values()) - 1_000_000.0) < 1.0
    # temperature smoothing: the small source's share RISES vs natural
    assert out["small"]["q"] > out["small"]["p"]
    assert out["big"]["q"] < out["big"]["p"]
    # epochs consistent with target/tokens
    for r in out.values():
        assert r["epochs"] == pytest.approx(
            r["target_tokens"] / r["tokens"], rel=1e-4)


def test_line_language_mix_matches_python(spark):
    from data_integration_est_spark.ops.text import STOPWORDS, line_language_mix

    texts = {
        1: "the quick fox of the day\nel perro y el gato\nthe end of it",
        2: "le chat et le chien",
        3: "zzz qqq xxx",            # no stopword hits -> und
        4: "",                        # no non-blank lines -> absent
        5: "the cat\nthe dog\nla de que y el",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: tuple(r)[1:] for r in line_language_mix(df).collect()}

    import re

    def pyl(line):
        hits = {}
        for lang, words in STOPWORDS.items():
            pat = r"\b(" + "|".join(words) + r")\b"
            hits[lang] = len(re.findall(pat, line.lower()))
        best = max(hits.values())
        if best == 0:
            return "und"
        return min(l for l, h in hits.items() if h == best)

    for did, t in texts.items():
        lines = [ln for ln in t.split("\n") if ln.strip()]
        if not lines:
            assert did not in got
            continue
        from collections import Counter
        cnt = Counter(pyl(ln) for ln in lines)
        n = sum(cnt.values())
        main = min(cnt, key=lambda k: (-cnt[k], k))
        ent = round(
            math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n, 6
        )
        assert got[did] == (n, main, len(cnt), ent), did
