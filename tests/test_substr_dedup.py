"""ExactSubstr-style duplicated-span removal
(``ops/dedup.duplicated_span_dedup``) vs a from-scratch python
reference, plus path-equality (hash keys vs raw-text keys) and edge
cases (full-doc removal, overlapping-window merging)."""

from collections import Counter

import pytest

from data_integration_est_spark.ops.dedup import duplicated_span_dedup


def _py_span_dedup(texts, L):
    docs = {i: t.split() for i, t in enumerate(texts)}
    counts = Counter()
    for toks in docs.values():
        for i in range(len(toks) - L + 1):
            counts[" ".join(toks[i:i + L])] += 1
    out = {}
    for did, toks in docs.items():
        starts = sorted(
            i for i in range(len(toks) - L + 1)
            if counts[" ".join(toks[i:i + L])] > 1
        )
        spans = []
        for s in starts:
            if spans and s < spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], s + L))
            else:
                spans.append((s, s + L))
        removed = set()
        for lo, hi in spans:
            removed.update(range(lo, hi))
        kept = [t for i, t in enumerate(toks) if i not in removed]
        out[did] = (" ".join(kept), len(toks), len(removed))
    return out


@pytest.fixture(scope="module")
def span_corpus():
    boiler = "the quick brown fox jumps over the lazy dog tonight"
    return [
        f"alpha beta {boiler} gamma delta",
        f"epsilon {boiler} zeta eta theta iota kappa",
        "unique words only in this document nothing repeats here at all",
        boiler,  # entire doc is a duplicated span -> fully removed
        # overlapping duplicated windows: 'one two three four five six'
        # appears twice INSIDE this one doc -> windows chain into spans
        "one two three four five six filler one two three four five six",
    ]


def test_span_dedup_matches_python_reference(spark, span_corpus):
    df = spark.createDataFrame(
        list(enumerate(span_corpus)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_removed"])
        for r in duplicated_span_dedup(df, min_len=5, hash_grams=False).collect()
    }
    want = _py_span_dedup(span_corpus, 5)
    assert got == want
    # the fully-duplicated doc stays present, empty
    assert got[3][0] == "" and got[3][2] == got[3][1]
    # the unique doc is untouched
    assert got[2] == (span_corpus[2], len(span_corpus[2].split()), 0)


def test_span_dedup_hash_path_equals_raw_path(spark, span_corpus):
    df = spark.createDataFrame(
        list(enumerate(span_corpus * 3)), "doc_id long, text string"
    )
    raw = {r["doc_id"]: tuple(r) for r in
           duplicated_span_dedup(df, min_len=4, hash_grams=False).collect()}
    hsh = {r["doc_id"]: tuple(r) for r in
           duplicated_span_dedup(df, min_len=4, hash_grams=True).collect()}
    assert raw == hsh


def test_span_dedup_validates(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        duplicated_span_dedup(df, min_len=1)
