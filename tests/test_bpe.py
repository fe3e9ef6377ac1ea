"""Distributed BPE learning (``ops/bpe``) vs a from-scratch python
reference implementation of word-frequency BPE."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.ops.bpe import bpe_segment, learn_bpe


def _py_bpe(texts, num_merges):
    """Classic word-frequency BPE with (count desc, pair asc) tie-break."""
    wf = Counter(w for t in texts for w in t.split())
    reps = {w: list(w) for w in wf}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, cnt in wf.items():
            r = reps[w]
            for i in range(len(r) - 1):
                pairs[(r[i], r[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((a, b, n))
        for w, r in reps.items():
            out, i = [], 0
            while i < len(r):
                if i + 1 < len(r) and r[i] == a and r[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(r[i])
                    i += 1
            reps[w] = out
    return merges, reps


@pytest.fixture(scope="module")
def corpus_texts():
    return [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest new low",
        "the newest lowest widest the the",
    ]


def test_learn_bpe_matches_python_reference(spark, corpus_texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    merges, words = learn_bpe(df, num_merges=12, checkpoint_every=4)
    want_merges, want_reps = _py_bpe(corpus_texts, 12)
    assert merges == want_merges
    got_reps = {r["word"]: r["rep"].split(" ") for r in words.collect()}
    assert got_reps == want_reps


def test_bpe_segment_applies_merges_in_order(spark, corpus_texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    merges, _ = learn_bpe(df, num_merges=8)
    seg = bpe_segment(df, merges).collect()
    _, want_reps = _py_bpe(corpus_texts, 8)
    for r in seg:
        text = corpus_texts[r["doc_id"]]
        want = [tok for w in text.split() for tok in want_reps[w]]
        assert list(r["bpe_tokens"]) == want, r["doc_id"]
    # round trip: concatenating subwords of each word restores the text
    joined = "".join(seg[0]["bpe_tokens"])
    assert joined == corpus_texts[0].replace(" ", "")


def test_learn_bpe_early_stop_on_fused_vocab(spark):
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges, words = learn_bpe(df, num_merges=10)
    assert [m[:2] for m in merges] == [("a", "b")]
    assert words.collect()[0]["rep"] == "ab"


def test_learn_bpe_validates(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_merges"):
        learn_bpe(df, num_merges=0)
