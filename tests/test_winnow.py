"""Winnowing fingerprints: the window-min logic is verified against a
direct Python winnow over the SAME k-gram hashes (fetched from Spark, so
the hash function itself cancels out), plus the structural guarantees
of the scheme (shared-substring detection, edit robustness)."""

from pyspark.sql import functions as F

from data_integration_est_spark.ops import dedup as dd

K, W = 8, 4


def _py_winnow(hashes: list[int], window: int) -> set[int]:
    """SIGMOD-2003 winnowing: min of each FULL window of `window`
    consecutive hashes (no partial trailing windows); a doc too short
    for one full window keeps its single all-grams min."""
    if len(hashes) <= window:
        return set([min(hashes)]) if hashes else set()
    out = set()
    for j in range(len(hashes) - window + 1):
        out.add(min(hashes[j : j + window]))
    return out


def test_winnow_matches_python_reference(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "short"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: set()
        for r in df.collect()
    }
    for r in dd.winnow_fingerprints(df, k=K, window=W).collect():
        got[r["doc_id"]].add(r["fp"])

    # recompute the same k-gram hashes in Spark, winnow in Python
    n = F.greatest(F.length("text") - K + 1, F.lit(1))
    grams = df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n)).alias("pos"),
        F.xxhash64(F.col("text").substr(F.col("pos"), F.lit(K))).alias("h"),
    ).orderBy("doc_id", "pos").collect()
    by_doc: dict[int, list[int]] = {}
    for r in grams:
        by_doc.setdefault(r["doc_id"], []).append(r["h"])
    for doc_id, hs in by_doc.items():
        assert got[doc_id] == _py_winnow(hs, W), doc_id


def test_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k + window - 1 must share at
    least one fingerprint (the winnowing guarantee)."""
    shared = "a very distinctive shared passage!"
    assert len(shared) >= K + W - 1
    df = spark.createDataFrame(
        [(1, "prefix one " + shared + " suffix alpha"),
         (2, "totally different lead " + shared + " other tail"),
         (3, "no overlap with anything here at all")],
        "doc_id long, text string",
    )
    fps = dd.winnow_fingerprints(df, k=K, window=W).collect()
    sets: dict[int, set] = {}
    for r in fps:
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    assert sets[1] & sets[2]
    assert not (sets[1] & sets[3] and sets[2] & sets[3])


def test_overlap_pairs(spark):
    shared = "the same long shared paragraph of text appears here"
    df = spark.createDataFrame(
        [(1, shared + " with ending one"),
         (2, shared + " but another tail"),
         (3, "entirely unrelated content with nothing in common xyz")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "id_a long, id_b long"
    )
    rows = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in dd.winnow_overlap_pairs(df, cand, threshold=0.0).collect()
    }
    assert rows.get((1, 2), 0.0) > 0.4
    assert rows.get((1, 3), 0.0) < 0.1 and rows.get((2, 3), 0.0) < 0.1
