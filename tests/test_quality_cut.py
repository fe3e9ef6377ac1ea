"""Per-group top-fraction quality cut (``ops/mixing.keep_top_fraction``)
vs a python replay, with heavy ties (deterministic tiebreak), edge
fractions, and group-floor semantics."""

import math

import pytest

from data_integration_est_spark.ops.mixing import keep_top_fraction


def _py_cut(rows, frac, keyed=True):
    from collections import defaultdict

    groups = defaultdict(list)
    for did, src, score in rows:
        groups[src if keyed else 0].append((did, score))
    kept = set()
    for g, members in groups.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        k = math.ceil(len(members) * frac)
        kept.update(did for did, _ in members[:k])
    return kept


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (i, f"s{i % 3}", float((i * 7) % 5))  # heavy ties: 5 score levels
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    return df, rows


def test_top_fraction_matches_python(scored):
    df, rows = scored
    for frac in (0.3, 0.5, 1.0):
        got = {
            r["doc_id"]
            for r in keep_top_fraction(df, "score", frac, key_cols="source")
            .select("doc_id").collect()
        }
        assert got == _py_cut(rows, frac), frac


def test_top_fraction_global_and_floor(spark, scored):
    df, rows = scored
    got = {
        r["doc_id"]
        for r in keep_top_fraction(df, "score", 0.25).select("doc_id").collect()
    }
    assert got == _py_cut(rows, 0.25, keyed=False)
    # every non-empty group keeps at least one row
    tiny = spark.createDataFrame(
        [(1, "a", 9.0), (2, "b", 1.0)], "doc_id long, source string, score double"
    )
    assert keep_top_fraction(tiny, "score", 0.01, key_cols="source").count() == 2


def test_top_fraction_validates(scored):
    df, _ = scored
    with pytest.raises(ValueError, match="frac"):
        keep_top_fraction(df, "score", 0.0)
    with pytest.raises(ValueError, match="frac"):
        keep_top_fraction(df, "score", 1.5)
