"""Schema-drift guard for /root/testdata (VERDICT r3 task 6).

Round 3 proved the driver-generated testdata can change shape between
rounds (events.ts went TIMESTAMP(NANOS) -> timestamp[us]) and that the
failure mode without a guard is a dozen opaque AnalysisExceptions deep in
query code.  This test fails FIRST, with a readable per-column diff, when
the parquet schemas move again.

Columns with several acceptable physical types (dtype families we adapt
to at read time) list every accepted spelling; anything else drifting is
a real signal that reader code needs attention.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# table -> {column: accepted pyarrow type strings}
# events.ts accepts every vintage the adaptive reader
# (streaming/events.adapt_event_ts) knows how to normalize.
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32", "int64"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32", "int64"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32", "int64"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32", "int64"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32", "int64"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32", "int64"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "date32[day]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32", "int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        # every vintage adapt_event_ts handles (nanos/micros/millis)
        "ts": {"timestamp[us]", "timestamp[ns]", "timestamp[ms]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32", "int64"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema(table):
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    want = EXPECTED[table]

    diffs = []
    for col, accepted in want.items():
        if col not in actual:
            diffs.append(f"  MISSING column {col!r} (expected one of {sorted(accepted)})")
        elif actual[col] not in accepted:
            diffs.append(
                f"  DRIFTED column {col!r}: now {actual[col]!r}, "
                f"reader accepts {sorted(accepted)}"
            )
    for col in actual:
        if col not in want:
            diffs.append(f"  NEW column {col!r}: {actual[col]!r} (update EXPECTED + readers)")

    assert not diffs, (
        f"testdata schema drift in {path} — fix the adaptive readers "
        f"(streaming/events.py, entry_queries._t) BEFORE queries crash:\n"
        + "\n".join(diffs)
    )
