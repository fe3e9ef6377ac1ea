"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB over the
same parquet, then compare row count, schema (column names), and an
order-insensitive value hash."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            # DuckDB's fetch_df() renders SQL NULL doubles as numpy NaN
            # while Spark's collect() keeps them None; the driver (and
            # check_oracle) compare at fetchall() level where both are
            # None — fold NaN into "null" to match that semantics.  A
            # genuine NaN VALUE cannot reach here: every oracle row
            # rounds its doubles, and round(NaN) stays NaN only for a
            # computed NaN, which no gate row emits on purpose.
            return "null"
        # driver-style normalization: fixed decimals (we round to 6 in the
        # queries, so this is just canonical formatting)
        return f"{v:.6f}"
    if v is None:
        return "null"
    return str(v)


def _canon(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in rows]
    return sorted(out)


@pytest.fixture(scope="module")
def sf001():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck(sf001):
    return _duck(sf001)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_vs_oracle(spark, duck, sf001, name):
    sdf = QUERIES[name](spark, sf001)
    spark_rows = [r.asDict() for r in sdf.collect()]
    ddf = duck.execute(ORACLES[name]).fetch_df()
    duck_rows = ddf.to_dict("records")

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    if spark_rows:
        assert sorted(spark_rows[0].keys()) == sorted(duck_rows[0].keys()), (
            f"{name}: schema mismatch"
        )
    s, d = _canon(spark_rows), _canon(duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf001, name):
    rows = QUERIES[name](spark, sf001).collect()
    assert len(rows) >= 1


def test_registry_window_contract():
    """The driver certifies the FIRST 50 registry rows — pin the window
    invariants so a refactor can't silently shrink certification: only
    sanctioned rows-only rows may sit in-window, no duplicate names,
    and every oracle is a non-trivial SQL string.  The full sanctioned
    rows-only set lives in ``test_gate_staleness.py``; here we pin THIS
    round's window (r13: staleness-first rotation — every window row is
    oracle-backed; the seeded studies ride the tail on their r12
    records)."""
    from data_integration_est_spark.entry_queries import REGISTRY

    names = list(REGISTRY)
    assert len(names) == len(set(names))
    assert len(names) >= 50
    window = names[:50]
    rows_only = [n for n in window if REGISTRY[n][1] is None]
    # r17: the four rows-only seeded MC studies rotate THROUGH the
    # window (their pass records date to r12, due at the r18 staleness
    # cliff, and the battery code was touched this round) — only the
    # sanctioned set may do so (the full list lives in
    # test_gate_staleness.py)
    assert set(rows_only) <= {
        "mc_nmar_study", "mc_nmar_v2_study", "mc_contaminated_study",
        "mc_stratified_study",
    }, rows_only
    # the r17 composition (optimization round — no new capability rows):
    # the 10 r12-green leftovers lead, the round's code-touched rows
    # follow (ANN recall, svyquantile family, iterative calfuns, MC
    # batteries, span/bigram/trigram), 17 r13 rows close it
    # (_R17_WINDOW in entry_queries.py)
    for n in ("mc_nmar_v2_study", "mc_contaminated_study",
              "mc_stratified_study", "minhash_lsh_portable",
              "simhash_portable_buckets", "embedding_lsh_portable",
              "unigram_quality", "embedding_gram", "source_cap",
              "heavy_tokens",
              "pq_knn_recall", "ivfpq_knn_recall", "ivf_knn_recall",
              "svyquantile_events", "svyquantile_cluster_events",
              "trimmed_mean_events", "repweight_cal_quantile_events",
              "calibrate_bounded_by", "calibrate_logit_by",
              "calibrate_raking_summary",
              "mc_deterministic_study", "mc_nmar_study",
              "mc_nmar_oracle_slice", "span_dedup_stats",
              "bigram_quality", "trigram_quality"):
        assert n in window, n
    for n, (fn, sql) in REGISTRY.items():
        assert callable(fn), n
        if sql is not None:
            assert isinstance(sql, str) and "SELECT" in sql.upper(), n
