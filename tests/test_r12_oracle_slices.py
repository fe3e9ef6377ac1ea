"""Gate-independent parity checks for the r12 oracle slices.

The gate compares `q_mc_stratified_oracle_slice` / `q_mc_nmar_v2_oracle_slice`
against their DuckDB oracles at the slices' committed parameters; these
tests re-derive the comparison at SMALLER parameters through the same
parameterized SQL builders, so a regression in either the Spark path or
the oracle construction fails the suite even between gate runs — and
proves the builders are honest functions of their parameters rather
than hash-pinned to one configuration.
"""

from __future__ import annotations

import duckdb
import pytest


def _compare(spark_rows, cols, sql):
    con = duckdb.connect()
    t = con.execute(sql)
    ocols = [d[0] for d in t.description]
    orows = t.fetchall()
    assert sorted(cols) == sorted(ocols)
    key = lambda r: tuple((x is None, str(x)) for x in r)
    s_sorted = sorted([tuple(r[c] for c in sorted(cols)) for r in spark_rows], key=key)
    idx = {c: i for i, c in enumerate(ocols)}
    o_sorted = sorted(
        [tuple(r[idx[c]] for c in sorted(ocols)) for r in orows], key=key
    )
    assert len(s_sorted) == len(o_sorted)
    for a, b in zip(s_sorted, o_sorted):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert x == pytest.approx(y, abs=5e-7), (a, b)
            else:
                assert x == y, (a, b)


def test_stratified_slice_matches_oracle_at_small_params(spark):
    from data_integration_est_spark.entry_queries import _sql_mc_stratified_slice
    from data_integration_est_spark.montecarlo import run_stratified_oracle_slice

    res = run_stratified_oracle_slice(
        spark, N=500, n_sim=2, n_A_total=40, n_B_total=150, seed=77
    )
    df = res.summary
    sql = _sql_mc_stratified_slice(
        N=500, n_sim=2, n_A_total=40, n_B_total=150, seed=77
    )
    _compare(df.collect(), df.columns, sql)


def test_nmar_v2_slice_matches_oracle_at_small_params(spark):
    from data_integration_est_spark.entry_queries import _sql_mc_nmar_v2_slice
    from data_integration_est_spark.montecarlo import run_nmar_v2_study

    res = run_nmar_v2_study(
        spark, N=600, n_sim=2, gammas=(0.0, 1.0), sd_vector=(0.0, 0.25),
        size_a=60, size_b=200, seed=42, stream="md5",
    )
    out = res.summary.join(res.r2_summary, ["gamma", "sd", "estimator"], "left")
    sql = _sql_mc_nmar_v2_slice(
        N=600, n_sim=2, gammas=(0.0, 1.0), sds=(0.0, 0.25),
        size_a=60, size_b=200, seed=42,
    )
    _compare(out.collect(), out.columns, sql)
