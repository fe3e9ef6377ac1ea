"""r15: two-stage cluster sampling (``sampling.cluster_sample``) — the
S-family generator pairing with the ``SurveyDesign(psu_col=)`` kernels.

Checks: exact realized sizes per stratum/PSU, the two-stage HT weight
formula, partition-independence, a pure-Python md5-stream membership
replay (the property the gate row's DuckDB oracle certifies), and the
generate -> estimate loop (cluster sample + psu design recovers the
population mean within sampling error).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.stats import svymean
from data_integration_est_spark.sampling import cluster_sample

SEED = 77


def _fixture(spark, n=2000, n_psu=60, n_strata=3):
    rng = np.random.default_rng(5)
    psu = rng.integers(0, n_psu, size=n)
    h = psu % n_strata
    y = 20.0 + 2.0 * rng.normal(0, 1, size=n_psu)[psu] + rng.normal(0, 1, size=n)
    rows = [(int(i), int(psu[i]), int(h[i]), float(y[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, "id long, psu long, h long, y double"),
        psu, h, y,
    )


def _md5_uniform(key_parts, seed, tag):
    s = "\x1f".join(str(k) for k in key_parts) + f"\x1f{seed}:{tag}"
    h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    return ((h & ((1 << 53) - 1)) + 0.5) / float(1 << 53)


def test_exact_sizes_and_weights(spark):
    df, psu, h, y = _fixture(spark)
    out = cluster_sample(
        df, "psu", 8, SEED, stratum_col="h", m_per_psu=5, id_col="id",
        weight_col="w", stream="md5",
    ).toPandas()
    sel = out[out["ind"] == 1]
    # stage 1: exactly min(8, N_h) PSUs per stratum
    for hv in sorted(set(h)):
        n_h = len(set(psu[h == hv]))
        got = sel[sel["h"] == hv]["psu"].nunique()
        assert got == min(8, n_h)
    # stage 2: exactly min(5, M_c) elements per selected PSU, each with
    # the exact two-stage HT weight
    m_of = out.groupby("psu")["id"].count().to_dict()
    for c, grp in sel.groupby("psu"):
        m_c = m_of[c]
        assert len(grp) == min(5, m_c)
        hv = grp["h"].iloc[0]
        n_h = len(set(psu[h == hv]))
        w_want = (n_h / min(8, n_h)) * (m_c / min(5, m_c))
        assert grp["w"].unique() == pytest.approx([w_want])
    # unsampled rows carry NULL weight
    assert out[out["ind"] == 0]["w"].isna().all()


def test_membership_replays_md5_stream(spark):
    """The engine's selected set must equal a pure-Python replay of the
    md5 keyed-hash ranking — the exact property the gate row's DuckDB
    oracle certifies."""
    df, psu, h, y = _fixture(spark, n=800, n_psu=30)
    out = cluster_sample(
        df, "psu", 4, SEED, stratum_col="h", m_per_psu=3, id_col="id",
        stream="md5",
    ).toPandas()
    got = set(out[out["ind"] == 1]["id"])

    ids = out["id"].to_numpy()
    psus = out["psu"].to_numpy()
    hs = out["h"].to_numpy()
    want = set()
    for hv in sorted(set(hs)):
        cs = sorted(set(psus[hs == hv]))
        ranked = sorted(cs, key=lambda c: (_md5_uniform([c], SEED, "cluster:psu"), c))
        for c in ranked[:4]:
            els = sorted(
                ids[psus == c],
                key=lambda i: (_md5_uniform([i], SEED, "cluster:el"), i),
            )
            want.update(int(i) for i in els[:3])
    assert got == want


def test_partition_independence(spark):
    df, *_ = _fixture(spark, n=600, n_psu=20)
    a = cluster_sample(df, "psu", 5, SEED, stratum_col="h",
                       m_per_psu=4, id_col="id")
    b = cluster_sample(df.repartition(17), "psu", 5, SEED,
                       stratum_col="h", m_per_psu=4, id_col="id")
    sa = sorted(r["id"] for r in a.filter("ind = 1").collect())
    sb = sorted(r["id"] for r in b.filter("ind = 1").collect())
    assert sa == sb


def test_unstratified_single_stage(spark):
    df, psu, h, y = _fixture(spark, n=600, n_psu=20)
    out = cluster_sample(df, "psu", 6, SEED, weight_col="w").toPandas()
    sel = out[out["ind"] == 1]
    assert sel["psu"].nunique() == 6
    # single-stage: every element of a selected PSU is in, w = N/n
    m_of = out.groupby("psu")["id"].count().to_dict()
    for c, grp in sel.groupby("psu"):
        assert len(grp) == m_of[c]
    assert sel["w"].unique() == pytest.approx([20 / 6])


def test_generate_estimate_loop(spark):
    """cluster_sample -> SurveyDesign(psu) -> svymean recovers the
    population mean within a few design SEs."""
    df, psu, h, y = _fixture(spark, n=4000, n_psu=120)
    out = cluster_sample(
        df, "psu", 15, SEED, stratum_col="h", m_per_psu=8, id_col="id",
        weight_col="w",
    )
    samp = out.filter("ind = 1")
    des = SurveyDesign(df=samp, weight_col="w", strata_col="h",
                       psu_col="psu")
    est = svymean(des, "y")[0]
    pop_mean = float(np.mean(y))
    assert abs(est.estimate - pop_mean) < 4.0 * est.se
    assert est.se > 0


def test_validation(spark):
    df, *_ = _fixture(spark, n=100, n_psu=10)
    with pytest.raises(ValueError, match="needs id_col"):
        cluster_sample(df, "psu", 3, SEED, m_per_psu=2)
    with pytest.raises(ValueError, match="needs stratum_col"):
        cluster_sample(df, "psu", {0: 3}, SEED)
