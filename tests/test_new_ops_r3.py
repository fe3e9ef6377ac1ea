"""Round-3 extension operators: TF-IDF top terms, event funnel, rolling
time-range features, blocked fuzzy linkage, jackknife replicate SE.
Each checked against a direct Python/numpy computation on small data;
the gate oracles (DuckDB SQL) cover engine parity at sf0.01.
"""

import math

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.replicate import jackknife_mean
from data_integration_est_spark.ops.funnel import funnel_counts, funnel_times
from data_integration_est_spark.ops.linkage import (
    best_matches, block_first_token, block_suffix, fuzzy_join,
)
from data_integration_est_spark.ops.rolling import add_rolling_features
from data_integration_est_spark.ops.text import tfidf_top_terms


# ---------------------------------------------------------------- tf-idf
def test_tfidf_matches_direct(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs and cats"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df_t"], r["tfidf"])
        for r in tfidf_top_terms(df, k=2).collect()
    }
    # direct computation
    import collections
    tok = {i: [t for t in __import__("re").split(r"[^a-z0-9]+", s.lower())
               if len(t) >= 2] for i, s in docs}
    n = len(docs)
    dfreq = collections.Counter()
    for i, ts in tok.items():
        for t in set(ts):
            dfreq[t] += 1
    for i, ts in tok.items():
        cnt = collections.Counter(ts)
        scored = sorted(
            (
                (round(c * (math.log((n + 1) / (dfreq[t] + 1)) + 1), 6), t)
                for t, c in cnt.items()
            ),
            key=lambda p: (-p[0], p[1]),
        )
        for rk, (sc, t) in enumerate(scored[:2], start=1):
            assert got[(i, rk)] == (t, cnt[t], dfreq[t], sc), (i, rk)
    assert (4, 1) not in got  # empty doc emits nothing


# ---------------------------------------------------------------- funnel
@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, 10.0, "view"), (1, 20.0, "click"), (1, 30.0, "purchase"),
        # u2 clicks BEFORE viewing; the later click counts
        (2, 10.0, "click"), (2, 20.0, "view"), (2, 25.0, "click"),
        # u3 purchase before click: funnel stops at click
        (3, 10.0, "view"), (3, 15.0, "purchase"), (3, 20.0, "click"),
        # u4 never views
        (4, 10.0, "click"), (4, 20.0, "purchase"),
        # u5 view at same ts as click: strict 'after' rejects the click
        (5, 10.0, "view"), (5, 10.0, "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, t double, event_type string"
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "event_type")


def test_funnel_times_ordering(funnel_events):
    rows = {
        r["user_id"]: r
        for r in funnel_times(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 5}  # u4 never reached step 1
    assert rows[1]["t_2"].timestamp() == 20.0
    assert rows[1]["t_3"].timestamp() == 30.0
    assert rows[2]["t_2"].timestamp() == 25.0  # pre-view click ignored
    assert rows[2]["t_3"] is None
    assert rows[3]["t_2"].timestamp() == 20.0
    assert rows[3]["t_3"] is None  # purchase preceded the click
    assert rows[5]["t_2"] is None  # equal ts is not 'after'


def test_funnel_counts(funnel_events):
    row = funnel_counts(funnel_events, ["view", "click", "purchase"]).collect()[0]
    assert (row["n_step_1"], row["n_step_2"], row["n_step_3"]) == (4, 3, 1)


# ---------------------------------------------------------------- rolling
def test_rolling_features_match_direct(spark):
    rows = [(1, t, float(t)) for t in [0.0, 10.0, 3000.0, 3600.0, 3601.0, 8000.0]]
    rows += [(2, 5.0, 100.0)]
    df = spark.createDataFrame(rows, "user_id long, t double, value double").select(
        "user_id", F.timestamp_seconds("t").alias("ts"), "value"
    )
    got = {
        (r["user_id"], r["ts"].timestamp()): (r["roll_cnt_3600s"], r["roll_sum_3600s"])
        for r in add_rolling_features(df).collect()
    }
    for uid, t, _ in rows:
        in_frame = [v for u2, t2, v in rows if u2 == uid and t - 3600 <= t2 <= t]
        assert got[(uid, t)] == (len(in_frame), round(sum(in_frame), 6)), (uid, t)
    # boundary checks the loop already covers, made explicit:
    # at t=3600 the frame [0, 3600] includes t=0 (inclusive lower bound)
    assert got[(1, 3600.0)][0] == 4
    # at t=3601 the frame [1, 3601] drops t=0 but keeps 10/3000/3600/3601
    assert got[(1, 3601.0)] == (4, round(10.0 + 3000.0 + 3600.0 + 3601.0, 6))


# ---------------------------------------------------------------- linkage
def test_fuzzy_join_and_best_matches(spark):
    left = spark.createDataFrame(
        [(1, "acme widgets"), (2, "acme widget"), (3, "zenith gears"),
         (4, "apex gears")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "acme widgets inc"), (11, "acme wdget"), (12, "zenth gears")],
        "id long, name string",
    )
    m = fuzzy_join(
        left, right, "name", "name", "id", "id",
        block_first_token(F.col("name")), block_first_token(F.col("name")),
        max_dist=2,
    )
    pairs = {(r["l_id"], r["r_id"]): r["dist"] for r in m.collect()}
    # "acme widget(s)" vs "acme wdget": dists 2 and 1; "inc" suffix is 4 away
    assert pairs == {(1, 11): 2, (2, 11): 1}
    # suffix blocking catches the head-typo pair first-token blocking missed
    m2 = fuzzy_join(
        left, right, "name", "name", "id", "id",
        block_suffix(F.col("name"), 5), block_suffix(F.col("name"), 5),
        max_dist=2,
    )
    pairs2 = {(r["l_id"], r["r_id"]): r["dist"] for r in m2.collect()}
    assert pairs2[(3, 12)] == 1  # "zenith gears" ~ "zenth gears"
    # "apex gears" blocks with the same " gears" suffix but is 4 edits
    # from "zenth gears" - candidate generated, verify rejects it
    assert (4, 12) not in pairs2

    best = {r["r_id"]: (r["l_id"], r["dist"])
            for r in best_matches(m, per="r_id").collect()}
    assert best[11] == (2, 1)  # min dist wins


def test_fuzzy_join_null_names_never_match(spark):
    left = spark.createDataFrame([(1, None), (2, "ab")], "id long, name string")
    right = spark.createDataFrame([(10, "ab")], "id long, name string")
    m = fuzzy_join(
        left, right, "name", "name", "id", "id",
        F.lit("x"), F.lit("x"), max_dist=5,
    )
    assert [(r["l_id"], r["r_id"]) for r in m.collect()] == [(2, 10)]


# ---------------------------------------------------------------- jackknife
def test_jackknife_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    n, G = 400, 10
    y = rng.normal(50, 4, n)
    w = rng.uniform(1, 3, n)
    df = spark.createDataFrame(
        [(i, float(y[i]), float(w[i])) for i in range(n)],
        "id long, y double, w double",
    )
    row = jackknife_mean(df, "y", "id", weight_col="w", n_groups=G).collect()[0]
    g = np.arange(n) % G
    theta = (w * y).sum() / w.sum()
    reps = np.array([
        ((w * y)[g != k].sum()) / (w[g != k].sum()) for k in range(G)
    ])
    v = (G - 1) / G * ((reps - theta) ** 2).sum()
    assert row["mean"] == pytest.approx(theta, abs=1e-6)
    assert row["se_jk"] == pytest.approx(v ** 0.5, abs=1e-6)
    assert row["n_groups"] == G
    # jackknife SE of an unweighted mean ~ classic SE of the mean
    row2 = jackknife_mean(df, "y", "id", n_groups=G).collect()[0]
    classic = y.std(ddof=1) / n ** 0.5
    assert 0.7 < row2["se_jk"] / classic < 1.4


def test_jackknife_rejects_single_group(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, y double")
    with pytest.raises(ValueError):
        jackknife_mean(df, "y", "id", n_groups=1)
