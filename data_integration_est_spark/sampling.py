"""Distributed sampling kernels (SURVEY.md §2.1 S5-S8).

All samplers return the input DataFrame with a 0/1 indicator column — the
reference's representation (samples are rows of one table selected by an
indicator, never separate physical partitions).  Determinism: every draw is
a pure function of (id column, seed) via ``rng.uniform``, so results are
identical across partitionings and cluster sizes.

Scale notes:
- exact-size SRS / weighted SRS are global top-n problems; we use
  ``orderBy(key).limit(n)`` which Spark executes as per-partition partial
  top-n + a single merge of n rows — no full sort materializes.
- the selected-id set (n rows, sample-sized << N) is broadcast-joined back
  as the indicator flag.
- stratified exact-size sampling uses a window ranked *within* strata —
  partition-parallel across strata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_integration_est_spark import rng


def srs_exact(
    df: DataFrame, id_col: str, n: int, seed: int, out_col: str = "ind", tag: str = "srs"
) -> DataFrame:
    """Simple random sample without replacement, exact size n — R's
    ``sample(1:N, size, replace=FALSE)`` (reference ``nb[2]:40-42``)."""
    chosen = (
        df.select(F.col(id_col).alias("__sid__"))
        .withColumn("__key__", rng.uniform(["__sid__"], seed, tag))
        .orderBy("__key__", "__sid__")
        .limit(n)
        .select("__sid__")
        .withColumn(out_col, F.lit(1))
    )
    joined = df.join(
        F.broadcast(chosen), on=df[id_col] == chosen["__sid__"], how="left"
    ).drop("__sid__")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)))


def weighted_srs_exact(
    df: DataFrame,
    id_col: str,
    n: int,
    prob_col: str,
    seed: int,
    out_col: str = "ind",
    tag: str = "wsrs",
) -> DataFrame:
    """Unequal-probability sampling without replacement, exact size n —
    R's ``sample(1:N, n, prob=p)`` (reference ``nb[18]:41-42``).

    Efraimidis-Spirakis A-ES: each row draws key = -log(u)/p (exponential
    with rate p); the n SMALLEST keys form the sample.  Expressible as the
    same top-n + broadcast-flag pattern as ``srs_exact``.
    """
    chosen = (
        df.select(F.col(id_col).alias("__sid__"), F.col(prob_col).cast("double").alias("__p__"))
        .withColumn("__key__", -F.log(rng.uniform(["__sid__"], seed, tag)) / F.col("__p__"))
        .orderBy("__key__", "__sid__")
        .limit(n)
        .select("__sid__")
        .withColumn(out_col, F.lit(1))
    )
    joined = df.join(
        F.broadcast(chosen), on=df[id_col] == chosen["__sid__"], how="left"
    ).drop("__sid__")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)))


def stratified_exact(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    n_per_stratum: dict | int,
    seed: int,
    out_col: str = "ind",
    tag: str = "strat",
) -> DataFrame:
    """Per-stratum exact-size SRS — dplyr ``group_by(stratum) %>% sample_n``
    (reference ``nb[7]:44-47``, ``nb[2]:45-49``).

    Ranked window partitioned by stratum: parallel across strata; no global
    sort.  ``n_per_stratum``: either one size for all strata or a
    {stratum_value: n} dict (broadcast as a literal map via when-chains).
    """
    key = rng.uniform([id_col], seed, tag)
    w = Window.partitionBy(stratum_col).orderBy(key.asc(), F.col(id_col).asc())
    ranked = df.withColumn("__rn__", F.row_number().over(w))
    if isinstance(n_per_stratum, int):
        cond = F.col("__rn__") <= F.lit(n_per_stratum)
    else:
        limit = F.lit(None)
        for sv, nv in n_per_stratum.items():
            limit = F.when(F.col(stratum_col) == F.lit(sv), F.lit(int(nv))).otherwise(limit)
        cond = F.col("__rn__") <= limit
    return ranked.withColumn(out_col, F.when(cond, 1).otherwise(0)).drop("__rn__")


def stratified_exact_threshold(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    n_per_stratum: dict,
    seed: int,
    out_col: str = "ind",
    tag: str = "strat",
    slack_sigmas: float = 8.0,
) -> DataFrame:
    """Two-phase exact-size stratified SRS for HUGE strata — selects the
    IDENTICAL sample as ``stratified_exact`` (same hash keys, same
    order-statistic cut) without pushing every stratum row through one
    ranked-window task.

    Phase 1 (parallel scan, no shuffle): keep rows whose uniform key is
    below t_h = (n_h + slack·sqrt(n_h) + 10) / N_h — the n_h smallest
    keys of stratum h are all below t_h whenever at least n_h keys are
    (Binomial concentration makes the miss probability < 1e-12 at 8
    sigmas).  Phase 2: rank ONLY the ~n_h(1+ε) candidates per stratum —
    the window input is sample-sized, not population-sized.  A per-
    stratum candidate count check (tiny agg) falls back to the full
    window in the astronomically-unlikely undershoot.

    Use this (or let callers choose) when max stratum size ≫ what one
    task should sort; the plain window version stays the default for the
    reference's 4-small-strata workloads.  See SCALE.md."""
    sizes = {
        r[stratum_col]: int(r["__n__"])
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n__")).collect()
    }
    thresholds = {}
    for sv, n_h in n_per_stratum.items():
        N_h = sizes.get(sv, 0)
        if N_h <= 0:
            continue
        t = (n_h + slack_sigmas * (n_h ** 0.5) + 10.0) / N_h
        thresholds[sv] = min(1.0, t)

    # the key hashes the id VALUES, so computing it on the renamed column
    # yields bit-identical keys to stratified_exact's
    key = rng.uniform(["__sid__"], seed, tag)
    thr = F.lit(None).cast("double")
    for sv, t in thresholds.items():
        thr = F.when(F.col("__st__") == F.lit(sv), F.lit(float(t))).otherwise(thr)
    cand = (
        df.select(F.col(id_col).alias("__sid__"), F.col(stratum_col).alias("__st__"))
        .withColumn("__key__", key)
        .filter(F.col("__key__") < thr)
    )

    got = {
        r["__st__"]: int(r["__n__"])
        for r in cand.groupBy("__st__").agg(F.count(F.lit(1)).alias("__n__")).collect()
    }
    for sv, n_h in n_per_stratum.items():
        if sizes.get(sv, 0) >= n_h and got.get(sv, 0) < n_h:
            # < 1e-12 event (or an adversarial key distribution): fall back
            return stratified_exact(
                df, id_col, stratum_col, n_per_stratum, seed, out_col, tag
            )

    w = Window.partitionBy("__st__").orderBy(F.col("__key__").asc(), F.col("__sid__").asc())
    limit = F.lit(None)
    for sv, nv in n_per_stratum.items():
        limit = F.when(F.col("__st__") == F.lit(sv), F.lit(int(nv))).otherwise(limit)
    chosen = (
        cand.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= limit)
        .select("__sid__")
        .withColumn(out_col, F.lit(1))
    )
    joined = df.join(
        F.broadcast(chosen), on=df[id_col] == chosen["__sid__"], how="left"
    ).drop("__sid__")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0)))


def grouped_exact(
    df: DataFrame,
    key_cols: list[str],
    group_cols: list[str],
    n,
    seed: int,
    prob_col: str | None = None,
    out_col: str = "ind",
    tag: str = "grp",
    stream: str = "xxhash64",
) -> DataFrame:
    """Exact-size sampling WITHIN each group — the Monte Carlo-vectorized
    form of ``srs_exact`` / ``weighted_srs_exact`` (SURVEY.md §2.8 O1/O2):
    one window ranked per (gamma, sim_id, ...) group replaces n_sim
    independent driver-side draws.

    ``key_cols`` seed the per-row randomness (must include the replicate
    keys so draws are independent across groups).  With ``prob_col``,
    Efraimidis-Spirakis keys give an unequal-probability draw.  ``n``:
    an int (same size every group), a Column (per-row group-size, e.g. a
    broadcast-joined per-(sim, stratum) allocation), or a column name.
    Scale: the window partitions by group — parallel across the whole
    grid, one shuffle total for ALL replicates.  ``stream="md5"`` draws
    the ranking keys from the engine-portable hash stream (``rng``), so
    the selected SET replays in a SQL oracle."""
    u = rng.uniform(key_cols, seed, tag, stream=stream)
    if prob_col is not None:
        key = -F.log(u) / F.col(prob_col).cast("double")
    else:
        key = u
    limit = F.lit(n) if isinstance(n, int) else (F.col(n) if isinstance(n, str) else n)
    w = Window.partitionBy(*group_cols).orderBy(key.asc(), *[F.col(c) for c in key_cols])
    ranked = df.withColumn("__rn__", F.row_number().over(w))
    return ranked.withColumn(
        out_col, F.when(F.col("__rn__") <= limit, 1).otherwise(0)
    ).drop("__rn__")


def bernoulli_sample(
    df: DataFrame,
    id_col: str,
    prob,
    seed: int,
    out_col: str = "ind",
    tag: str = "pois",
) -> DataFrame:
    """Poisson/Bernoulli sampling — ``rbinom(N, 1, prob)`` per row
    (reference ``nb[7]:69,77``).  ``prob``: float or Column."""
    return df.withColumn(out_col, rng.bernoulli([id_col], seed, prob, tag))


def _n_psu_limit(stratum_col: str, n_psu: dict) -> F.col:
    """Per-stratum CASE over the n_psu dict, raising at EXECUTION time on
    any observed stratum value missing from the dict (r16, ADVICE r15 #2
    — the NULL default silently selected ZERO PSUs there).  raise_error
    keeps the validation free: no extra distinct-strata pass."""
    limit = None
    for sv, nv in n_psu.items():
        cond = F.col(stratum_col) == F.lit(sv)
        limit = (
            F.when(cond, F.lit(int(nv))) if limit is None
            else limit.when(cond, F.lit(int(nv)))
        )
    err = F.expr(
        "raise_error(concat('cluster_sample: stratum ', "
        f"coalesce(cast({stratum_col} as string), '<null>'), "
        "' missing from the n_psu dict — pass an explicit size "
        "(0 to skip the stratum)'))"
    ).cast("int")
    return limit.otherwise(err)


def cluster_sample(
    df: DataFrame,
    psu_col: str,
    n_psu: dict | int,
    seed: int,
    stratum_col: str | None = None,
    m_per_psu: int | None = None,
    id_col: str | None = None,
    out_col: str = "ind",
    weight_col: str | None = None,
    tag: str = "cluster",
    stream: str = "xxhash64",
    method: str = "srs",
) -> DataFrame:
    """Two-stage cluster sampling (r15 — the S-family generator that
    pairs with the ``SurveyDesign(psu_col=)`` estimators): stage 1
    draws PSUs (per stratum when ``stratum_col`` is given; PSUs must
    nest within strata), stage 2 optionally draws an exact-size SRS of
    ``m_per_psu`` elements within each selected PSU (needs ``id_col``).
    ``svydesign(ids=~psu)``'s sampling-side counterpart.

    ``method`` (r16 — r15 verdict #5):

    - ``"srs"`` — exact-size SRS of ``n_psu`` PSUs; first-stage weight
      N_psu_h / n_sel_h.
    - ``"pps"`` — POISSON PPS by PSU size: PSU c enters independently
      with pi_c = min(1, n_psu * M_c / sum_h M), first-stage weight
      1 / pi_c — the exact HT inverse-inclusion weight, and the
      with-replacement-style first stage the ``psu_col`` estimators'
      linearization actually assumes.  Realized PSU count is random
      with mean <= n_psu (equality when no pi caps at 1).

    Randomness is the ``rng`` keyed-hash discipline: the PSU draw keys
    on the PSU id, the element draw on the element id — deterministic,
    partition-independent, and with ``stream="md5"`` every draw (hence
    the full MEMBERSHIP) replays bit-for-bit in any engine with md5,
    which is what the gate rows hash-check.

    Scale shape: stage 1 ranks (srs) or thresholds (pps) a PSU-LEVEL
    aggregate — one map-side-combined groupBy of the data, then a
    per-stratum window over the small PSU table (srs; pps needs only
    per-stratum totals) or a distributed TakeOrdered / one scalar agg
    when unstratified.  Stage 2 is one window over the data partitioned
    by PSU — computed ONLY over rows of selected PSUs (r16, r15 verdict
    #6: the selected set broadcast-inner-joins first, so stage-2 work
    is O(sampled data) at any sampling fraction; unselected rows rejoin
    via a broadcast anti-join with ind=0, no window, no sort).  Nothing
    wider than the PSU id ever shuffles; no driver collection beyond
    one scalar in the unstratified branches.

    Per-stratum ``n_psu`` dicts must cover every observed stratum — a
    missing stratum raises at execution time (ADVICE r15 #2; pass 0 to
    deliberately skip a stratum).

    With ``weight_col`` set, sampled rows carry the two-stage design
    weight w1 * (M_c / m_sel_c) — the exact inverse-inclusion HT weight
    under realized sizes; unsampled rows get NULL.  Feeding the result
    into ``SurveyDesign(weight_col=..., strata_col=..., psu_col=...)``
    closes the generate -> estimate loop."""
    if m_per_psu is not None and id_col is None:
        raise ValueError("stage-2 subsampling (m_per_psu) needs id_col")
    if method not in ("srs", "pps"):
        raise ValueError(f"method must be 'srs' or 'pps'; got {method!r}")
    skeys = [stratum_col] if stratum_col else []
    psus = df.groupBy(*skeys, psu_col).agg(F.count(F.lit(1)).alias("__M__"))
    key = rng.uniform([psu_col], seed, f"{tag}:psu", stream=stream)
    if stratum_col:
        if isinstance(n_psu, int):
            limit = F.lit(n_psu)
        else:
            limit = _n_psu_limit(stratum_col, n_psu)
        if method == "srs":
            wrank = Window.partitionBy(stratum_col).orderBy(
                key.asc(), F.col(psu_col).asc()
            )
            wcnt = Window.partitionBy(stratum_col)
            ranked = psus.withColumn("__rn__", F.row_number().over(wrank)) \
                         .withColumn("__Npsu__", F.count(F.lit(1)).over(wcnt))
            sel = ranked.filter(F.col("__rn__") <= limit).withColumn(
                "__w1__",
                F.col("__Npsu__").cast("double")
                / F.least(limit, F.col("__Npsu__")).cast("double"),
            )
        else:
            wtot = Window.partitionBy(stratum_col)
            pi = F.least(
                F.lit(1.0),
                limit.cast("double") * F.col("__M__").cast("double")
                / F.sum("__M__").over(wtot).cast("double"),
            )
            sel = (
                psus.withColumn("__pi__", pi)
                .filter(key < F.col("__pi__"))
                .withColumn("__w1__", F.lit(1.0) / F.col("__pi__"))
                .drop("__pi__")
            )
    else:
        if not isinstance(n_psu, int):
            raise ValueError("per-stratum n_psu dict needs stratum_col")
        if method == "srs":
            n_tot = psus.count()
            sel = (
                psus.withColumn("__key__", key)
                .orderBy("__key__", psu_col)
                .limit(n_psu)
                .drop("__key__")
                .withColumn(
                    "__w1__", F.lit(float(n_tot) / float(min(n_psu, n_tot)))
                )
            )
        else:
            m_tot = psus.agg(F.sum("__M__")).first()[0]
            pi = F.least(
                F.lit(1.0),
                F.lit(float(n_psu)) * F.col("__M__").cast("double")
                / F.lit(float(m_tot)),
            )
            sel = (
                psus.withColumn("__pi__", pi)
                .filter(key < F.col("__pi__"))
                .withColumn("__w1__", F.lit(1.0) / F.col("__pi__"))
                .drop("__pi__")
            )
    sel = sel.select(
        F.col(psu_col).alias("__spsu__"), "__M__", "__w1__"
    )
    # selected branch: broadcast INNER join, so the stage-2 ranking
    # window only ever sees rows of sampled PSUs
    hit = df.join(
        F.broadcast(sel), on=df[psu_col] == F.col("__spsu__"), how="inner"
    ).drop("__spsu__")
    if m_per_psu is None:
        hit = hit.withColumn(out_col, F.lit(1))
        w = F.col("__w1__")
    else:
        ekey = rng.uniform([id_col], seed, f"{tag}:el", stream=stream)
        wel = Window.partitionBy(psu_col).orderBy(
            ekey.asc(), F.col(id_col).asc()
        )
        hit = hit.withColumn("__ern__", F.row_number().over(wel))
        hit = hit.withColumn(
            out_col, F.when(F.col("__ern__") <= m_per_psu, 1).otherwise(0)
        )
        w = F.when(
            F.col(out_col) == 1,
            F.col("__w1__") * F.col("__M__").cast("double")
            / F.least(F.lit(m_per_psu), F.col("__M__")).cast("double"),
        )
    if weight_col is not None:
        hit = hit.withColumn(weight_col, w)
    hit = hit.drop("__M__", "__w1__", "__ern__")
    miss = df.join(
        F.broadcast(sel.select("__spsu__")),
        on=df[psu_col] == F.col("__spsu__"),
        how="left_anti",
    ).withColumn(out_col, F.lit(0))
    if weight_col is not None:
        miss = miss.withColumn(weight_col, F.lit(None).cast("double"))
    return hit.unionByName(miss)
