"""Replicate-weights survey designs — ``survey::svrepdesign`` /
``as.svrepdesign`` / ``withReplicates`` parity (r16).

The linearization kernels (``kernels.stats``) cover the moment
statistics on every design shape, but three statistics on CALIBRATED
CLUSTER designs have no closed linearized form that collapses to PSU
totals (svyquantile / svyglm / svycov — the ``_psu_refuses_calibration``
refusal class, ``kernels/stats.py``).  Replicate weights close all of
them at once, the way the survey package does: materialize G replicate
weight COLUMNS on the data once — each replicate drops a PSU group (or
flips a BRR half-sample), re-scales the survivors, and RE-CALIBRATES
them to the same population totals — then run ANY estimator under each
weight column and read the variance off the spread:

    V = mult * sum_g (theta_g - theta_full)^2 .

Replicate construction (one pass + driver solves, reference semantics
``survey::as.svrepdesign(type="JKn"/"BRR"/"Fay")`` generalized to
Kott's delete-a-group jackknife):

- ``method="dagjk"`` — Kott (2001)'s delete-a-group jackknife,
  STRATIFIED: PSUs are assigned to G deterministic groups
  (``psu % G`` — SQL-portable, the ``kernels.replicate`` contract);
  replicate g deletes group g's PSUs in EVERY stratum and re-scales
  the retained weights of stratum h by ``n_h / (n_h - m_hg)``
  (n_h = sampled PSUs in h, m_hg = those in group g), preserving each
  stratum's weight total — the within-stratum deletion that keeps the
  between-stratum variance reduction an unstratified DAGJK discards
  (the documented conservatism of
  ``kernels.replicate.jackknife_psu_calibrated_mean``).
  ``mult = (G-1)/G``.
- ``method="brr"`` / ``"fay"`` — balanced repeated replication over
  2-PSU-per-stratum designs (the ``kernels.replicate.brr_mean`` sign
  discipline: Sylvester-Hadamard columns, ``R`` = smallest power of two
  > #strata, Fay factor ``k = 1 - fay_rho``), as weight COLUMNS
  ``w_r = w (1 + k s(r,h) (1-2p))`` so any kernel can consume them.
  ``mult = 1 / (R k^2)``.

Calibrated designs (``design.is_calibrated``): replicate weights start
from the BASE weights, re-scale, then re-solve the GREG lambda per
replicate against the same totals — recovered exactly from the full
calibrated weights (``T_j = sum w x_j`` holds by the calibration
constraint), so no totals need to be passed again.  The per-replicate
Grams assemble from ONE distributed pass of per-(stratum, group) [or
per-(stratum, psu) for BRR] sufficient statistics; G (or R) k x k
driver solves; the data is never rescanned per replicate.

Scale shape of the result: the design's DataFrame gains G numeric
columns — ~8G bytes/row, no shuffle, no materialization until an
estimator consumes them; every ``*_rep`` estimator below is a single
map-side-combined aggregation pass (or, for the quantile, the shared
histogram-bisection passes) carrying all replicates side by side.
Beyond the fixed kernels, :func:`with_replicates` runs ANY
moment-expressible statistic (a function of weighted sums) for all
replicates in the same one-pass shape — :func:`svycorr_rep` is its
first client — and :func:`svyby_rep` extends the pass to unbounded
DOMAIN counts with the estimates and SEs as pure column expressions.

No reference-file citation: the reference constructs only ``ids=~1``
linearization designs (``RegDI2.R:181-193``); this module is the
replicate-variance counterpart a survey user reaches for first.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.linalg import _solve_stacked
from data_integration_est_spark.util import local_df


@dataclass
class ReplicateDesign:
    """A data frame carrying the full weight plus G replicate weight
    columns, and the variance rule ``V = mult * sum_g (theta_g -
    theta)^2``.  Build with :func:`replicate_design`."""

    df: DataFrame
    weight_col: str
    rep_cols: list[str]
    mult: float
    method: str
    strata_col: str | None = None
    psu_col: str | None = None
    meta: dict = field(default_factory=dict)

    @property
    def n_reps(self) -> int:
        return len(self.rep_cols)


def _rep_se(theta: float, thetas: list[float], mult: float) -> float | None:
    """sqrt(mult * sum (theta_g - theta)^2); None when any replicate is
    missing/non-finite (a degenerate replicate invalidates the spread —
    the survey package errors; we NULL the SE and keep the point)."""
    vals = []
    for t in thetas:
        if t is None or not np.isfinite(t):
            return None
        vals.append(float(t))
    ss = sum((t - theta) ** 2 for t in vals)
    return float(np.sqrt(mult * ss))


def replicate_design(
    design: SurveyDesign,
    method: str = "dagjk",
    n_groups: int = 20,
    fay_rho: float = 0.0,
    unit_col: str | None = None,
    prefix: str = "__rw_",
) -> ReplicateDesign:
    """Materialize replicate weight columns for ``design`` — the
    ``as.svrepdesign`` analogue (module docstring for semantics).

    ``unit_col`` overrides the first-stage unit (defaults to
    ``design.psu_col``; pass the element id column to jackknife an
    element design).  Unit ids must be non-negative integers (the
    deterministic ``unit % G`` grouping contract).  ``fpc_col`` is not
    consumed: replicate variances are with-replacement-style, like the
    jackknife/BRR they implement — use the linearization kernels when
    an FPC matters.

    One distributed pass collects per-(stratum, group) sufficient
    statistics (counts; plus the base-weight Gram and the calibrated
    totals when ``design.is_calibrated``); the replicate columns are
    pure column expressions over a broadcast scale table.
    """
    if method == "dagjk":
        return _dagjk_design(design, n_groups, unit_col, prefix)
    if method in ("brr", "fay"):
        rho = fay_rho if method == "fay" else 0.0
        if method == "fay" and not (0.0 < fay_rho < 1.0):
            raise ValueError("method='fay' needs 0 < fay_rho < 1")
        return _brr_design(design, rho, prefix)
    raise ValueError(f"method must be 'dagjk', 'brr', or 'fay'; got {method!r}")


def _dagjk_design(
    design: SurveyDesign, n_groups: int, unit_col: str | None, prefix: str
) -> ReplicateDesign:
    if n_groups < 2:
        raise ValueError("delete-a-group jackknife needs at least 2 groups")
    unit = unit_col or design.psu_col
    if unit is None:
        raise ValueError(
            "dagjk needs a first-stage unit: set design.psu_col or pass "
            "unit_col (the element id column for an element design)"
        )
    G = n_groups
    strat = design.strata_col
    hcols = [strat] if strat else []
    cal = design.is_calibrated
    d_col = design.base_weight_col if cal else design.weight_col
    xcols = list(design.calibration_cols) if cal else []
    k = len(xcols)

    d = F.col(d_col).cast("double")
    w_full = F.col(design.weight_col).cast("double")
    g_expr = F.pmod(F.col(unit).cast("long"), F.lit(G))
    subset = list(dict.fromkeys(
        [unit, d_col, design.weight_col] + xcols + hcols
    ))
    df = design.df
    src = df.na.drop(subset=subset)

    aggs = [F.countDistinct(F.col(unit)).alias("__m__")]
    if cal:
        xs = [F.col(c).cast("double") for c in xcols]
        for i in range(k):
            aggs.append(F.sum(d * xs[i]).alias(f"dx_{i}"))
            aggs.append(F.sum(w_full * xs[i]).alias(f"wx_{i}"))
            for j in range(i, k):
                aggs.append(F.sum(d * xs[i] * xs[j]).alias(f"g_{i}_{j}"))
    cells = src.groupBy(*hcols, g_expr.alias("__g__")).agg(*aggs).collect()

    strata = sorted({(r[strat] if strat else None) for r in cells},
                    key=lambda v: (v is None, str(v)))
    hidx = {h: i for i, h in enumerate(strata)}
    H = len(strata)
    m = np.zeros((H, G))
    dx = np.zeros((H, G, k))
    gram = np.zeros((H, G, k, k))
    T = np.zeros(k)
    for r in cells:
        hi = hidx[r[strat] if strat else None]
        g = int(r["__g__"])
        m[hi, g] = int(r["__m__"])
        for i in range(k):
            dx[hi, g, i] = float(r[f"dx_{i}"] or 0.0)
            T[i] += float(r[f"wx_{i}"] or 0.0)
            for j in range(i, k):
                v = float(r[f"g_{i}_{j}"] or 0.0)
                gram[hi, g, i, j] = gram[hi, g, j, i] = v
    n_h = m.sum(axis=1)  # sampled units per stratum
    if m.sum() < G:
        raise ValueError(
            f"dagjk: only {int(m.sum())} distinct first-stage units for "
            f"{G} groups — empty groups replicate the full sample and "
            "DEFLATE the variance; lower n_groups"
        )
    full = m == n_h[:, None]
    if np.any(full & (m > 0)):
        hi, g = map(int, np.argwhere(full & (m > 0))[0])
        raise ValueError(
            f"dagjk: group {g} contains ALL {int(n_h[hi])} units of "
            f"stratum {strata[hi]!r} — the replicate would delete the "
            "stratum entirely; lower n_groups or collapse small strata"
        )
    # per-(stratum, group) retained-unit scale n_h / (n_h - m_hg)
    scale = n_h[:, None] / (n_h[:, None] - m)

    lam = None
    if cal:
        # replicate Gram / HT sums: sum_h scale_hg * (S_h. - S_hg)
        gram_h = gram.sum(axis=1)  # (H, k, k)
        dx_h = dx.sum(axis=1)      # (H, k)
        A = np.zeros((G, k, k))
        rhs = np.zeros((G, k))
        for g in range(G):
            Ag = np.zeros((k, k))
            dxg = np.zeros(k)
            for hi in range(H):
                s = scale[hi, g]
                Ag += s * (gram_h[hi] - gram[hi, g])
                dxg += s * (dx_h[hi] - dx[hi, g])
            A[g] = Ag
            rhs[g] = T - dxg
        lam = _solve_stacked(
            A, rhs[..., None], "replicate_design dagjk re-calibration"
        ).squeeze(-1)

    # materialize: broadcast the per-stratum scale vectors, then one
    # projection with G CASE expressions
    spark = df.sparkSession
    rep_cols = [f"{prefix}{g}__" for g in range(G)]
    if strat:
        key_schema = df.select(strat).schema.fields
        schema = StructType(list(key_schema) + [
            StructField(f"__sc_{g}__", DoubleType(), False) for g in range(G)
        ])
        rows = [
            (h,) + tuple(float(scale[hidx[h], g]) for g in range(G))
            for h in strata
        ]
        sdf = local_df(spark, rows, schema)
        out = df.join(F.broadcast(sdf), on=strat, how="left")
        sc_of = [F.col(f"__sc_{g}__") for g in range(G)]
    else:
        out = df
        sc_of = [F.lit(float(scale[0, g])) for g in range(G)]

    gcol = F.pmod(F.col(unit).cast("long"), F.lit(G))
    for g in range(G):
        base_g = d * sc_of[g]
        if cal:
            dot: Column = F.lit(0.0)
            for j, c in enumerate(xcols):
                dot = dot + F.lit(float(lam[g, j])) * F.col(c).cast("double")
            base_g = base_g * (F.lit(1.0) + dot)
        out = out.withColumn(
            rep_cols[g], F.when(gcol == g, F.lit(0.0)).otherwise(base_g)
        )
    if strat:
        out = out.drop(*[f"__sc_{g}__" for g in range(G)])
    return ReplicateDesign(
        df=out, weight_col=design.weight_col, rep_cols=rep_cols,
        mult=(G - 1.0) / G, method="dagjk",
        strata_col=strat, psu_col=design.psu_col,
        meta={"n_groups": G, "unit_col": unit, "calibrated": cal},
    )


def _brr_design(
    design: SurveyDesign, fay_rho: float, prefix: str
) -> ReplicateDesign:
    strat, psu = design.strata_col, design.psu_col
    if not strat or not psu:
        raise ValueError("brr needs strata_col and psu_col (2 PSUs/stratum)")
    cal = design.is_calibrated
    d_col = design.base_weight_col if cal else design.weight_col
    xcols = list(design.calibration_cols) if cal else []
    k_dim = len(xcols)
    df = design.df
    d = F.col(d_col).cast("double")
    w_full = F.col(design.weight_col).cast("double")
    subset = list(dict.fromkeys(
        [psu, strat, d_col, design.weight_col] + xcols
    ))
    src = df.na.drop(subset=subset)

    aggs: list = []
    if cal:
        xs = [F.col(c).cast("double") for c in xcols]
        for i in range(k_dim):
            aggs.append(F.sum(d * xs[i]).alias(f"dx_{i}"))
            aggs.append(F.sum(w_full * xs[i]).alias(f"wx_{i}"))
            for j in range(i, k_dim):
                aggs.append(F.sum(d * xs[i] * xs[j]).alias(f"g_{i}_{j}"))
    else:
        aggs.append(F.count(F.lit(1)).alias("__n__"))
    cells = src.groupBy(strat, F.col(psu).cast("long").alias("__p__")) \
               .agg(*aggs).collect()
    psus_of: dict = {}
    for r in cells:
        psus_of.setdefault(r[strat], set()).add(int(r["__p__"]))
    strata = sorted(psus_of, key=str)
    for h in strata:
        if psus_of[h] != {0, 1}:
            raise ValueError(
                f"brr: stratum {h!r} has PSUs {sorted(psus_of[h])}; BRR "
                "requires exactly two PSUs coded 0 and 1 per stratum"
            )
    H = len(strata)
    col_of = {h: i + 1 for i, h in enumerate(strata)}
    R = 4
    while R <= H:
        R *= 2
    kf = 1.0 - fay_rho

    lam = None
    if cal:
        # per-(stratum, psu) Gram cells -> R replicate Grams on the driver
        hidx = {h: i for i, h in enumerate(strata)}
        dx = np.zeros((H, 2, k_dim))
        gram = np.zeros((H, 2, k_dim, k_dim))
        T = np.zeros(k_dim)
        for r in cells:
            hi, p = hidx[r[strat]], int(r["__p__"])
            for i in range(k_dim):
                dx[hi, p, i] = float(r[f"dx_{i}"] or 0.0)
                T[i] += float(r[f"wx_{i}"] or 0.0)
                for j in range(i, k_dim):
                    v = float(r[f"g_{i}_{j}"] or 0.0)
                    gram[hi, p, i, j] = gram[hi, p, j, i] = v
        reps = np.arange(R, dtype=np.int64)[:, None]
        colm = np.array([col_of[h] for h in strata], dtype=np.int64)[None, :]
        masked = reps & colm
        nbits = max(1, int(R).bit_length())
        pop = ((masked[..., None] >> np.arange(nbits, dtype=np.int64)) & 1) \
            .sum(axis=-1)
        S = np.where(pop % 2 == 1, -1.0, 1.0)      # (R, H)
        F0 = 1.0 + kf * S                          # factor for psu 0
        F1 = 1.0 - kf * S
        A = np.einsum("rh,hij->rij", F0, gram[:, 0]) \
            + np.einsum("rh,hij->rij", F1, gram[:, 1])
        rhs = T[None, :] - (F0 @ dx[:, 0] + F1 @ dx[:, 1])
        lam = _solve_stacked(
            A, rhs[..., None], "replicate_design brr re-calibration"
        ).squeeze(-1)

    spark = df.sparkSession
    key_schema = df.select(strat).schema.fields
    schema = StructType(list(key_schema) + [
        StructField("__hcolmask__", LongType(), False)
    ])
    hdf = local_df(spark, [(h, col_of[h]) for h in strata], schema)
    out = df.join(F.broadcast(hdf), on=strat, how="left")
    p01 = F.lit(1.0) - F.lit(2.0) * F.col(psu).cast("double")
    rep_cols = [f"{prefix}{r}__" for r in range(R)]
    for r in range(R):
        sgn = F.lit(1.0) - F.lit(2.0) * F.pmod(
            F.bit_count(F.col("__hcolmask__").bitwiseAND(F.lit(r))), F.lit(2)
        ).cast("double")
        factor = F.lit(1.0) + F.lit(kf) * sgn * p01
        base_r = d * factor
        if cal:
            dot: Column = F.lit(0.0)
            for j, c in enumerate(xcols):
                dot = dot + F.lit(float(lam[r, j])) * F.col(c).cast("double")
            base_r = base_r * (F.lit(1.0) + dot)
        out = out.withColumn(rep_cols[r], base_r)
    out = out.drop("__hcolmask__")
    return ReplicateDesign(
        df=out, weight_col=design.weight_col, rep_cols=rep_cols,
        mult=1.0 / (R * kf * kf), method="fay" if fay_rho else "brr",
        strata_col=strat, psu_col=psu,
        meta={"fay_rho": fay_rho, "calibrated": cal},
    )


def _one_row(spark, fields: list[tuple], values: tuple) -> DataFrame:
    schema = StructType([
        StructField(n, t, True) for n, t in fields
    ])
    return local_df(spark, [values], schema)


def _round6(v):
    return None if v is None else round(float(v), 6)


def svymean_rep(rd: ReplicateDesign, y_col: str) -> DataFrame:
    """Weighted mean with replicate SE — ONE aggregation pass carrying
    the full and all replicate (sum wy, sum w) pairs side by side.
    Returns one row: (mean, se, n_reps)."""
    y = F.col(y_col).cast("double")
    src = rd.df.na.drop(subset=[y_col, rd.weight_col])
    cols = [rd.weight_col] + rd.rep_cols
    aggs = []
    for i, c in enumerate(cols):
        w = F.col(c).cast("double")
        aggs.append(F.sum(w * y).alias(f"swy_{i}"))
        aggs.append(F.sum(w).alias(f"sw_{i}"))
    r = src.agg(*aggs).first()
    theta = float(r["swy_0"]) / float(r["sw_0"])
    thetas = []
    for i in range(1, len(cols)):
        swg = r[f"sw_{i}"]
        thetas.append(
            None if not swg else float(r[f"swy_{i}"] or 0.0) / float(swg)
        )
    se = _rep_se(theta, thetas, rd.mult)
    return _one_row(
        src.sparkSession,
        [("mean", DoubleType()), ("se", DoubleType()),
         ("n_reps", LongType())],
        (_round6(theta), _round6(se), rd.n_reps),
    )


def svytotal_rep(rd: ReplicateDesign, y_col: str) -> DataFrame:
    """HT total with replicate SE.  One pass; one row (total, se, n_reps)."""
    y = F.col(y_col).cast("double")
    src = rd.df.na.drop(subset=[y_col, rd.weight_col])
    cols = [rd.weight_col] + rd.rep_cols
    aggs = [
        F.sum(F.col(c).cast("double") * y).alias(f"t_{i}")
        for i, c in enumerate(cols)
    ]
    r = src.agg(*aggs).first()
    theta = float(r["t_0"])
    thetas = [
        None if r[f"t_{i}"] is None else float(r[f"t_{i}"])
        for i in range(1, len(cols))
    ]
    se = _rep_se(theta, thetas, rd.mult)
    return _one_row(
        src.sparkSession,
        [("total", DoubleType()), ("se", DoubleType()),
         ("n_reps", LongType())],
        (_round6(theta), _round6(se), rd.n_reps),
    )


def svyratio_rep(rd: ReplicateDesign, num_col: str, den_col: str) -> DataFrame:
    """Ratio sum(w num)/sum(w den) with replicate SE (the smooth
    non-linear case replicate methods exist for).  One pass; one row."""
    yn = F.col(num_col).cast("double")
    yd = F.col(den_col).cast("double")
    src = rd.df.na.drop(subset=[num_col, den_col, rd.weight_col])
    cols = [rd.weight_col] + rd.rep_cols
    aggs = []
    for i, c in enumerate(cols):
        w = F.col(c).cast("double")
        aggs.append(F.sum(w * yn).alias(f"n_{i}"))
        aggs.append(F.sum(w * yd).alias(f"d_{i}"))
    r = src.agg(*aggs).first()
    theta = float(r["n_0"]) / float(r["d_0"])
    thetas = []
    for i in range(1, len(cols)):
        dg = r[f"d_{i}"]
        thetas.append(
            None if not dg else float(r[f"n_{i}"] or 0.0) / float(dg)
        )
    se = _rep_se(theta, thetas, rd.mult)
    return _one_row(
        src.sparkSession,
        [("ratio", DoubleType()), ("se", DoubleType()),
         ("n_reps", LongType())],
        (_round6(theta), _round6(se), rd.n_reps),
    )


def svycov_rep(rd: ReplicateDesign, y_col: str, x_col: str) -> DataFrame:
    """Design-weighted covariance cov_w(x, y) = (Σw·xy − Σw·x Σw·y / Σw)/Σw
    with replicate SE — one of the three statistics the calibrated-cluster
    linearization refuses.  One pass; one row (cov, se, n_reps)."""
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    src = rd.df.na.drop(subset=[y_col, x_col, rd.weight_col])
    cols = [rd.weight_col] + rd.rep_cols
    aggs = []
    for i, c in enumerate(cols):
        w = F.col(c).cast("double")
        aggs.append(F.sum(w).alias(f"sw_{i}"))
        aggs.append(F.sum(w * x).alias(f"sx_{i}"))
        aggs.append(F.sum(w * y).alias(f"sy_{i}"))
        aggs.append(F.sum(w * x * y).alias(f"sxy_{i}"))
    r = src.agg(*aggs).first()

    def _cov(i):
        sw = r[f"sw_{i}"]
        if not sw:
            return None
        sw = float(sw)
        return (float(r[f"sxy_{i}"] or 0.0)
                - float(r[f"sx_{i}"] or 0.0) * float(r[f"sy_{i}"] or 0.0) / sw
                ) / sw

    theta = _cov(0)
    thetas = [_cov(i) for i in range(1, len(cols))]
    se = _rep_se(theta, thetas, rd.mult)
    return _one_row(
        src.sparkSession,
        [("cov", DoubleType()), ("se", DoubleType()),
         ("n_reps", LongType())],
        (_round6(theta), _round6(se), rd.n_reps),
    )


def with_replicates(
    rd: ReplicateDesign,
    exprs: dict[str, Column | str],
    combine,
    name: str = "est",
    dropna: list[str] | None = None,
) -> DataFrame:
    """Generic replicate-variance estimation — the
    ``survey::withReplicates`` analogue, restricted (deliberately) to
    statistics expressible as a smooth function of WEIGHTED SUMS:
    ``theta = combine({k: sum(w * expr_k)})``.  That restriction is what
    keeps it Spark-first: instead of re-running an arbitrary estimator
    G+1 times (G+1 jobs, G+1 scans), ALL replicates' sums for ALL
    expressions ride ONE map-side-combined aggregation pass —
    O((G+1) x len(exprs)) cells on the driver, then G+1 cheap Python
    ``combine`` calls.  Covers means, totals, ratios, correlations,
    regression-through-moments, CVs, index numbers — anything
    moment-expressible; for statistics that genuinely need per-replicate
    re-estimation (quantiles, GLMs), use the dedicated one-pass kernels
    (:func:`svyquantile_rep`, :func:`svyglm_rep`).

    ``exprs`` maps names to Columns (or column-name strings); each is
    multiplied by the replicate weight and summed.  ``combine`` takes
    the {name: sum} dict and returns the statistic (float), or
    None/NaN for a degenerate replicate — which NULLs the SE per the
    :func:`_rep_se` contract.  ``dropna`` rows with NULLs in the listed
    columns are dropped first (the weight column is always included).

    Returns one row: (<name>, se, n_reps).
    """
    src = rd.df.na.drop(
        subset=list(dict.fromkeys([rd.weight_col] + (dropna or [])))
    )
    keys = list(exprs)
    cols = [rd.weight_col] + rd.rep_cols
    aggs = []
    for i, c in enumerate(cols):
        w = F.col(c).cast("double")
        for k in keys:
            e = exprs[k]
            e = F.col(e) if isinstance(e, str) else e
            aggs.append(F.sum(w * e.cast("double")).alias(f"s_{i}_{k}"))
    r = src.agg(*aggs).first()

    def sums(i: int) -> dict:
        return {k: float(r[f"s_{i}_{k}"] or 0.0) for k in keys}

    t0 = combine(sums(0))
    if t0 is None or not np.isfinite(float(t0)):
        raise ValueError(
            "with_replicates: combine() returned a degenerate value for "
            "the FULL-sample sums; the point estimate is undefined"
        )
    theta = float(t0)
    thetas = []
    for i in range(1, len(cols)):
        t = combine(sums(i))
        thetas.append(None if t is None else float(t))
    se = _rep_se(theta, thetas, rd.mult)
    return _one_row(
        src.sparkSession,
        [(name, DoubleType()), ("se", DoubleType()),
         ("n_reps", LongType())],
        (_round6(theta), _round6(se), rd.n_reps),
    )


def svycorr_rep(rd: ReplicateDesign, y_col: str, x_col: str) -> DataFrame:
    """Weighted Pearson correlation with replicate SE — a
    :func:`with_replicates` client: corr = C_xy / sqrt(C_xx C_yy) over
    weighted central moments, all G+1 replicates from the one sums
    pass.  One row: (corr, se, n_reps)."""
    y, x = F.col(y_col), F.col(x_col)

    def _corr(s: dict) -> float | None:
        n, sx, sy, sxx, syy, sxy = (
            s["n"], s["x"], s["y"], s["xx"], s["yy"], s["xy"])
        if n <= 0:
            return None
        cxy = sxy / n - (sx / n) * (sy / n)
        cxx = sxx / n - (sx / n) ** 2
        cyy = syy / n - (sy / n) ** 2
        den = cxx * cyy
        return None if den <= 0 else cxy / float(np.sqrt(den))

    return with_replicates(
        rd,
        {"n": F.lit(1.0), "x": x, "y": y,
         "xx": x * x, "yy": y * y, "xy": x * y},
        _corr, name="corr", dropna=[y_col, x_col],
    )


def svyby_rep(
    rd: ReplicateDesign,
    by: str | list[str],
    y_col: str,
    stat: str = "mean",
    den_col: str | None = None,
) -> DataFrame:
    """Per-domain statistics under a replicate design — the
    ``survey::svyby(..., design=svrepdesign)`` analogue, and the one
    ``*_rep`` estimator that must stay fully DISTRIBUTED: the scalar
    kernels above read G replicate scalars on the driver, but the
    domain count is unbounded, so here both the G+1 per-domain
    estimates and the replicate-spread SE are pure COLUMN EXPRESSIONS
    over ONE grouped map-side-combined aggregation pass — no collect,
    no driver loop; millions of domains ride a single shuffle whose
    payload is O(domains x G) cells.

    ``stat``: ``"mean"`` (weighted mean), ``"total"`` (HT total — a
    domain fully deleted by replicate g legitimately contributes
    theta_g = 0), or ``"ratio"`` (pass ``den_col``).  For mean/ratio,
    a replicate that EMPTIES a domain (replicate-weight sum 0) NULLs
    that domain's SE — the :func:`_rep_se` contract, expressed as
    NULL-propagating arithmetic.

    Returns (by..., <stat>, se, n) ordered by the ``by`` columns;
    estimates rounded to 6 dp like the scalar kernels.
    """
    group_cols = [by] if isinstance(by, str) else list(by)
    if stat not in ("mean", "total", "ratio"):
        raise ValueError(
            f"stat must be 'mean', 'total', or 'ratio'; got {stat!r}"
        )
    if stat == "ratio" and den_col is None:
        raise ValueError("stat='ratio' needs den_col")
    y = F.col(y_col).cast("double")
    subset = [y_col, rd.weight_col] + ([den_col] if stat == "ratio" else [])
    src = rd.df.na.drop(subset=subset)
    cols = [rd.weight_col] + rd.rep_cols
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i, c in enumerate(cols):
        w = F.col(c).cast("double")
        if stat == "total":
            aggs.append(F.sum(w * y).alias(f"a_{i}"))
        elif stat == "mean":
            aggs.append(F.sum(w * y).alias(f"a_{i}"))
            aggs.append(F.sum(w).alias(f"b_{i}"))
        else:
            den = F.col(den_col).cast("double")
            aggs.append(F.sum(w * y).alias(f"a_{i}"))
            aggs.append(F.sum(w * den).alias(f"b_{i}"))
    g = src.groupBy(*group_cols).agg(*aggs)

    def theta(i: int) -> Column:
        if stat == "total":
            return F.coalesce(F.col(f"a_{i}"), F.lit(0.0))
        # NULL when the replicate empties the domain (b == 0 or NULL)
        return F.when(
            F.col(f"b_{i}").isNotNull() & (F.col(f"b_{i}") != 0.0),
            F.coalesce(F.col(f"a_{i}"), F.lit(0.0)) / F.col(f"b_{i}"),
        )

    ss: Column = F.lit(0.0)
    for i in range(1, len(cols)):
        ss = ss + F.pow(theta(i) - theta(0), F.lit(2.0))
    out_name = {"mean": "mean", "total": "total", "ratio": "ratio"}[stat]
    return (
        g.select(
            *group_cols,
            F.round(theta(0), 6).alias(out_name),
            F.round(F.sqrt(F.lit(float(rd.mult)) * ss), 6).alias("se"),
            F.col("n"),
        )
        .orderBy(*group_cols)
    )


def _solve_quantiles_arr(
    spark,
    base: DataFrame,
    state: dict,
    bins: int,
    n_narrow: int,
) -> dict:
    """Histogram bisection over PER-REPLICATE weights — the
    ``kernels.quantile._solve_exact`` shape generalized to an ARRAY
    weight column: ``base`` exposes (__y__, __wa__) with __wa__ =
    [full, rep_1..G] weights; ``state`` maps slot -> {lo, hi, target,
    rep}; each histogram/final pass reads slot weights via
    ``element_at(__wa__, rep+1)``, so ALL replicates' quantiles ride
    the same n_narrow + 2 distributed passes over ONE persisted
    projection (no G+1-fold data blowup, no per-replicate rescans)."""
    bounds_schema = StructType([
        StructField("__qi__", LongType(), False),
        StructField("__rep__", LongType(), False),
        StructField("__lo__", DoubleType(), False),
        StructField("__hi__", DoubleType(), False),
    ])

    def _joined(entries: dict) -> DataFrame:
        rows = [(si, s["rep"], s["lo"], s["hi"]) for si, s in entries.items()]
        b = local_df(spark, rows, bounds_schema)
        return base.crossJoin(F.broadcast(b))

    wsel = F.element_at(F.col("__wa__"), (F.col("__rep__") + 1).cast("int"))

    for s in state.values():
        s["left"] = 0.0

    for _ in range(n_narrow):
        active = {si: s for si, s in state.items() if s["lo"] < s["hi"]}
        if not active:
            break
        joined = _joined(active)
        width = F.col("__hi__") - F.col("__lo__")
        binc = F.least(
            F.floor((F.col("__y__") - F.col("__lo__")) / width * bins),
            F.lit(bins - 1),
        ).cast("long")
        hist = (
            joined.filter(
                (F.col("__y__") >= F.col("__lo__"))
                & (F.col("__y__") <= F.col("__hi__"))
            )
            .groupBy("__qi__", binc.alias("__bin__"))
            .agg(F.sum(wsel).alias("__sw__"))
            .collect()
        )
        by_slot: dict[int, dict[int, float]] = {}
        for r in hist:
            by_slot.setdefault(int(r["__qi__"]), {})[int(r["__bin__"])] = \
                float(r["__sw__"] or 0.0)
        for si, s in active.items():
            bw_map = by_slot.get(si, {})
            lo, hi = s["lo"], s["hi"]
            bw = (hi - lo) / bins
            cum = s["left"]
            chosen = bins - 1
            for bi in range(bins):
                nxt = cum + bw_map.get(bi, 0.0)
                if nxt >= s["target"]:
                    chosen = bi
                    break
                cum = nxt
            s["left"] = cum
            new_lo, new_hi = lo + chosen * bw, lo + (chosen + 1) * bw
            s["lo"], s["hi"] = max(lo, new_lo), min(hi, new_hi)
            if not (s["lo"] < s["hi"]):
                s["lo"] = s["hi"] = max(lo, min(new_lo, hi))

    joined = _joined(state)
    fin_key = F.when(
        F.col("__y__") < F.col("__lo__"), F.lit(None).cast("double")
    ).otherwise(F.col("__y__"))
    fin = (
        joined.filter(F.col("__y__") <= F.col("__hi__"))
        .groupBy("__qi__", fin_key.alias("__y__"))
        .agg(F.sum(wsel).alias("__sw__"))
        .collect()
    )
    vals: dict[int, list] = {}
    left_exact: dict[int, float] = {}
    for r in fin:
        si = int(r["__qi__"])
        if r["__y__"] is None:
            left_exact[si] = float(r["__sw__"] or 0.0)
        else:
            vals.setdefault(si, []).append(
                (float(r["__y__"]), float(r["__sw__"] or 0.0))
            )
    out: dict[int, float] = {}
    for si, s in state.items():
        cum = left_exact.get(si, 0.0)
        ans = None
        for yv, sw in sorted(vals.get(si, [])):
            cum += sw
            if cum >= s["target"]:
                ans = yv
                break
        if ans is None:
            ans = s["hi"]
        out[si] = ans
    return out


def svyquantile_rep(
    rd: ReplicateDesign,
    y_col: str,
    qs: tuple = (0.5,),
    bins: int = 2048,
    n_narrow: int = 2,
) -> DataFrame:
    """Exact lower weighted quantiles with replicate SE — closing the
    calibrated-cluster svyquantile refusal (``_psu_refuses_calibration``):
    the point quantile under the full weights plus one quantile per
    replicate weight column, all solved together in the shared
    histogram-bisection passes (see :func:`_solve_quantiles_arr`).
    Returns (q, quantile, se, n_reps) per q."""
    if not qs or any(not (0.0 < q < 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1)")
    spark = rd.df.sparkSession
    y = F.col(y_col).cast("double")
    wa = F.array(*[
        F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        for c in [rd.weight_col] + rd.rep_cols
    ])
    base = rd.df.na.drop(subset=[y_col, rd.weight_col]).select(
        y.alias("__y__"), wa.alias("__wa__")
    ).persist()
    try:
        nrep = rd.n_reps
        sums = base.agg(
            F.min("__y__").alias("lo"),
            F.max("__y__").alias("hi"),
            *[
                F.sum(F.element_at(F.col("__wa__"), i + 1)).alias(f"W_{i}")
                for i in range(nrep + 1)
            ],
        ).first()
        lo, hi = float(sums["lo"]), float(sums["hi"])
        W = [float(sums[f"W_{i}"] or 0.0) for i in range(nrep + 1)]
        state: dict[int, dict] = {}
        for qi, q in enumerate(qs):
            for rep in range(nrep + 1):
                si = qi * (nrep + 1) + rep
                state[si] = {
                    "lo": lo, "hi": hi, "rep": rep,
                    "target": float(q) * W[rep],
                }
        sol = _solve_quantiles_arr(spark, base, state, bins, n_narrow)
        out_rows = []
        for qi, q in enumerate(qs):
            point = sol[qi * (nrep + 1)]
            thetas = [sol[qi * (nrep + 1) + rep] for rep in range(1, nrep + 1)]
            se = _rep_se(point, thetas, rd.mult)
            out_rows.append((float(q), _round6(point), _round6(se), nrep))
        schema = StructType([
            StructField("q", DoubleType(), False),
            StructField("quantile", DoubleType(), True),
            StructField("se", DoubleType(), True),
            StructField("n_reps", LongType(), False),
        ])
        return local_df(spark, sorted(out_rows), schema)
    finally:
        base.unpersist()


def svyglm_rep(
    rd: ReplicateDesign,
    formula,
    model_type: str = "normal",
) -> DataFrame:
    """Design-weighted GLM with replicate SEs — closing the
    calibrated-cluster svyglm refusal.  The full fit and every replicate
    fit run as ONE grouped fit over a replicate-exploded projection
    (group key = replicate index): the per-group Gram/IRLS machinery
    map-side-combines, so the shuffle carries O(reps × k²) cells —
    the arithmetic is exactly the per-replicate Grams, just computed in
    one pass instead of G+1 rescans.  Returns (term, coef, se) rows;
    a degenerate replicate (non-finite coefficients) NULLs the SEs.
    """
    from data_integration_est_spark.formula import Formula
    from data_integration_est_spark.kernels.linalg import (
        fit_logistic, fit_ols, fit_poisson,
    )

    f = Formula.parse(formula) if isinstance(formula, str) else formula
    xs = list(f.predictors)
    src = rd.df.na.drop(subset=[f.response, rd.weight_col] + xs)
    cols = [rd.weight_col] + rd.rep_cols
    long = src.select(
        f.response, *xs,
        F.posexplode(F.array(*[
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)) for c in cols
        ])).alias("__rep__", "__w_rep__"),
    )
    kwargs = dict(y_col=f.response, x_cols=xs, weight_col="__w_rep__",
                  intercept=f.intercept, group_cols=["__rep__"])
    if model_type == "normal":
        fit = fit_ols(long, **kwargs)
    elif model_type == "logistic":
        fit = fit_logistic(long, **kwargs)
    elif model_type == "poisson":
        fit = fit_poisson(long, **kwargs)
    else:
        raise ValueError(
            "model_type must be 'normal', 'logistic', or 'poisson'")
    terms = (["(Intercept)"] if f.intercept else []) + xs
    k = len(terms)
    beta = np.asarray(fit.coef_for((0,)), dtype=float)
    reps = np.full((rd.n_reps, k), np.nan)
    degenerate = set(fit.degenerate_keys)
    for g in range(1, rd.n_reps + 1):
        if (g,) in degenerate:
            continue
        reps[g - 1] = np.asarray(fit.coef_for((g,)), dtype=float)
    ok = np.all(np.isfinite(reps)) and np.all(np.isfinite(beta))
    se = (
        np.sqrt(rd.mult * ((reps - beta[None, :]) ** 2).sum(axis=0))
        if ok else None
    )
    rows = [
        (t, _round6(b), _round6(se[j]) if se is not None else None)
        for j, (t, b) in enumerate(zip(terms, beta))
    ]
    schema = StructType([
        StructField("term", StringType(), False),
        StructField("coef", DoubleType(), True),
        StructField("se", DoubleType(), True),
    ])
    return local_df(src.sparkSession, rows, schema)
