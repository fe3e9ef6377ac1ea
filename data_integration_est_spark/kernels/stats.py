"""Design-based survey statistics: HT totals, weighted means, and the
linearization variance of (calibrated) weighted means.

Engine-normative variance formulas (SURVEY.md §4.3-2; these are the
documented semantics our DuckDB oracles implement — parity with the
reference's ``survey::svymean`` linearization for element-level
with-replacement designs, ``ids=~1``; r7 adds ``fpc=`` — when the
design carries a population-size column, every stratum's variance
piece is scaled by the SRS-WOR correction (1 - n_h/N_h)):

- ``svytotal``:  T = sum_s w_i y_i,
  V = n/(n-1) * sum_s (w_i y_i - mean(w y))^2

- ``svymean``:   m = sum_s w_i y_i / sum_s w_i,
  influence u_i = w_i * e_i / sum_s w_i   with
  e_i = (y_i - m)                               (plain design), or
  e_i = (y_i - m) - x_i^T B                     (calibrated design), where
  B solves  (sum_s d_i x_i x_i^T) B = sum_s d_i x_i (y_i - m)
  over the *pre-calibration* weights d and the calibration design columns x
  (survey-package semantics: calibration replaces y by its residuals).
  V = n/(n-1) * sum_s (u_i - mean(u))^2

Everything is a 2-3 pass DataFrame aggregation; only O(k^2 * groups)
scalars reach the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.kernels.linalg import _solve_stacked
from data_integration_est_spark.util import local_df


@dataclass
class EstimateRow:
    key: tuple
    estimate: float
    variance: float
    n: int

    @property
    def se(self) -> float:
        return float(np.sqrt(self.variance))


def _collect_keyed(df: DataFrame, group_cols: list[str], aggs: list[Column]) -> dict[tuple, dict]:
    if group_cols:
        rows = df.groupBy(*group_cols).agg(*aggs).collect()
    else:
        rows = df.agg(*aggs).collect()
    return {tuple(r[c] for c in group_cols): r.asDict() for r in rows}


def weighted_mean(
    df: DataFrame, y_col: str, weight_col: str, group_cols: list[str] | None = None
) -> dict[tuple, float]:
    """Point estimate only: sum(w*y)/sum(w) per group."""
    group_cols = list(group_cols or [])
    w = F.col(weight_col).cast("double")
    y = F.col(y_col).cast("double")
    res = _collect_keyed(
        df.na.drop(subset=[y_col, weight_col]),
        group_cols,
        [F.sum(w * y).alias("__swy__"), F.sum(w).alias("__sw__")],
    )
    return {k: (r["__swy__"] or 0.0) / r["__sw__"] for k, r in res.items()}


def _fpc_factor(n_h: int, N_h: float | None) -> float:
    """SRS-WOR finite population correction (1 - n_h/N_h), clamped at 0
    (an impossible n_h > N_h means a mis-specified fpc column — treat
    as census rather than emit negative variance).  None -> 1."""
    if N_h is None:
        return 1.0
    return max(0.0, 1.0 - float(n_h) / float(N_h))


def _strat_var(pieces: list[tuple]) -> float:
    """Stratified with-replacement variance from per-stratum
    (n_h, sum_h u, sum_h u^2[, fpc_factor]) pieces: V = Σ_h f_h ·
    n_h/(n_h-1) · (Σ_h u² − (Σ_h u)²/n_h) —
    ``svydesign(ids=~1, strata=~h[, fpc=~N])``."""
    v = 0.0
    for piece in pieces:
        n_h, s1, s2 = piece[0], piece[1], piece[2]
        f_h = piece[3] if len(piece) > 3 else 1.0
        if n_h < 2:
            if f_h == 0.0:
                continue  # census stratum: zero variance regardless of df
            return float("nan")
        v += f_h * n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
    return v


def _psu_collapse(
    df: DataFrame,
    design: SurveyDesign,
    value_cols: list[str] | str,
    group_cols: list[str],
) -> tuple[DataFrame, dict | None]:
    """Two-stage cluster designs (``svydesign(ids=~psu)``, r14): collapse
    element rows to ONE pseudo-element per (group, stratum, PSU).

    The with-replacement first-stage linearization treats the weighted
    PSU total z_hc = Σ_{i∈c} w_i u_i as the sampling unit, so the
    element-level machinery applies unchanged to pseudo-elements with
    w' = Σ_{i∈c} w_i  and  v' = (Σ w_i v_i) / (Σ w_i)  per value
    column v: every w-weighted moment (Σw'v' = Σwv, Σw' = Σw) is
    preserved, and any w'²-Gram over [1, v1', v2', ...] is exactly the
    PSU-total Gram Σ_c (Σ_i w_i z_i)(Σ_i w_i z_j) the linearization
    needs — valid whenever the estimator's influence is LINEAR in the
    value columns (svymean/svytotal: [y]; svyratio: [num, den];
    svyvar: [y, y²] with y² materialized as its own element column
    BEFORE collapsing).  One extra map-side-combining groupBy — still a
    fully distributed two-level aggregation, no driver data.

    Returns (collapsed_df, full_psu_counts).  ``full_psu_counts`` maps
    each stratum value -> number of sampled PSUs in the FULL design; it
    is None when ``group_cols`` is empty (the in-group PSU count is
    already the full count).  For grouped/domain estimation the d.o.f.
    and (Σz)²/n_h term must use the full-design PSU count — PSUs with
    no in-domain elements contribute z = 0 to the stratum sums (which
    collapsing drops for free) but still count as sampled PSUs
    (``survey`` domain-estimation semantics).
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    strat, psu, fpc = design.strata_col, design.psu_col, design.fpc_col
    w = F.col(design.weight_col).cast("double")
    keys = group_cols + ([strat] if strat else []) + [psu]
    aggs = [F.sum(w).alias("__psu_w__")] + [
        F.sum(w * F.col(v).cast("double")).alias(f"__psu_wv_{i}__")
        for i, v in enumerate(value_cols)
    ]
    if fpc:
        aggs.append(F.max(F.col(fpc).cast("double")).alias(fpc))
    collapsed = (
        df.groupBy(*keys)
        .agg(*aggs)
        .select(
            *group_cols,
            *([strat] if strat else []),
            F.col("__psu_w__").alias(design.weight_col),
            *[
                (F.col(f"__psu_wv_{i}__") / F.col("__psu_w__")).alias(v)
                for i, v in enumerate(value_cols)
            ],
            *([fpc] if fpc else []),
        )
    )
    full_counts: dict | None = None
    if group_cols:
        if strat:
            rows = df.groupBy(strat).agg(
                F.countDistinct(psu).alias("__n_psu__")
            ).collect()
            full_counts = {r[strat]: int(r["__n_psu__"]) for r in rows}
        else:
            n = df.agg(F.countDistinct(psu)).first()[0]
            full_counts = {None: int(n)}
    return collapsed, full_counts


def _psu_refuses_calibration(design: SurveyDesign, what: str) -> None:
    if design.psu_col and design.is_calibrated:
        raise NotImplementedError(
            f"{what}: calibrated designs with a psu_col are not supported "
            "for this statistic — its linearized variable is not linear "
            "in PSU-collapsible columns the way the GREG residual is.  "
            "The four moment kernels (svymean/svytotal/svyratio/svyvar) "
            "DO support calibrated cluster designs (r15: element-level "
            "d-Gram for the residual projection B, then per-stratum PSU "
            "totals of w·e — survey::svyrecvar's shape); for anything "
            "else build a replicate-weights design "
            "(kernels.repweights.replicate_design, r16: stratified "
            "delete-a-group jackknife or BRR/Fay with per-replicate GREG "
            "re-calibration) and use svyquantile_rep / svyglm_rep / "
            "svycov_rep — or calibrate at the PSU level."
        )


def _cal_psu_core(
    design: SurveyDesign,
    value_cols: list[str],
    basis: list[Column],
    d_exprs: dict,
    group_cols: list[str],
):
    """Shared two-level scaffold for calibrated CLUSTER linearization
    (r15): level 1 groups by (group, stratum, PSU) carrying the
    w-weighted PSU totals t_u = Σ w·b_u of the statistic's ``basis``
    AND the element-level d-weighted sums in ``d_exprs`` (sums of sums
    = element sums); level 2 collapses to (group, stratum) with the
    PSU-total Gram q_{u,v} = Σ_c t_u t_v alongside.  Returns
    (items, full_psu_n, _f): per-key lists of (stratum, row) with
    s_u / q_{u,v} / the d aliases / n_psu / __N__, the full-design
    domain PSU counts, and the null-safe float reader."""
    strat, fpc, psu = design.strata_col, design.fpc_col, design.psu_col
    xcols = list(design.calibration_cols)
    subset = list(dict.fromkeys(
        value_cols + [design.weight_col, design.base_weight_col, psu]
        + xcols + ([strat] if strat else []) + ([fpc] if fpc else [])
    ))
    df = design.df.na.drop(subset=subset)
    w = F.col(design.weight_col).cast("double")
    hcols = [strat] if strat else []
    kb = len(basis)

    l1 = [F.sum(w * basis[u]).alias(f"t_{u}") for u in range(kb)]
    l1 += [F.sum(expr_).alias(name) for name, expr_ in d_exprs.items()]
    if fpc:
        l1.append(F.max(F.col(fpc).cast("double")).alias("__N__"))
    lvl1 = df.groupBy(*group_cols, *hcols, psu).agg(*l1)

    l2 = [F.count(F.lit(1)).alias("n_psu")]
    for u in range(kb):
        l2.append(F.sum(F.col(f"t_{u}")).alias(f"s_{u}"))
        for v in range(u, kb):
            l2.append(
                F.sum(F.col(f"t_{u}") * F.col(f"t_{v}")).alias(f"q_{u}_{v}")
            )
    for name in d_exprs:
        l2.append(F.sum(F.col(name)).alias(name))
    if fpc:
        l2.append(F.max("__N__").alias("__N__"))
    res = _collect_keyed(lvl1, group_cols + hcols, l2)

    full_psu_n = None
    if group_cols:
        cnt = df.groupBy(*hcols).agg(
            F.countDistinct(F.col(psu)).alias("__n__")
        ).collect()
        full_psu_n = {
            (r[strat] if strat else None): int(r["__n__"]) for r in cnt
        }

    def _f(r, name):
        v = r[name]
        return 0.0 if v is None else float(v)

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append((key[-1], r))
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [(None, r)]) for k, r in res.items()]
    return items, full_psu_n, _f


def _cal_psu_pieces(rows, full_psu_n, fpc, c, scale, kb, _f):
    """Per-stratum (n_h, s1, s2, fpc) pieces for a coefficient vector c
    over the PSU-total basis: s1 = c·s / scale, s2 = c'Qc / scale²."""
    pieces = []
    for hval, r in rows:
        n_h = full_psu_n[hval] if full_psu_n is not None else int(r["n_psu"])
        s_vec = np.array([_f(r, f"s_{u}") for u in range(kb)])
        Q = np.zeros((kb, kb))
        for u in range(kb):
            for v in range(u, kb):
                Q[u, v] = Q[v, u] = _f(r, f"q_{u}_{v}")
        pieces.append((
            n_h,
            float(c @ s_vec) / scale,
            float(c @ Q @ c) / (scale * scale),
            _fpc_factor(n_h, float(r["__N__"]) if fpc else None),
        ))
    return pieces


def _cal_psu_variance(pieces, strat):
    if strat:
        return _strat_var(pieces)
    n_h, s1, s2, f = pieces[0]
    if f == 0.0:
        return 0.0
    if n_h < 2:
        return float("nan")
    return f * n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)


def _cal_psu_linearized(
    design: SurveyDesign,
    y_col: str,
    group_cols: list[str],
    mode: str,
) -> list[EstimateRow]:
    """Calibrated CLUSTER designs for svymean/svytotal (r15 — upgrading
    the r14 refusal): ``survey::svyrecvar``'s two-grain shape in one
    two-level aggregation.

    The GREG residual projection B needs the ELEMENT-level d-Gram
    (Σ d x x' is not a PSU aggregate — the r14 refusal's correct
    half), but the influence z_i = w_i e_i = w_i(y_i − [m] − x_i'B)
    is LINEAR in (w, wy, wx_j) given the driver scalars (m, B), so its
    per-PSU totals are linear in the PSU totals t_c = (Σw, Σwy, Σwx_j)
    — and Σ_c z_c², the first-stage variance core, is a quadratic form
    in the PSU-TOTAL Gram Q_h = Σ_c t_c t_c'.  Level 1 groups by
    (group, stratum, PSU) carrying t_c AND the element d-Gram partials
    (sums of sums = element sums); level 2 collapses to
    (group, stratum) with Q_h alongside.  O(groups × strata × kx²)
    driver scalars; domain d.o.f. uses full-design PSU counts; fpc is
    the PSU-population count per stratum.  ``mode``: 'mean' (estimate
    m, rhs centered by m, influence /Σw) or 'total'."""
    xcols = list(design.calibration_cols)
    kx = len(xcols)
    kb = kx + 2  # PSU-total basis (w, wy, wx_1..kx)
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    d = F.col(design.base_weight_col).cast("double")
    basis = [F.lit(1.0), y] + xs
    d_exprs: dict = {}
    for i in range(kx):
        for j in range(i, kx):
            d_exprs[f"g_{i}_{j}"] = d * xs[i] * xs[j]
        d_exprs[f"gy_{i}"] = d * xs[i] * y
        d_exprs[f"g1_{i}"] = d * xs[i]
    items, full_psu_n, _f = _cal_psu_core(
        design, [y_col], basis, d_exprs, group_cols
    )
    strat, fpc = design.strata_col, design.fpc_col

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n_psu"]) for _, r in rows)
        sw = sum(_f(r, "s_0") for _, r in rows)
        t = sum(_f(r, "s_1") for _, r in rows)
        m = t / sw
        G = np.zeros((kx, kx))
        rhs = np.zeros(kx)
        for _, r in rows:
            for i in range(kx):
                for j in range(i, kx):
                    v = _f(r, f"g_{i}_{j}")
                    G[i, j] += v
                    if j != i:
                        G[j, i] += v
                rhs[i] += _f(r, f"gy_{i}")
                if mode == "mean":
                    rhs[i] -= m * _f(r, f"g1_{i}")
        B = _solve_stacked(
            G[None, ...], rhs[None, :, None],
            f"svy{mode} psu residual projection",
        ).ravel()
        c = np.concatenate(
            ([-m, 1.0] if mode == "mean" else [0.0, 1.0], -B)
        )
        scale = sw if mode == "mean" else 1.0
        pieces = _cal_psu_pieces(rows, full_psu_n, fpc, c, scale, kb, _f)
        v = _cal_psu_variance(pieces, strat)
        est = m if mode == "mean" else t
        out.append(EstimateRow(key=key, estimate=float(est),
                               variance=float(v), n=n))
    return out


def _svyratio_calibrated_psu(
    design: SurveyDesign,
    num_col: str,
    den_col: str,
    group_cols: list[str],
) -> list[EstimateRow]:
    """Calibrated cluster svyratio (r15): the GREG-residualized ratio
    influence z = w(num − R·den − xc'B)/Σw·den is linear in the PSU
    totals of (num, den, xc), so it rides ``_cal_psu_core`` with basis
    b = (num, den, xc_1..kx); B solves the element d-Gram against
    rhs_j = Σd xc_j num − R Σd xc_j den."""
    xcols = list(design.calibration_cols)
    kx = len(xcols)
    kb = kx + 2
    y = F.col(num_col).cast("double")
    x = F.col(den_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    d = F.col(design.base_weight_col).cast("double")
    basis = [y, x] + xs
    d_exprs: dict = {}
    for i in range(kx):
        for j in range(i, kx):
            d_exprs[f"g_{i}_{j}"] = d * xs[i] * xs[j]
        d_exprs[f"gy_{i}"] = d * xs[i] * y
        d_exprs[f"gx_{i}"] = d * xs[i] * x
    items, full_psu_n, _f = _cal_psu_core(
        design, [num_col, den_col], basis, d_exprs, group_cols
    )
    strat, fpc = design.strata_col, design.fpc_col

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n_psu"]) for _, r in rows)
        swy = sum(_f(r, "s_0") for _, r in rows)
        swx = sum(_f(r, "s_1") for _, r in rows)
        if swx == 0.0:
            out.append(EstimateRow(key=key, estimate=float("nan"),
                                   variance=float("nan"), n=n))
            continue
        R = swy / swx
        G = np.zeros((kx, kx))
        rhs = np.zeros(kx)
        for _, r in rows:
            for i in range(kx):
                for j in range(i, kx):
                    v = _f(r, f"g_{i}_{j}")
                    G[i, j] += v
                    if j != i:
                        G[j, i] += v
                rhs[i] += _f(r, f"gy_{i}") - R * _f(r, f"gx_{i}")
        B = _solve_stacked(
            G[None, ...], rhs[None, :, None],
            "svyratio psu residual projection",
        ).ravel()
        c = np.concatenate(([1.0, -R], -B))
        pieces = _cal_psu_pieces(rows, full_psu_n, fpc, c, swx, kb, _f)
        v = _cal_psu_variance(pieces, strat)
        out.append(EstimateRow(key=key, estimate=float(R),
                               variance=float(v), n=n))
    return out


def _svyvar_calibrated_psu(
    design: SurveyDesign,
    y_col: str,
    group_cols: list[str],
) -> list[EstimateRow]:
    """Calibrated cluster svyvar (r15): the residualized variance
    influence z = w((y−m)² − V − xc'B)/Σw expands over the basis
    b = (1, y, y², xc_1..kx) with coefficients (m²−V, −2m, 1, −B) —
    y² materialized ELEMENT-level before the PSU totals (the svyvar
    rule), so ``_cal_psu_core`` applies unchanged; B solves the
    element d-Gram against rhs_j = Σd xc_j y² − 2m Σd xc_j y +
    (m²−V) Σd xc_j."""
    xcols = list(design.calibration_cols)
    kx = len(xcols)
    kb = kx + 3
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    d = F.col(design.base_weight_col).cast("double")
    basis = [F.lit(1.0), y, y * y] + xs
    d_exprs: dict = {}
    for i in range(kx):
        for j in range(i, kx):
            d_exprs[f"g_{i}_{j}"] = d * xs[i] * xs[j]
        d_exprs[f"gy2_{i}"] = d * xs[i] * y * y
        d_exprs[f"gy_{i}"] = d * xs[i] * y
        d_exprs[f"g1_{i}"] = d * xs[i]
    items, full_psu_n, _f = _cal_psu_core(
        design, [y_col], basis, d_exprs, group_cols
    )
    strat, fpc = design.strata_col, design.fpc_col

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n_psu"]) for _, r in rows)
        sw = sum(_f(r, "s_0") for _, r in rows)
        m = sum(_f(r, "s_1") for _, r in rows) / sw
        V = sum(_f(r, "s_2") for _, r in rows) / sw - m * m
        c0 = m * m - V
        G = np.zeros((kx, kx))
        rhs = np.zeros(kx)
        for _, r in rows:
            for i in range(kx):
                for j in range(i, kx):
                    v = _f(r, f"g_{i}_{j}")
                    G[i, j] += v
                    if j != i:
                        G[j, i] += v
                rhs[i] += (
                    _f(r, f"gy2_{i}") - 2.0 * m * _f(r, f"gy_{i}")
                    + c0 * _f(r, f"g1_{i}")
                )
        B = _solve_stacked(
            G[None, ...], rhs[None, :, None],
            "svyvar psu residual projection",
        ).ravel()
        c = np.concatenate(([c0, -2.0 * m, 1.0], -B))
        pieces = _cal_psu_pieces(rows, full_psu_n, fpc, c, sw, kb, _f)
        v = _cal_psu_variance(pieces, strat)
        out.append(EstimateRow(key=key, estimate=float(V),
                               variance=float(v), n=n))
    return out


def svytotal(
    design: SurveyDesign, y_col: str, group_cols: list[str] | None = None
) -> list[EstimateRow]:
    """HT total + with-replacement variance (reference ``PC.R:190-193``);
    stratified designs sum the df-corrected variance per stratum.

    Calibrated designs (r7): the GREG-total linearization — survey
    semantics, previously svymean-only: z_i = w_i e_i with
    e_i = y_i - x_i'B, B solving (Σ d x x') B = Σ d x y over the
    pre-calibration weights d; V = Σ_h f_h n_h/(n_h-1)(Σz² − (Σz)²/n_h).
    Same one-pass moment pattern as the calibrated svymean."""
    group_cols = list(group_cols or [])
    strat = design.strata_col
    fpc = design.fpc_col
    if design.is_calibrated and design.calibration_cols:
        if design.psu_col:
            return _cal_psu_linearized(design, y_col, group_cols, "total")
        return _svytotal_calibrated(design, y_col, group_cols)
    df = design.df.na.drop(
        subset=[y_col, design.weight_col] + ([strat] if strat else [])
        + ([fpc] if fpc else [])
        + ([design.psu_col] if design.psu_col else [])
    )
    full_psu_n = None
    if design.psu_col:
        # cluster design: pseudo-elements are PSU totals; n becomes the
        # sampled-PSU count and the same formulas below apply unchanged
        df, full_psu_n = _psu_collapse(df, design, y_col, group_cols)
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    wy = w * y
    res = _collect_keyed(
        df,
        group_cols + ([strat] if strat else []),
        [
            F.sum(wy).alias("__t__"),
            F.sum(wy * wy).alias("__t2__"),
            F.count(F.lit(1)).alias("__n__"),
        ]
        + ([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    )

    def _Nh(r):
        return float(r["__N__"]) if fpc else None

    def _n_var(r, hval):
        # domain estimation on a cluster design: d.o.f. and the
        # (Σz)²/n_h term use the FULL-design sampled-PSU count
        if full_psu_n is not None:
            return full_psu_n[hval]
        return int(r["__n__"])

    out = []
    if strat:
        by_group: dict[tuple, list] = {}
        for k, r in res.items():
            by_group.setdefault(k[:-1], []).append((k[-1], r))
        for k, rows in by_group.items():
            t = sum(r["__t__"] or 0.0 for _, r in rows)
            n = sum(int(r["__n__"]) for _, r in rows)
            v = _strat_var([
                (_n_var(r, h), r["__t__"] or 0.0, r["__t2__"] or 0.0,
                 _fpc_factor(_n_var(r, h), _Nh(r)))
                for h, r in rows
            ])
            out.append(EstimateRow(key=k, estimate=float(t), variance=float(v), n=n))
        return out
    for k, r in res.items():
        n = int(r["__n__"])
        n_v = _n_var(r, None)
        t = r["__t__"] or 0.0
        t2 = r["__t2__"] or 0.0
        f = _fpc_factor(n_v, _Nh(r))
        # f * n/(n-1) * (sum z^2 - n*zbar^2), z = w*y
        if f == 0.0:
            v = 0.0
        elif n_v < 2:
            v = float("nan")
        else:
            v = f * n_v / (n_v - 1.0) * (t2 - t * t / n_v)
        out.append(EstimateRow(key=k, estimate=float(t), variance=float(v), n=n))
    return out


def _svytotal_calibrated(
    design: SurveyDesign, y_col: str, group_cols: list[str]
) -> list[EstimateRow]:
    """GREG-total variance: one pass collecting, per (group, stratum)
    cell, Σw·y, Σw·x_j, the w²-Gram of [y, x], the d-Gram of [x, y],
    then driver algebra (B solve + quadratic forms) exactly like the
    calibrated svymean — but with influence z_i = w_i e_i (no /Σw)."""
    strat = design.strata_col
    fpc = design.fpc_col
    xcols = list(design.calibration_cols)
    kx = len(xcols)
    subset = list(dict.fromkeys(
        [y_col, design.weight_col, design.base_weight_col]
        + xcols + ([strat] if strat else []) + ([fpc] if fpc else [])
    ))
    df = design.df.na.drop(subset=subset)
    w = F.col(design.weight_col).cast("double")
    d = F.col(design.base_weight_col).cast("double")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    w2 = w * w
    z = [y] + xs  # w²-Gram basis
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w * y).alias("swy"),
        *[F.sum(w * xs[j]).alias(f"swx_{j}") for j in range(kx)],
        *([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    ]
    for i in range(len(z)):
        for j in range(i, len(z)):
            aggs.append(F.sum(w2 * z[i] * z[j]).alias(f"q_{i}_{j}"))
    for i in range(kx):
        for j in range(i, kx):
            aggs.append(F.sum(d * xs[i] * xs[j]).alias(f"g_{i}_{j}"))
        aggs.append(F.sum(d * xs[i] * y).alias(f"gy_{i}"))
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        v = r[name]
        return 0.0 if v is None else float(v)

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append(r)
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [r]) for k, r in res.items()]

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n"]) for r in rows)
        t = sum(_f(r, "swy") for r in rows)
        G = np.zeros((kx, kx))
        rhs = np.zeros(kx)
        for r in rows:
            for i in range(kx):
                for j in range(i, kx):
                    v = _f(r, f"g_{i}_{j}")
                    G[i, j] += v
                    if j != i:
                        G[j, i] += v
                rhs[i] += _f(r, f"gy_{i}")
        B = _solve_stacked(
            G[None, ...], rhs[None, :, None], "svytotal residual projection"
        ).ravel()
        c = np.concatenate(([1.0], -B))
        pieces = []
        for r in rows:
            s1 = _f(r, "swy") - sum(
                B[j] * _f(r, f"swx_{j}") for j in range(kx)
            )
            q = np.zeros((kx + 1, kx + 1))
            for i in range(kx + 1):
                for j in range(i, kx + 1):
                    q[i, j] = q[j, i] = _f(r, f"q_{i}_{j}")
            s2 = float(c @ q @ c)
            pieces.append((
                int(r["n"]), s1, s2,
                _fpc_factor(int(r["n"]),
                            float(r["__N__"]) if fpc else None),
            ))
        if strat:
            v = _strat_var(pieces)
        else:
            n_h, s1, s2, f = pieces[0]
            if f == 0.0:
                v = 0.0
            elif n < 2:
                v = float("nan")
            else:
                v = f * n / (n - 1.0) * (s2 - s1 * s1 / n)
        out.append(EstimateRow(key=key, estimate=float(t), variance=float(v), n=n))
    return out


def svymean(
    design: SurveyDesign,
    y_col: str,
    group_cols: list[str] | None = None,
) -> list[EstimateRow]:
    """Weighted mean + linearization variance; calibration-aware — in ONE
    distributed pass.

    The influence values u_i = w_i(y_i - m - x_i'B)/sw are linear in the
    unknown driver-side scalars (m, B), so Σu and Σu² are quadratic forms
    in UNCENTERED moments.  One aggregation collects, per group:

      w-weighted:   Σw, Σw·y, Σw·x_j                     (mean + Σu)
      w²-weighted:  the Gram of [1, y, x] under w²        (Σu²)
      d-weighted:   the Gram of [x, y, 1] under d         (projection B;
                    calibrated designs only, d = pre-calibration weights)

    and the driver assembles m = Σwy/Σw, solves (Σd x x')B = Σd x y − m·Σd x,
    then expands
      Σw·e       = Σwy − m·Σw − Σ_j B_j Σw·x_j
      Σw²e²      = Σw²y² − 2mΣw²y + m²Σw² − 2Σ_j B_j(Σw²yx_j − mΣw²x_j)
                   + Σ_jk B_j B_k Σw²x_j x_k
      V          = n/(n−1) · (Σu² − (Σu)²/n),  u-sums = e-sums / sw.

    Uncentered moments are numerically safe here: every reference usage
    has |y|/sd well under 1e3, far inside float64 headroom.

    Reference sites: ``RegDI2.R:246-248,305-307,322-324``, ``PC.R:245-247``.
    """
    group_cols = list(group_cols or [])
    strat = design.strata_col
    fpc = design.fpc_col
    if design.psu_col and design.is_calibrated and design.calibration_cols:
        return _cal_psu_linearized(design, y_col, group_cols, "mean")
    xcols = list(design.calibration_cols or []) if design.is_calibrated else []
    kx = len(xcols)
    subset = [y_col, design.weight_col] + (
        [design.base_weight_col] if design.is_calibrated else []
    ) + xcols + ([strat] if strat else []) + ([fpc] if fpc else []) + (
        [design.psu_col] if design.psu_col else []
    )
    df = design.df.na.drop(subset=list(dict.fromkeys(subset)))
    full_psu_n = None
    if design.psu_col:
        # cluster design (r14): pseudo-elements carry the per-PSU
        # w-sums, so the w²-Gram below IS the PSU-total Gram and the
        # element-level linearization applies unchanged (kx = 0 here —
        # calibrated+psu dispatched to _cal_psu_linearized above)
        df, full_psu_n = _psu_collapse(df, design, y_col, group_cols)
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    w2 = w * w
    z = [F.lit(1.0), y] + xs  # w²-Gram basis

    aggs: list[Column] = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sw"),
        F.sum(w * y).alias("swy"),
        *[F.sum(w * xs[j]).alias(f"swx_{j}") for j in range(kx)],
        *([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    ]
    for i in range(len(z)):
        for j in range(i, len(z)):
            aggs.append(F.sum(w2 * z[i] * z[j]).alias(f"q_{i}_{j}"))
    if design.is_calibrated:
        d = F.col(design.base_weight_col).cast("double")
        for i in range(kx):
            for j in range(i, kx):
                aggs.append(F.sum(d * xs[i] * xs[j]).alias(f"g_{i}_{j}"))
            aggs.append(F.sum(d * xs[i] * y).alias(f"gy_{i}"))
            aggs.append(F.sum(d * xs[i]).alias(f"g1_{i}"))

    # Stratified designs collect the SAME moments one level finer (per
    # stratum) — every group-level quantity (m, the projection B) is a sum
    # of the per-stratum moments, and the variance pieces need them per
    # stratum anyway.  Still ONE distributed pass.
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        v = r[name]
        return 0.0 if v is None else float(v)

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append((key[-1], r))
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [(None, r)]) for k, r in res.items()]

    def _n_var(r, hval):
        # domain estimation on a cluster design: d.o.f. and the
        # (Σu)²/n_h term use the FULL-design sampled-PSU count
        if full_psu_n is not None:
            return full_psu_n[hval]
        return int(r["n"])

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n"]) for _, r in rows)
        sw = sum(_f(r, "sw") for _, r in rows)
        m = sum(_f(r, "swy") for _, r in rows) / sw

        if design.is_calibrated and kx:
            G = np.zeros((kx, kx))
            rhs = np.zeros(kx)
            for _, r in rows:
                for i in range(kx):
                    for j in range(i, kx):
                        v = _f(r, f"g_{i}_{j}")
                        G[i, j] += v
                        if j != i:
                            G[j, i] += v
                    rhs[i] += _f(r, f"gy_{i}") - m * _f(r, f"g1_{i}")
            B = _solve_stacked(G[None, ...], rhs[None, :, None],
                               "svymean residual projection").ravel()
        else:
            B = np.zeros(kx)
        c = np.concatenate(([-m, 1.0], -B))

        # per-stratum (or single-block) influence sums with the GLOBAL m, B
        pieces = []
        for hval, r in rows:
            sum_we = _f(r, "swy") - m * _f(r, "sw") - sum(
                B[j] * _f(r, f"swx_{j}") for j in range(kx)
            )
            q = np.zeros((kx + 2, kx + 2))
            for i in range(kx + 2):
                for j in range(i, kx + 2):
                    q[i, j] = q[j, i] = _f(r, f"q_{i}_{j}")
            # Σw²e² via the quadratic form: e = [1, y, x]·(-m, 1, -B)
            sum_w2e2 = float(c @ q @ c)
            pieces.append((
                _n_var(r, hval), sum_we / sw, sum_w2e2 / (sw * sw),
                _fpc_factor(_n_var(r, hval),
                            float(r["__N__"]) if fpc else None),
            ))

        if strat:
            v = _strat_var(pieces)
        else:
            n_h, s1, s2, f = pieces[0]
            if f == 0.0:
                v = 0.0
            elif n_h < 2:
                v = float("nan")
            else:
                v = f * n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
        out.append(EstimateRow(key=key, estimate=float(m), variance=float(v), n=n))
    return out


def svyratio(
    design: SurveyDesign,
    num_col: str,
    den_col: str,
    group_cols: list[str] | None = None,
) -> list[EstimateRow]:
    """Ratio estimator R = sum(w*y) / sum(w*x) with linearization SE —
    ``survey::svyratio`` for element-level with-replacement designs
    (the same design family as ``svymean``/``svytotal`` above; the
    reference's PC pipeline composes the identical influence algebra at
    ``PC.R:245-247``).

    Influence: u_i = w_i (y_i - R x_i) / sum(w x);
    V = n/(n-1) * (sum u_i^2 - (sum u_i)^2 / n).  The u-moments are
    quadratic forms in UNCENTERED (w, w^2)-weighted moments of (x, y),
    so everything is ONE distributed pass per group; only O(groups)
    scalars reach the driver.  Stratified designs (``strata_col`` set)
    collect the same moments one level finer and sum the df-corrected
    per-stratum variance pieces — the svymean/svytotal pattern.

    Calibrated designs (r8): GREG-residual linearization — the same
    engine-normative semantics as the calibrated svymean/svytotal:
    the linearized variable t_i = y_i - R x_i is residualized against
    the calibration columns, e_i = t_i - xc_i'B with B solving
    (Σ d xc xc') B = Σ d xc t over the pre-calibration weights d;
    influence z_i = w_i e_i / Σ(w x).

    Cluster designs (r14, ``psu_col``): the influence is linear in
    (y, x), so the PSU pseudo-element collapse applies directly — the
    w²-Gram of (y, x) becomes the PSU-total Gram and the same formulas
    run unchanged on one-row-per-PSU input."""
    group_cols = list(group_cols or [])
    if design.psu_col and design.is_calibrated and design.calibration_cols:
        return _svyratio_calibrated_psu(design, num_col, den_col, group_cols)
    if design.is_calibrated and design.calibration_cols:
        return _svyratio_calibrated(design, num_col, den_col, group_cols)
    strat = design.strata_col
    fpc = design.fpc_col
    df = design.df.na.drop(
        subset=[num_col, den_col, design.weight_col] + ([strat] if strat else [])
        + ([fpc] if fpc else [])
        + ([design.psu_col] if design.psu_col else [])
    )
    full_psu_n = None
    if design.psu_col:
        df, full_psu_n = _psu_collapse(
            df, design, [num_col, den_col], group_cols
        )
    w = F.col(design.weight_col).cast("double")
    y = F.col(num_col).cast("double")
    x = F.col(den_col).cast("double")
    res = _collect_keyed(
        df,
        group_cols + ([strat] if strat else []),
        [
            F.sum(w * y).alias("swy"),
            F.sum(w * x).alias("swx"),
            F.sum(w * w * y * y).alias("qyy"),
            F.sum(w * w * x * y).alias("qxy"),
            F.sum(w * w * x * x).alias("qxx"),
            F.count(F.lit(1)).alias("n"),
        ]
        + ([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    )
    if strat:
        grouped: dict[tuple, list] = {}
        for k, r in res.items():
            grouped.setdefault(k[:-1], []).append((k[-1], r))
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [(None, r)]) for k, r in res.items()]

    def _f(r, name):
        return float(r[name] or 0.0)

    def _n_var(r, hval):
        if full_psu_n is not None:
            return full_psu_n[hval]
        return int(r["n"])

    out: list[EstimateRow] = []
    for k, rows in items:
        n = sum(int(r["n"]) for _, r in rows)
        swy = sum(_f(r, "swy") for _, r in rows)
        swx = sum(_f(r, "swx") for _, r in rows)
        if swx == 0.0:
            out.append(EstimateRow(key=k, estimate=float("nan"),
                                   variance=float("nan"), n=n))
            continue
        R = swy / swx
        # per piece: sum_h w(y-Rx) and sum_h w^2 (y-Rx)^2 in moments,
        # scaled by the GROUP-level denominator sum(w x)
        pieces = []
        for hval, r in rows:
            s_h = (_f(r, "swy") - R * _f(r, "swx")) / swx
            q_h = (
                _f(r, "qyy") - 2.0 * R * _f(r, "qxy") + R * R * _f(r, "qxx")
            ) / (swx * swx)
            pieces.append((
                _n_var(r, hval), s_h, q_h,
                _fpc_factor(_n_var(r, hval),
                            float(r["__N__"]) if fpc else None),
            ))
        if strat or len(pieces) > 1:
            v = _strat_var(pieces)
        else:
            n_h, s1_p, q_p, f = pieces[0]
            if f == 0.0:
                v = 0.0
            elif n_h < 2:
                v = float("nan")
            else:
                v = f * n_h / (n_h - 1.0) * (q_p - s1_p ** 2 / n_h)
        out.append(EstimateRow(key=k, estimate=float(R), variance=float(v), n=n))
    return out


def _svyratio_calibrated(
    design: SurveyDesign, num_col: str, den_col: str, group_cols: list[str]
) -> list[EstimateRow]:
    """GREG-residual ratio variance: ONE pass collecting, per (group,
    stratum) cell, the w-sums of (y, x, xc_j), the d-Gram of the
    calibration columns against (y, x), and the w²-Gram of the basis
    [y, x, xc...]; then driver algebra — R and B are linear/solvable in
    those moments, and the influence z = w(y - Rx - xc'B)/Σwx is a
    quadratic form with coefficient vector c = [1, -R, -B]/Σwx."""
    strat = design.strata_col
    fpc = design.fpc_col
    xcols = list(design.calibration_cols)
    kx = len(xcols)
    subset = list(dict.fromkeys(
        [num_col, den_col, design.weight_col, design.base_weight_col]
        + xcols + ([strat] if strat else []) + ([fpc] if fpc else [])
    ))
    df = design.df.na.drop(subset=subset)
    w = F.col(design.weight_col).cast("double")
    d = F.col(design.base_weight_col).cast("double")
    y = F.col(num_col).cast("double")
    x = F.col(den_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    w2 = w * w
    z = [y, x] + xs  # w²-Gram basis
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w * y).alias("swy"),
        F.sum(w * x).alias("swx"),
        *[F.sum(w * xs[j]).alias(f"swc_{j}") for j in range(kx)],
        *([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    ]
    for i in range(len(z)):
        for j in range(i, len(z)):
            aggs.append(F.sum(w2 * z[i] * z[j]).alias(f"q_{i}_{j}"))
    for i in range(kx):
        for j in range(i, kx):
            aggs.append(F.sum(d * xs[i] * xs[j]).alias(f"g_{i}_{j}"))
        aggs.append(F.sum(d * xs[i] * y).alias(f"gy_{i}"))
        aggs.append(F.sum(d * xs[i] * x).alias(f"gx_{i}"))
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        v = r[name]
        return 0.0 if v is None else float(v)

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append(r)
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [r]) for k, r in res.items()]

    out: list[EstimateRow] = []
    kz = kx + 2
    for key, rows in items:
        n = sum(int(r["n"]) for r in rows)
        swy = sum(_f(r, "swy") for r in rows)
        swx = sum(_f(r, "swx") for r in rows)
        if swx == 0.0:
            out.append(EstimateRow(key=key, estimate=float("nan"),
                                   variance=float("nan"), n=n))
            continue
        R = swy / swx
        G = np.zeros((kx, kx))
        rhs = np.zeros(kx)
        for r in rows:
            for i in range(kx):
                for j in range(i, kx):
                    v = _f(r, f"g_{i}_{j}")
                    G[i, j] += v
                    if j != i:
                        G[j, i] += v
                rhs[i] += _f(r, f"gy_{i}") - R * _f(r, f"gx_{i}")
        B = _solve_stacked(
            G[None, ...], rhs[None, :, None], "svyratio residual projection"
        ).ravel()
        c = np.concatenate(([1.0, -R], -B)) / swx
        pieces = []
        for r in rows:
            s1 = (
                _f(r, "swy") - R * _f(r, "swx")
                - sum(B[j] * _f(r, f"swc_{j}") for j in range(kx))
            ) / swx
            q = np.zeros((kz, kz))
            for i in range(kz):
                for j in range(i, kz):
                    q[i, j] = q[j, i] = _f(r, f"q_{i}_{j}")
            s2 = float(c @ q @ c)
            pieces.append((
                int(r["n"]), s1, s2,
                _fpc_factor(int(r["n"]), float(r["__N__"]) if fpc else None),
            ))
        if strat:
            v = _strat_var(pieces)
        else:
            f = pieces[0][3]
            if f == 0.0:
                v = 0.0
            elif n < 2:
                v = float("nan")
            else:
                v = f * n / (n - 1.0) * (pieces[0][2] - pieces[0][1] ** 2 / n)
        out.append(EstimateRow(key=key, estimate=float(R), variance=float(v), n=n))
    return out


def svytable(
    design: SurveyDesign, row_col: str, col_col: str
) -> DataFrame:
    """Design-weighted two-way contingency table — ``survey::svytable``:
    one grouped pass, (row, col, n, wsum) long-form output."""
    w = F.col(design.weight_col).cast("double")
    return (
        design.df.na.drop(subset=[row_col, col_col, design.weight_col])
        .groupBy(row_col, col_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(w).alias("wsum"))
    )


def svychisq_pearson(
    design: SurveyDesign, row_col: str, col_col: str
) -> tuple:
    """Weighted Pearson chi-square for independence on the
    design-weighted table, rescaled to the observed sample size n
    (the first-order part of ``survey::svychisq``'s Rao-Scott statistic;
    the design-effect denominator correction needs replicate variance —
    pair with ``poisson_bootstrap_mean`` style replication if the full
    Rao-Scott p-value is required).  Returns (X2, df, n).

    Cluster designs refuse loudly (r15): the n-scaled statistic's
    implicit multinomial null assumes independent elements, so under
    PSU sampling it is anti-conservative with no visible symptom — use
    ``svychisq_rao_scott``, whose bootstrap resamples whole PSUs when
    the design carries a ``psu_col``.

    Cost: the svytable pass + O(cells) driver arithmetic."""
    if design.psu_col:
        raise NotImplementedError(
            "svychisq_pearson: the uncorrected n-scaled Pearson statistic "
            "assumes independently sampled elements; on a cluster design "
            "(psu_col) it understates the variance with no warning.  Use "
            "svychisq_rao_scott — its deterministic Poisson bootstrap "
            "resamples whole PSUs when the design has a psu_col."
        )
    cells = svytable(design, row_col, col_col).collect()
    W = sum(c["wsum"] for c in cells)
    n = sum(c["n"] for c in cells)
    if W <= 0:
        raise ValueError("svychisq: non-positive total weight")
    rows: dict = {}
    cols: dict = {}
    for c in cells:
        rows[c[row_col]] = rows.get(c[row_col], 0.0) + c["wsum"]
        cols[c[col_col]] = cols.get(c[col_col], 0.0) + c["wsum"]
    x2 = 0.0
    for c in cells:
        p = c["wsum"] / W
        e = (rows[c[row_col]] / W) * (cols[c[col_col]] / W)
        x2 += (p - e) ** 2 / e
    # cells absent from the table contribute (0 - e)^2 / e = e
    present = {(c[row_col], c[col_col]) for c in cells}
    for rv, rw in rows.items():
        for cv, cw in cols.items():
            if (rv, cv) not in present:
                x2 += (rw / W) * (cw / W)
    x2 *= n
    dof = (len(rows) - 1) * (len(cols) - 1)
    return float(x2), int(dof), int(n)


@dataclass
class SvyChisqResult:
    """Second-order Rao-Scott test of independence (``survey::svychisq``)."""

    x2: float            # sample-scaled weighted Pearson X^2
    df: int              # (R-1)(C-1)
    deltas: tuple        # estimated generalized design effects (d of them)
    delta_bar: float     # mean delta (first-order correction divisor)
    a2: float            # squared CV of the deltas
    x2_rs: float         # X^2 / (delta_bar * (1 + a2)) ~ chi2(df_rs)
    df_rs: float         # df / (1 + a2) — Satterthwaite df
    n: int
    n_replicates: int
    p_first: float = float("nan")   # P(chi2_df > X^2/delta_bar) — 1st-order
    p_rs: float = float("nan")      # P(chi2_df_rs > x2_rs) — 2nd-order


def svychisq_rao_scott(
    design: SurveyDesign,
    row_col: str,
    col_col: str,
    id_col: str,
    n_replicates: int = 100,
) -> SvyChisqResult:
    """FULL Rao-Scott (1984) second-order corrected chi-square for
    independence — the design-effect correction ``survey::svychisq``
    applies (reference inference surface, ``PC.R:216-237``-family).

    The weighted Pearson statistic X^2 = n * sum_rc (p_rc - e_rc)^2/e_rc
    is asymptotically sum_i delta_i Z_i^2 where the delta_i are the
    nonzero eigenvalues of n * D^{-1/2} V_u D^{-1/2} (D = diag of the
    independence-expected proportions, V_u = design covariance of the
    residual contrasts u_rc = p_rc - p_r. p_.c).  V_u comes from the
    engine's DETERMINISTIC Poisson bootstrap (``kernels.replicate``):
    each row enters replicate b with a hash-derived Poisson(1)
    multiplicity, so the whole test is engine-reproducible (for a 2x2
    table the correction collapses to the scalar Wald form
    u^2 / V(u), which the DuckDB gate oracle replays exactly).

    Cost: ONE distributed pass — a (row, col) groupBy whose agg list
    carries the B replicate-weighted cell sums next to the point sums
    (B <= a few hundred keeps the row narrow); the eigenproblem is
    O((RC)^3) on the driver over the tiny cell table.

    Cluster designs (``psu_col``, r15): the replicate multiplicity is
    hashed from the PSU id instead of ``id_col``, so every element of a
    PSU enters replicate b with the SAME Poisson(1) count — the cluster
    bootstrap; within-PSU correlation then shows up in V_u and inflates
    the deltas exactly as first-stage resampling should.  The psu
    column must be integral (the same contract ``id_col`` carries).

    ``strata_col`` (r16 — retiring the r15 conservatism note): the
    bootstrap becomes the per-stratum RATIO-RESCALED Poisson resample —
    replicate b's cell sums from stratum h are scaled by n_h / M_hb
    (n_h = first-stage units sampled in h, M_hb = their total replicate
    multiplicity), which conditions each stratum's resample on its
    realized size the way fixed-n_h stratified sampling does, removing
    the between-stratum component the unstratified resample overstated.
    Cost: the cell pass gains the stratum as a grouping key, plus one
    distinct-unit aggregation for the (stratum, replicate) multiplicity
    totals — O(strata x B) driver scalars.  A replicate that empties a
    stratum (Poisson(n_h) = 0 — only plausible for tiny n_h) is dropped
    from V_u.  Units (PSUs or elements) must nest within strata.
    """
    from data_integration_est_spark.kernels.replicate import (
        _POIS1_CDF, _POIS1_P, _QH_A1, _QH_A2, _QH_B1, _QH_B2, _QH_C2)

    if n_replicates < 2:
        raise ValueError("need at least 2 replicates")
    rep_id = design.psu_col or id_col
    strat = design.strata_col
    df = design.df.na.drop(
        subset=[row_col, col_col, design.weight_col, rep_id]
        + ([strat] if strat else [])
    )
    w = F.col(design.weight_col).cast("double")
    hsel = [F.col(strat).alias("__hh__")] if strat else []
    hcols = ["__hh__"] if strat else []
    base = df.select(
        *hsel,
        F.col(row_col).alias("__r__"),
        F.col(col_col).alias("__c__"),
        w.alias("__w__"),
        F.col(rep_id).cast("long").alias("__id__"),
    )
    # CPU-bound replicate projection must not run at a small scan's
    # parallelism (same guard as poisson_bootstrap_mean)
    par = base.sparkSession.sparkContext.defaultParallelism
    if base._jdf.queryExecution().toRdd().getNumPartitions() < par:
        base = base.repartition(par)
    B = n_replicates
    h1 = [
        f"pmod(__id__ * {_QH_A1} + {b * _QH_B1}, {_POIS1_P}) AS __h{b}__"
        for b in range(B)
    ]
    s1 = base.selectExpr(*hcols, "__r__", "__c__", "__w__", *h1)
    h2 = [
        f"pmod(pmod(__h{b}__ * __h{b}__, {_POIS1_P}) * {_QH_A2} "
        f"+ __h{b}__ * {_QH_B2} + {b * _QH_C2}, {_POIS1_P}) AS __g{b}__"
        for b in range(B)
    ]
    s2 = s1.selectExpr(*hcols, "__r__", "__c__", "__w__", *h2)
    ms = [
        "("
        + " + ".join(f"CAST(__g{b}__ >= {t} AS INT)" for t in _POIS1_CDF)
        + f") AS __m{b}__"
        for b in range(B)
    ]
    s3 = s2.selectExpr(*hcols, "__r__", "__c__", "__w__", *ms)
    aggs = [F.expr("count(*)").alias("n"), F.expr("sum(__w__)").alias("sw")]
    aggs += [
        F.expr(f"sum(__m{b}__ * __w__)").alias(f"b_{b}") for b in range(B)
    ]
    cells = s3.groupBy(*hcols, "__r__", "__c__").agg(*aggs).collect()
    if not cells:
        raise ValueError("svychisq: empty table")

    rlabels = sorted({c["__r__"] for c in cells})
    clabels = sorted({c["__c__"] for c in cells})
    R, C = len(rlabels), len(clabels)
    if R < 2 or C < 2:
        raise ValueError("svychisq: need at least a 2x2 table")
    ri = {v: i for i, v in enumerate(rlabels)}
    ci = {v: i for i, v in enumerate(clabels)}
    sw = np.zeros((R, C))
    n = 0
    if strat:
        # per-stratum ratio-rescaled bootstrap (r16): one more small
        # aggregation over DISTINCT first-stage units yields n_h and the
        # per-replicate multiplicity totals M_hb; replicate b's stratum-h
        # cells are then scaled by n_h / M_hb on the driver
        # persist-split (r16 optimization round): fusing the distinct's
        # final HashAggregate, the 3-layer multiplicity chain (B x ~12
        # pmod/CAST expressions), and the partial aggregation into one
        # stage made that stage fall off the fast codegen path (measured
        # 5.0 s for 100k units at B=32); materializing the tiny distinct
        # unit table first puts the chain in its own scan-shaped stage
        # (1.2 s warm, same values)
        units = base.select("__hh__", "__id__").distinct().persist()
        try:
            u1 = units.selectExpr("__hh__", *h1)
            u2 = u1.selectExpr("__hh__", *h2)
            u3 = u2.selectExpr("__hh__", *ms)
            uaggs = [F.expr("count(*)").alias("n_h")] + [
                F.expr(f"sum(__m{b}__)").alias(f"M_{b}") for b in range(B)
            ]
            urows = u3.groupBy("__hh__").agg(*uaggs).collect()
        finally:
            units.unpersist()
        hvals = sorted({r["__hh__"] for r in urows}, key=str)
        hidx = {h: i for i, h in enumerate(hvals)}
        H = len(hvals)
        n_hs = np.zeros(H)
        M_hb = np.zeros((H, B))
        for r in urows:
            hi = hidx[r["__hh__"]]
            n_hs[hi] = float(r["n_h"])
            for b in range(B):
                M_hb[hi, b] = float(r[f"M_{b}"] or 0.0)
        raw = np.zeros((H, B, R, C))
        for cell in cells:
            hi = hidx[cell["__hh__"]]
            i, j = ri[cell["__r__"]], ci[cell["__c__"]]
            sw[i, j] += float(cell["sw"] or 0.0)
            n += int(cell["n"])
            for b in range(B):
                raw[hi, b, i, j] = float(cell[f"b_{b}"] or 0.0)
        dead = (M_hb <= 0).any(axis=0)  # replicate emptied a stratum
        scale = np.where(M_hb > 0, n_hs[:, None] / np.where(
            M_hb > 0, M_hb, 1.0), 0.0)
        boot = np.einsum("hb,hbrc->brc", scale, raw)
        boot = boot[~dead]
        B_eff = boot.shape[0]
        if B_eff < 2:
            raise ValueError(
                "svychisq: stratified bootstrap degenerate (replicates "
                "emptying a stratum) — more replicates or larger strata"
            )
    else:
        boot = np.zeros((B, R, C))
        for cell in cells:
            i, j = ri[cell["__r__"]], ci[cell["__c__"]]
            sw[i, j] = float(cell["sw"] or 0.0)
            n += int(cell["n"])
            for b in range(B):
                boot[b, i, j] = float(cell[f"b_{b}"] or 0.0)
    W = sw.sum()
    p = sw / W
    e = np.outer(p.sum(1), p.sum(0))
    x2 = float(n * ((p - e) ** 2 / e).sum())
    d = (R - 1) * (C - 1)

    us = []
    for b in range(boot.shape[0]):
        Wb = boot[b].sum()
        if Wb <= 0:
            continue
        pb = boot[b] / Wb
        us.append((pb - np.outer(pb.sum(1), pb.sum(0))).ravel())
    U = np.asarray(us)
    if U.shape[0] < 2:
        raise ValueError("svychisq: all bootstrap replicates degenerate")
    Vu = np.cov(U, rowvar=False, ddof=1).reshape(R * C, R * C)
    Dm = e.ravel()
    M = n * (Vu / np.sqrt(np.outer(Dm, Dm)))
    eig = np.clip(np.linalg.eigvalsh((M + M.T) / 2.0), 0.0, None)
    deltas = np.sort(eig)[::-1][:d]
    delta_bar = float(deltas.mean())
    if delta_bar <= 0:
        raise ValueError("svychisq: degenerate design-effect estimate")
    a2 = float(((deltas - delta_bar) ** 2).sum() / (d * delta_bar**2))
    from data_integration_est_spark.kernels.special import chi2_sf

    x2_rs = float(x2 / (delta_bar * (1.0 + a2)))
    df_rs = float(d / (1.0 + a2))
    return SvyChisqResult(
        x2=x2, df=d, deltas=tuple(float(v) for v in deltas),
        delta_bar=delta_bar, a2=a2, x2_rs=x2_rs, df_rs=df_rs,
        n=int(n), n_replicates=B,
        p_first=chi2_sf(x2 / delta_bar, float(d)),
        p_rs=chi2_sf(x2_rs, df_rs),
    )


def svyciprop(
    design: SurveyDesign,
    indicator_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.05,
    method: str = "logit",
) -> DataFrame:
    """Design-based proportion with confidence interval —
    ``survey::svyciprop``.  The point estimate and linearization SE are
    exactly ``svymean`` on the 0/1 indicator (one distributed pass);
    the interval is built on the driver:

    - ``method="logit"`` (survey's default): symmetric interval on the
      logit scale, ci = expit(logit(p) +- z * se / (p(1-p))) — respects
      (0, 1) and is asymmetric near the edges;
    - ``method="mean"``: the Wald interval p +- z * se.

    Degenerate groups (p in {0, 1}, where the linearized se is 0 and the
    logit is infinite, or n < 2) report NULL bounds.  Returns a
    DataFrame (group_cols..., p, se, ci_l, ci_u)."""
    from statistics import NormalDist

    from pyspark.sql.types import DoubleType, StructField, StructType

    if method not in ("logit", "mean"):
        raise ValueError(f"unknown method {method!r}")
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    group_cols = list(group_cols or [])
    rows = svymean(design, indicator_col, group_cols=group_cols)
    zc = NormalDist().inv_cdf(1.0 - alpha / 2.0)
    out = []
    for r in rows:
        p, se = r.estimate, r.se
        if not np.isfinite(se) or p <= 0.0 or p >= 1.0:
            ci = (None, None)
        elif method == "mean":
            ci = (p - zc * se, p + zc * se)
        else:
            logit = np.log(p / (1.0 - p))
            se_l = se / (p * (1.0 - p))
            lo, hi = logit - zc * se_l, logit + zc * se_l
            ci = (float(1.0 / (1.0 + np.exp(-lo))),
                  float(1.0 / (1.0 + np.exp(-hi))))
        out.append(tuple(r.key) + (float(p), float(se) if np.isfinite(se) else None,
                                   ci[0], ci[1]))
    key_fields = list(design.df.select(*group_cols).schema.fields)
    schema = StructType(
        key_fields
        + [
            StructField("p", DoubleType(), True),
            StructField("se", DoubleType(), True),
            StructField("ci_l", DoubleType(), True),
            StructField("ci_u", DoubleType(), True),
        ]
    )
    spark = design.df.sparkSession
    return local_df(spark, sorted(out, key=lambda t: tuple(map(str, t[:len(group_cols)]))), schema)


def svyby(
    design: SurveyDesign,
    by: str | list[str],
    y_col: str,
    stat: str = "mean",
    **kwargs,
) -> DataFrame:
    """Per-domain survey statistics — the ``survey::svyby`` dispatcher.
    Every underlying kernel already vectorizes over ``group_cols`` (one
    grouped pass, stacked driver solves), so this is a thin front door:

    - ``stat="mean"`` / ``"total"`` / ``"var"``: estimate +
      linearization SE + n (``var`` = the r6 population-variance
      functional, dispatched r7),
    - ``stat="ratio"``: pass ``den_col=``; ratio + linearization SE,
    - ``stat="quantile"``: pass ``qs=`` (and optionally ``alpha=`` for
      Woodruff CIs) — returns svyquantile's own layout,
    - ``stat="ciprop"``: proportion with logit/Wald CI.

    Returns a DataFrame keyed by the ``by`` columns."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    group_cols = [by] if isinstance(by, str) else list(by)
    if stat == "quantile":
        from data_integration_est_spark.kernels.quantile import svyquantile

        return svyquantile(design, y_col, group_cols=group_cols, **kwargs)
    if stat == "ciprop":
        return svyciprop(design, y_col, group_cols=group_cols, **kwargs)
    if stat == "mean":
        rows = svymean(design, y_col, group_cols=group_cols)
    elif stat == "total":
        rows = svytotal(design, y_col, group_cols=group_cols)
    elif stat == "var":
        rows = svyvar(design, y_col, group_cols=group_cols)
    elif stat == "ratio":
        den = kwargs.pop("den_col")
        rows = svyratio(design, y_col, den, group_cols=group_cols)
    else:
        raise ValueError(f"unknown stat {stat!r}")
    key_fields = list(design.df.select(*group_cols).schema.fields)
    schema = StructType(
        key_fields
        + [
            StructField("est", DoubleType(), True),
            StructField("se", DoubleType(), True),
            StructField("n", LongType(), False),
        ]
    )
    out = [
        tuple(r.key)
        + (
            float(r.estimate) if np.isfinite(r.estimate) else None,
            float(r.se) if np.isfinite(r.se) else None,
            int(r.n),
        )
        for r in rows
    ]
    spark = design.df.sparkSession
    return local_df(spark, 
        sorted(out, key=lambda t: tuple(map(str, t[: len(group_cols)]))),
        schema,
    )


def svyvar(
    design: SurveyDesign,
    y_col: str,
    group_cols: list[str] | None = None,
) -> list[EstimateRow]:
    """Design-based population variance — ``survey::svyvar``:
    V = sum w (y - m)^2 / sum w with the linearization SE of the
    variance FUNCTIONAL: influence u_i = w_i((y_i - m)^2 - V)/sum w
    (sum u = 0 exactly for the ratio form), Var = n/(n-1) sum u^2,
    stratified designs summing df-corrected per-stratum pieces.

    ONE distributed pass: everything is algebra in the uncentered
    moments sum w y^k (k<=2) and sum w^2 y^k (k<=4) — same pattern as
    ``svymean``/``svyratio``; only O(groups x strata) scalars reach the
    driver.

    Calibrated designs (r8): GREG-residual linearization — same
    engine-normative semantics as the calibrated svymean/svytotal/
    svyratio: the linearized variable h_i = (y_i - m)^2 - V is
    residualized against the calibration columns, e_i = h_i - xc_i'B
    with B solving (Σ d xc xc') B = Σ d xc h over the pre-calibration
    weights d; influence z_i = w_i e_i / Σw.

    r14: the w²-moments are organized as the Gram of z = [1, y, y²]
    (algebraically identical to the old Σw²y^k expansion — the
    linearized variable is z·(c, -2m, 1) with c = m² - V), because on
    a CLUSTER design (``psu_col``) the influence is linear in (y, y²)
    only when y² is its own collapsed value column: a pseudo-element's
    y'² is NOT the PSU mean of y², so y² is materialized
    element-level BEFORE the PSU collapse."""
    group_cols = list(group_cols or [])
    if design.is_calibrated and design.calibration_cols:
        if design.psu_col:
            return _svyvar_calibrated_psu(design, y_col, group_cols)
        return _svyvar_calibrated(design, y_col, group_cols)
    strat = design.strata_col
    fpc = design.fpc_col
    df = design.df.na.drop(
        subset=[y_col, design.weight_col] + ([strat] if strat else [])
        + ([fpc] if fpc else [])
        + ([design.psu_col] if design.psu_col else [])
    )
    full_psu_n = None
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    if design.psu_col:
        df = df.withColumn("__y2__", y * y)
        df, full_psu_n = _psu_collapse(
            df, design, [y_col, "__y2__"], group_cols
        )
        y2 = F.col("__y2__").cast("double")
    else:
        y2 = y * y
    w2 = w * w
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sw"),
        F.sum(w * y).alias("swy"),
        F.sum(w * y2).alias("swy2"),
        F.sum(w2).alias("q00"),
        F.sum(w2 * y).alias("q01"),
        F.sum(w2 * y2).alias("q02"),
        F.sum(w2 * y * y).alias("q11"),
        F.sum(w2 * y * y2).alias("q12"),
        F.sum(w2 * y2 * y2).alias("q22"),
        *([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    ]
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        return float(r[name] or 0.0)

    def _n_var(r, hval):
        if full_psu_n is not None:
            return full_psu_n[hval]
        return int(r["n"])

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append((key[-1], r))
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [(None, r)]) for k, r in res.items()]

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n"]) for _, r in rows)
        sw = sum(_f(r, "sw") for _, r in rows)
        m = sum(_f(r, "swy") for _, r in rows) / sw
        V = sum(_f(r, "swy2") for _, r in rows) / sw - m * m
        c = m * m - V
        pieces = []
        for hval, r in rows:
            # sum_h w((y-m)^2 - V) and sum_h w^2 ((y-m)^2 - V)^2, the
            # latter as the quadratic form of (c, -2m, 1) over the
            # [1, y, y2] Gram
            s_h = (
                _f(r, "swy2") - 2.0 * m * _f(r, "swy")
                + (m * m - V) * _f(r, "sw")
            ) / sw
            q_h = (
                c * c * _f(r, "q00") - 4.0 * m * c * _f(r, "q01")
                + 2.0 * c * _f(r, "q02") + 4.0 * m * m * _f(r, "q11")
                - 4.0 * m * _f(r, "q12") + _f(r, "q22")
            ) / (sw * sw)
            pieces.append((
                _n_var(r, hval), s_h, q_h,
                _fpc_factor(_n_var(r, hval),
                            float(r["__N__"]) if fpc else None),
            ))
        if strat:
            var = _strat_var(pieces)
        else:
            n_h, s1, s2, f = pieces[0]
            if f == 0.0:
                var = 0.0
            elif n_h < 2:
                var = float("nan")
            else:
                var = f * n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
        out.append(EstimateRow(key=key, estimate=float(V), variance=float(var), n=n))
    return out


def _svyvar_calibrated(
    design: SurveyDesign, y_col: str, group_cols: list[str]
) -> list[EstimateRow]:
    """GREG-residual variance of the svyvar functional: the linearized
    variable h = (y-m)² - V expands in uncentered moments (m, V are
    ratios of w-sums), so ONE pass collects, per (group, stratum) cell:
    w·y^k (k≤2), w·xc_j, d-Gram of xc against (y², y, 1), and the
    w²-moments needed for the quadratic form of e = h - xc'B — w²y^k
    (k≤4), w²y^k·xc_j (k≤2), w²xc_i·xc_j.  Driver algebra then builds
    B, the per-stratum influence sums, and the df-corrected variance."""
    strat = design.strata_col
    fpc = design.fpc_col
    xcols = list(design.calibration_cols)
    kx = len(xcols)
    subset = list(dict.fromkeys(
        [y_col, design.weight_col, design.base_weight_col]
        + xcols + ([strat] if strat else []) + ([fpc] if fpc else [])
    ))
    df = design.df.na.drop(subset=subset)
    w = F.col(design.weight_col).cast("double")
    d = F.col(design.base_weight_col).cast("double")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in xcols]
    w2 = w * w
    aggs: list[Column] = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sw"),
        F.sum(w * y).alias("swy"),
        F.sum(w * y * y).alias("swy2"),
        *[F.sum(w * xs[j]).alias(f"swc_{j}") for j in range(kx)],
        *[F.sum(w2 * F.pow(y, k)).alias(f"s{k}") for k in range(5)],
        *([F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []),
    ]
    for j in range(kx):
        aggs.append(F.sum(d * xs[j] * y * y).alias(f"gy2_{j}"))
        aggs.append(F.sum(d * xs[j] * y).alias(f"gy_{j}"))
        aggs.append(F.sum(d * xs[j]).alias(f"g1_{j}"))
        aggs.append(F.sum(w2 * xs[j] * y * y).alias(f"cy2_{j}"))
        aggs.append(F.sum(w2 * xs[j] * y).alias(f"cy_{j}"))
        aggs.append(F.sum(w2 * xs[j]).alias(f"c1_{j}"))
        for i in range(j, kx):
            aggs.append(F.sum(d * xs[j] * xs[i]).alias(f"g_{j}_{i}"))
            aggs.append(F.sum(w2 * xs[j] * xs[i]).alias(f"p_{j}_{i}"))
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        v = r[name]
        return 0.0 if v is None else float(v)

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append(r)
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [r]) for k, r in res.items()]

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n"]) for r in rows)
        W = sum(_f(r, "sw") for r in rows)
        m = sum(_f(r, "swy") for r in rows) / W
        V = sum(_f(r, "swy2") for r in rows) / W - m * m
        c0 = m * m - V
        G = np.zeros((kx, kx))
        rhs = np.zeros(kx)
        for r in rows:
            for j in range(kx):
                for i in range(j, kx):
                    v = _f(r, f"g_{j}_{i}")
                    G[j, i] += v
                    if i != j:
                        G[i, j] += v
                rhs[j] += (
                    _f(r, f"gy2_{j}") - 2.0 * m * _f(r, f"gy_{j}")
                    + c0 * _f(r, f"g1_{j}")
                )
        B = _solve_stacked(
            G[None, ...], rhs[None, :, None], "svyvar residual projection"
        ).ravel()
        pieces = []
        for r in rows:
            # Σ_h w·e  with e = (y-m)² - V - xc'B
            s1 = (
                _f(r, "swy2") - 2.0 * m * _f(r, "swy") + c0 * _f(r, "sw")
                - sum(B[j] * _f(r, f"swc_{j}") for j in range(kx))
            ) / W
            # Σ_h w²·e²: A - 2 B'C + B'P B in expanded moments
            A = (
                _f(r, "s4") - 4.0 * m * _f(r, "s3")
                + (4.0 * m * m + 2.0 * c0) * _f(r, "s2")
                - 4.0 * m * c0 * _f(r, "s1") + c0 * c0 * _f(r, "s0")
            )
            C = np.array([
                _f(r, f"cy2_{j}") - 2.0 * m * _f(r, f"cy_{j}")
                + c0 * _f(r, f"c1_{j}")
                for j in range(kx)
            ])
            P = np.zeros((kx, kx))
            for j in range(kx):
                for i in range(j, kx):
                    P[j, i] = P[i, j] = _f(r, f"p_{j}_{i}")
            s2 = float(A - 2.0 * B @ C + B @ P @ B) / (W * W)
            pieces.append((
                int(r["n"]), s1, s2,
                _fpc_factor(int(r["n"]), float(r["__N__"]) if fpc else None),
            ))
        if strat:
            var = _strat_var(pieces)
        else:
            f = pieces[0][3]
            if f == 0.0:
                var = 0.0
            elif n < 2:
                var = float("nan")
            else:
                var = f * n / (n - 1.0) * (pieces[0][2] - pieces[0][1] ** 2 / n)
        out.append(EstimateRow(key=key, estimate=float(V), variance=float(var), n=n))
    return out


def pairwise_corr(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Long-form Pearson correlation matrix over ``cols`` — ONE
    aggregation pass carrying the k(k+3)/2 uncentered moments (sums,
    squares, cross-products) per group; the driver never sees row data.
    Listwise-complete: rows with a null in ANY of ``cols`` are dropped
    first (the semantics a SQL ``corr`` replays after the same filter —
    pairwise-complete would need per-pair n's and is a different
    estimator).  Returns (group_cols..., col_a, col_b, corr, n) for the
    strict upper triangle, col_a < col_b alphabetically."""
    if len(cols) < 2:
        raise ValueError("pairwise_corr needs at least 2 columns")
    group_cols = list(group_cols or [])
    cs = sorted(cols)
    work = df.na.drop(subset=cs)
    xs = {c: F.col(c).cast("double") for c in cs}
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, a in enumerate(cs):
        aggs.append(F.sum(xs[a]).alias(f"s_{i}"))
        for j in range(i, len(cs)):
            aggs.append(F.sum(xs[a] * xs[cs[j]]).alias(f"q_{i}_{j}"))
    res = _collect_keyed(work, group_cols, aggs)
    rows = []
    for key, r in res.items():
        n = int(r["__n__"])
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                if n < 2:
                    c = None
                else:
                    sa, sb = float(r[f"s_{i}"] or 0), float(r[f"s_{j}"] or 0)
                    qab = float(r[f"q_{i}_{j}"] or 0)
                    qaa = float(r[f"q_{i}_{i}"] or 0)
                    qbb = float(r[f"q_{j}_{j}"] or 0)
                    cov = qab - sa * sb / n
                    va = qaa - sa * sa / n
                    vb = qbb - sb * sb / n
                    c = (
                        None if va <= 0 or vb <= 0
                        else cov / (va * vb) ** 0.5
                    )
                rows.append(
                    tuple(key) + (cs[i], cs[j],
                                  None if c is None else round(c, 6), n)
                )
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    key_fields = (
        list(df.select(*group_cols).schema.fields) if group_cols else []
    )
    schema = StructType(
        key_fields
        + [
            StructField("col_a", StringType(), False),
            StructField("col_b", StringType(), False),
            StructField("corr", DoubleType(), True),
            StructField("n", LongType(), False),
        ]
    )
    return local_df(df.sparkSession, 
        sorted(rows, key=lambda t: tuple(map(str, t))), schema
    )


def design_effect(
    design: SurveyDesign,
    y_col: str,
    group_cols: list[str] | None = None,
    with_replacement: bool = False,
    statistic: str = "mean",
    den_col: str | None = None,
) -> list[EstimateRow]:
    """Design effect — ``survey::svymean/svytotal/svyratio(deff=)``'s
    concept: DEFF = V_design(stat) / V_srs(stat), the variance cost (or
    gain) of the actual design against a simple random sample of the
    same size.  Engine-normative SRS denominator (documented here, as
    with the §4.3-2 variance formulas):

        V_srs(mean)  = f * S2 / n
        V_srs(total) = W^2 * f * S2 / n
        V_srs(ratio) = f * S2_d / n,  d_i = (y_i - R x_i) / mx
        f = (1 - n/W)  (without replacement; W = sum of weights = N-hat)
        f = 1          (``with_replacement=True``)
        S2 = [sum w (y - m)^2 / sum w] * W/(W - 1)

    i.e. the svyvar population-variance functional with a Bessel-style
    N-hat correction; the ratio denominator is the SRS variance of the
    linearized variable (population residual moments, same W/(W-1)
    correction).  ``statistic`` picks 'mean' | 'total' | 'ratio'
    ('ratio' needs ``den_col``; ``y_col`` is the numerator).  Returns
    EstimateRows whose ``estimate`` is the DEFF, ``variance`` the
    design variance it was computed from, and ``n`` the group size.
    Two kernel calls = two distributed passes (the estimator kernel's
    moment pass + one SRS-moment pass); O(groups) driver scalars.

    Cluster designs (``psu_col``) are honored BY DELEGATION (r15,
    pinned in ``tests/test_r15_psu.py``): the design-variance numerator
    comes from svymean/svytotal/svyratio/svyvar, all of which collapse
    to PSU totals, while the SRS denominator is deliberately
    element-level — DEFF compares the actual design against an SRS of
    the same number of ELEMENTS (``survey``'s deff semantics), so its
    f = 1 − n/W and S²/n use element counts and design-free population
    moments that no collapse can change."""
    group_cols = list(group_cols or [])
    if statistic not in ("mean", "total", "ratio"):
        raise ValueError("statistic must be 'mean', 'total', or 'ratio'")
    if statistic == "ratio" and den_col is None:
        raise ValueError("statistic='ratio' needs den_col")
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")

    if statistic == "ratio":
        x = F.col(den_col).cast("double")
        des = {r.key: r for r in
               svyratio(design, y_col, den_col, group_cols=group_cols)}
        sums = _collect_keyed(
            design.df.na.drop(subset=[y_col, den_col, design.weight_col]),
            group_cols,
            [
                F.sum(w).alias("__W__"),
                F.count(F.lit(1)).alias("__n__"),
                F.sum(w * x).alias("__swx__"),
                F.sum(w * y).alias("__swy__"),
                F.sum(w * x * x).alias("__swxx__"),
                F.sum(w * y * y).alias("__swyy__"),
                F.sum(w * x * y).alias("__swxy__"),
            ],
        )
    else:
        kern = svymean if statistic == "mean" else svytotal
        des = {r.key: r for r in kern(design, y_col, group_cols=group_cols)}
        svars = {r.key: r for r in svyvar(design, y_col, group_cols=group_cols)}
        sums = _collect_keyed(
            design.df.na.drop(subset=[y_col, design.weight_col]),
            group_cols,
            [F.sum(w).alias("__W__"), F.count(F.lit(1)).alias("__n__")],
        )

    out = []
    for key, d in des.items():
        W = float(sums[key]["__W__"])
        n = int(sums[key]["__n__"])
        f = 1.0 if with_replacement else max(0.0, 1.0 - n / W)
        if statistic == "ratio":
            r = sums[key]
            swx, swy = float(r["__swx__"] or 0.0), float(r["__swy__"] or 0.0)
            mx, my = swx / W, swy / W
            vx = float(r["__swxx__"] or 0.0) / W - mx * mx
            vy = float(r["__swyy__"] or 0.0) / W - my * my
            cxy = float(r["__swxy__"] or 0.0) / W - mx * my
            if swx == 0.0 or mx == 0.0 or W <= 1.0:
                out.append(EstimateRow(key=key, estimate=float("nan"),
                                       variance=float(d.variance), n=n))
                continue
            ratio = swy / swx
            s2d = ((vy - 2.0 * ratio * cxy + ratio * ratio * vx)
                   / (mx * mx)) * (W / (W - 1.0))
            v_srs = f * s2d / n if n else float("nan")
        else:
            S2 = (svars[key].estimate * (W / (W - 1.0))
                  if W > 1.0 else float("nan"))
            v_srs = f * S2 / n if n else float("nan")
            if statistic == "total":
                v_srs *= W * W
        deff = d.variance / v_srs if v_srs and v_srs > 0 else float("nan")
        out.append(EstimateRow(key=key, estimate=float(deff),
                               variance=float(d.variance), n=n))
    return out


def svycov(
    design: SurveyDesign,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> list[EstimateRow]:
    """Design-based population covariance — the off-diagonal of
    ``survey::svyvar``'s matrix form: C = Σw(x−mx)(y−my)/Σw with the
    linearization SE of the covariance FUNCTIONAL (influence
    u_i = w_i[(x_i−mx)(y_i−my) − C]/Σw; Σu = 0 exactly for the ratio
    form), stratified designs summing df-corrected per-stratum pieces
    with the fpc factor.  ONE distributed pass of uncentered
    (w, w²)-weighted cross-moments up to total degree 4 — the svyvar
    pattern with two variables.

    Cluster designs (``psu_col``, r15): the influence is linear in
    (x, y, xy) once the product is its own element column — a
    pseudo-element's x'y' is NOT the PSU mean of xy, so xy is
    materialized BEFORE the ``_psu_collapse`` (the svyvar y² rule) and
    the w²-Gram runs over the basis (1, x, y, p=xy) with coefficient
    vector (k0, −my, −mx, 1)."""
    group_cols = list(group_cols or [])
    strat = design.strata_col
    fpc = design.fpc_col
    _psu_refuses_calibration(design, "svycov")
    if design.psu_col:
        return _svycov_psu(design, x_col, y_col, group_cols)
    df = design.df.na.drop(
        subset=[x_col, y_col, design.weight_col] + ([strat] if strat else [])
        + ([fpc] if fpc else [])
    )
    w = F.col(design.weight_col).cast("double")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    w2 = w * w
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sw"),
        F.sum(w * x).alias("swx"),
        F.sum(w * y).alias("swy"),
        F.sum(w * x * y).alias("swxy"),
    ]
    # w²-weighted moments of x^a y^b for a,b <= 2 (the quadratic form
    # of u needs (xy, x, y, 1) cross products)
    for a in range(3):
        for b in range(3):
            if a + b == 0:
                aggs.append(F.sum(w2).alias("m_0_0"))
            else:
                aggs.append(
                    F.sum(w2 * F.pow(x, a) * F.pow(y, b)).alias(f"m_{a}_{b}")
                )
    aggs += (
        [F.max(F.col(fpc).cast("double")).alias("__N__")] if fpc else []
    )
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        return float(r[name] or 0.0)

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append(r)
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [r]) for k, r in res.items()]

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n"]) for r in rows)
        sw = sum(_f(r, "sw") for r in rows)
        mx = sum(_f(r, "swx") for r in rows) / sw
        my = sum(_f(r, "swy") for r in rows) / sw
        C = sum(_f(r, "swxy") for r in rows) / sw - mx * my
        # e_i = (x-mx)(y-my) - C = xy - my*x - mx*y + (mx*my - C)
        k0 = mx * my - C
        cvec = {(1, 1): 1.0, (1, 0): -my, (0, 1): -mx, (0, 0): k0}
        pieces = []
        for r in rows:
            s_h = (
                _f(r, "swxy") - my * _f(r, "swx") - mx * _f(r, "swy")
                + k0 * _f(r, "sw")
            ) / sw
            q_h = 0.0
            for (a1, b1), c1 in cvec.items():
                for (a2, b2), c2 in cvec.items():
                    q_h += c1 * c2 * _f(r, f"m_{a1 + a2}_{b1 + b2}")
            q_h /= sw * sw
            pieces.append((
                int(r["n"]), s_h, q_h,
                _fpc_factor(int(r["n"]), float(r["__N__"]) if fpc else None),
            ))
        if strat:
            var = _strat_var(pieces)
        else:
            n_h, s1, s2, fct = pieces[0]
            if fct == 0.0:
                var = 0.0
            elif n < 2:
                var = float("nan")
            else:
                var = fct * n / (n - 1.0) * (s2 - s1 * s1 / n)
        out.append(EstimateRow(key=key, estimate=float(C), variance=float(var), n=n))
    return out


def _svycov_psu(
    design: SurveyDesign,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> list[EstimateRow]:
    """svycov on a two-stage cluster design: materialize p = x·y
    element-level, ``_psu_collapse`` on [x, y, p], then the same
    ratio-functional linearization with the w'²-Gram over the basis
    b = (1, x', y', p') — every Gram entry is exactly the PSU-total
    Gram the first-stage with-replacement variance needs.  Same one
    distributed pass (plus the collapse's map-side-combining groupBy);
    ``n`` in the output is the sampled-PSU count (the svyvar psu
    convention); domain estimation uses the FULL-design PSU count for
    d.o.f. (PSUs with no in-domain rows contribute zero totals)."""
    strat = design.strata_col
    fpc = design.fpc_col
    df = design.df.na.drop(
        subset=[x_col, y_col, design.weight_col, design.psu_col]
        + ([strat] if strat else []) + ([fpc] if fpc else [])
    )
    xe = F.col(x_col).cast("double")
    ye = F.col(y_col).cast("double")
    df = df.withColumn("__p__", xe * ye)
    df, full_psu_n = _psu_collapse(
        df, design, [x_col, y_col, "__p__"], group_cols
    )
    w = F.col(design.weight_col).cast("double")
    w2 = w * w
    # basis (1, x, y, p): first moments + the 10-entry symmetric Gram
    basis = {
        "1": F.lit(1.0),
        "x": F.col(x_col).cast("double"),
        "y": F.col(y_col).cast("double"),
        "p": F.col("__p__").cast("double"),
    }
    names = ["1", "x", "y", "p"]
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sw"),
        F.sum(w * basis["x"]).alias("swx"),
        F.sum(w * basis["y"]).alias("swy"),
        F.sum(w * basis["p"]).alias("swp"),
    ]
    for i, u in enumerate(names):
        for v in names[i:]:
            aggs.append(F.sum(w2 * basis[u] * basis[v]).alias(f"g_{u}_{v}"))
    if fpc:
        aggs.append(F.max(F.col(fpc).cast("double")).alias("__N__"))
    res = _collect_keyed(df, group_cols + ([strat] if strat else []), aggs)

    def _f(r, name):
        return float(r[name] or 0.0)

    pairs = {(u, v) for i, u in enumerate(names) for v in names[i:]}

    def _g(r, u, v):
        return _f(r, f"g_{u}_{v}" if (u, v) in pairs else f"g_{v}_{u}")

    def _n_var(r, hval):
        if full_psu_n is not None:
            return full_psu_n[hval]
        return int(r["n"])

    if strat:
        grouped: dict[tuple, list] = {}
        for key, r in res.items():
            grouped.setdefault(key[:-1], []).append((key[-1], r))
        items = [(k, rows) for k, rows in grouped.items()]
    else:
        items = [(k, [(None, r)]) for k, r in res.items()]

    out: list[EstimateRow] = []
    for key, rows in items:
        n = sum(int(r["n"]) for _, r in rows)
        sw = sum(_f(r, "sw") for _, r in rows)
        mx = sum(_f(r, "swx") for _, r in rows) / sw
        my = sum(_f(r, "swy") for _, r in rows) / sw
        C = sum(_f(r, "swp") for _, r in rows) / sw - mx * my
        k0 = mx * my - C
        cvec = {"p": 1.0, "x": -my, "y": -mx, "1": k0}
        pieces = []
        for hval, r in rows:
            s_h = (
                _f(r, "swp") - my * _f(r, "swx") - mx * _f(r, "swy")
                + k0 * _f(r, "sw")
            ) / sw
            q_h = 0.0
            for u, cu in cvec.items():
                for v, cv in cvec.items():
                    q_h += cu * cv * _g(r, u, v)
            q_h /= sw * sw
            pieces.append((
                _n_var(r, hval), s_h, q_h,
                _fpc_factor(_n_var(r, hval),
                            float(r["__N__"]) if fpc else None),
            ))
        if strat:
            var = _strat_var(pieces)
        else:
            n_h, s1, s2, fct = pieces[0]
            if fct == 0.0:
                var = 0.0
            elif n_h < 2:
                var = float("nan")
            else:
                var = fct * n_h / (n_h - 1.0) * (s2 - s1 * s1 / n_h)
        out.append(EstimateRow(key=key, estimate=float(C), variance=float(var), n=n))
    return out
