"""Inverse-propensity weighting for non-probability samples (Chen, Li
& Wu 2020, JASA, "Doubly robust inference with non-probability survey
samples") — the canonical modern estimator for the reference's exact
problem setting: a big non-probability sample B with the outcome, a
probability sample A with design weights carrying the covariates.

The participation propensity pi(x) = P(i in B | x) is fit by the CLW
PSEUDO-log-likelihood over the combined sample,

    l(theta) = sum_B x_i' theta - sum_A d_i log(1 + exp(x_i' theta)),

whose score and Hessian are plain weighted moments:

    U(theta) = sum_B x_i - sum_A d_i p_i x_i
    H(theta) = - sum_A d_i p_i (1 - p_i) x_i x_i'

(the design-weighted A sample estimates the population integral the
likelihood needs — this is NOT ordinary logistic regression on B vs A
membership; the reference's ``PC.R`` scenario-2 models the same
selection with a different normalization, cited for parity not code).

Estimators returned:

  IPW:  mu = sum_B (y_i / p_i) / sum_B (1 / p_i)       (Hajek form)
  DR:   mu = [sum_B (y_i - m_i)/p_i + sum_A d_i m_i] / N_hat,
        N_hat = sum_A d_i, with m(x) = x'beta an OLS outcome model on B
        — consistent if EITHER the propensity or the outcome model
        holds (CLW eq. 9).

Variance (``variance=True``): the plug-in SANDWICH over the joint
estimating equations (CLW §4's linearization strategy; the reference
reports an SE for every estimator it ships — ``RegDI2.R:327-332``,
``PC.R:249-253`` — so an SE-less IPW mean could not sit in its MC
bias/SE tables).  With U1 the pseudo-score, S = sum_B 1/p, and the
Hajek mean solving U2(mu) = sum_B (y-mu)/p = 0,

    mu_hat - mu ≈ [U2 + b' U1] / S,     b = H^{-1} dU2/dtheta,

so Var(mu_IPW) is a B-side Poisson-plugin term plus the A-design term:

    V = { sum_B (1-p_i) [ (y_i-mu)/p_i + b'x_i ]^2  +  b' V_A b } / S^2

with V_A the with-replacement design variance estimator of the A total
sum_A d_i p_i x_i (the standard ``svydesign`` WR approximation).  The
DR variance linearizes over (theta, beta, mu) the same way — per-B
influence (y-m)/p + bt'x + (bb'x_o)(y-m), per-A influence
d[(m-mu) - p bt'x] — everything a masked-moment pass.

Spark-first decomposition: every Newton step is ONE aggregation pass
over the stacked frame (indicator-masked moments, k x k to the
driver); the OLS outcome model is one Gram pass; the final estimators
are one more masked-moment pass with theta/beta folded in as column
literals, and the variance adds exactly one further pass with
mu/b/bt/bb folded in.  Nothing O(N) reaches the driver, plan depth is
constant in n_iter only through the literal folding (each iteration
re-derives p_i from the RAW columns, not from a chained plan).

NULL layout: the natural stacked frame carries ``weight_A_col`` only
on A rows and ``y_col`` only on B rows.  Every masked moment therefore
COALESCES d and y to 0.0 — without that, a fused term like
``b*x - a*d*p*x`` evaluates ``0*NULL = NULL`` on B-only rows and
Spark's null-skipping ``sum`` silently DROPS the live ``b*x`` part,
biasing the score (the round-9 HIGH defect).  A loud one-pass
validation rejects frames where d (resp. y, x) is null on a row whose
mask actually needs it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IPWError(ValueError):
    pass


@dataclass(frozen=True)
class IPWResult:
    mean_ipw: float
    mean_dr: float | None
    theta: tuple          # propensity coefficients (intercept first)
    beta: tuple | None    # outcome-model coefficients (DR only)
    n_a: int
    n_b: int
    n_hat: float          # sum of A design weights
    sum_invp_b: float     # sum_B 1/p_i (IPW denominator)
    n_iter: int
    var_ipw: float | None = None   # sandwich variance of mean_ipw
    se_ipw: float | None = None
    var_dr: float | None = None    # sandwich variance of mean_dr
    se_dr: float | None = None


def _xs(x_cols: list, intercept: bool) -> list:
    xs = ["1.0"] if intercept else []
    xs += [f"CAST({c} AS DOUBLE)" for c in x_cols]
    return xs


def _dot(vec, xs) -> str:
    return "(" + " + ".join(
        f"({float(vec[i])!r}) * {xs[i]}" for i in range(len(xs))
    ) + ")"


def propensity_weighted_mean(
    df: DataFrame,
    y_col: str,
    x_cols: list,
    ind_A: str,
    ind_B: str,
    weight_A_col: str | None = None,
    intercept: bool = True,
    n_iter: int = 15,
    augment: bool = True,
    outcome_x_cols: list | None = None,
    variance: bool = True,
    tol: float = 1e-10,
) -> IPWResult:
    """Fit the CLW propensity model and return the IPW (and, with
    ``augment=True``, the doubly robust) mean of ``y_col``, each with
    its plug-in sandwich SE when ``variance=True``.

    ``df`` is the stacked frame: ``ind_A``/``ind_B`` are 0/1 sample
    indicators (a unit may be in both); ``y_col`` must be non-null
    wherever ``ind_B = 1`` (and MAY be null elsewhere);
    ``weight_A_col`` are A's design weights, required non-null only
    where ``ind_A = 1`` (default 1.0 — a self-weighting A sample).

    ``outcome_x_cols`` (default: ``x_cols``) are the DR outcome-model
    regressors — deliberately decoupled from the propensity model's,
    because double robustness is exactly the promise that ONE of the
    two specifications may be wrong.
    """
    if outcome_x_cols is None:
        outcome_x_cols = list(x_cols)
    for c in [y_col, ind_A, ind_B, *x_cols, *outcome_x_cols] + (
        [weight_A_col] if weight_A_col else []
    ):
        if c not in df.columns:
            raise IPWError(f"column '{c}' not found")
    k = len(x_cols) + int(intercept)
    if k == 0:
        raise IPWError("propensity model needs at least one regressor")

    xs = _xs(x_cols, intercept)
    a = f"CAST({ind_A} AS DOUBLE)"
    b = f"CAST({ind_B} AS DOUBLE)"
    # COALESCE is load-bearing: d lives only on A rows and y only on B
    # rows in the natural stacked layout; an un-coalesced NULL poisons
    # the whole fused product and sum() silently drops the term.
    d = (
        f"COALESCE(CAST({weight_A_col} AS DOUBLE), 0.0)"
        if weight_A_col
        else "1.0"
    )
    y = f"COALESCE(CAST({y_col} AS DOUBLE), 0.0)"

    # ---- loud one-pass validation of the null layout ----
    is_a = F.col(ind_A).cast("int") == 1
    is_b = F.col(ind_B).cast("int") == 1
    checks = [("y_null_on_B", is_b & F.col(y_col).isNull())]
    if weight_A_col:
        checks.append(
            ("weight_null_on_A", is_a & F.col(weight_A_col).isNull())
        )
    for c in dict.fromkeys([*x_cols, *outcome_x_cols]):
        checks.append(
            (f"x_null[{c}]", (is_a | is_b) & F.col(c).isNull())
        )
    bad = (
        df.select(
            *[cond.cast("long").alias(name) for name, cond in checks]
        )
        .agg(*[F.sum(name).alias(name) for name, _ in checks])
        .collect()[0]
    )
    if bad["y_null_on_B"]:
        raise IPWError(
            f"'{y_col}' is null on an ind_B=1 row "
            f"({bad['y_null_on_B']} rows)"
        )
    if weight_A_col and bad["weight_null_on_A"]:
        raise IPWError(
            f"'{weight_A_col}' is null on an ind_A=1 row "
            f"({bad['weight_null_on_A']} rows)"
        )
    for name, _ in checks[1 + bool(weight_A_col):]:
        if bad[name]:
            raise IPWError(
                f"regressor {name.split('[')[1][:-1]!r} is null on "
                f"{bad[name]} in-sample (ind_A=1 or ind_B=1) rows"
            )

    def eta(th: np.ndarray) -> str:
        return _dot(th, xs)

    def sig(e: str) -> str:
        # exp(-eta) overflows to inf for eta < ~-745, collapsing the
        # sigmoid to an EXACT 0.0 — and every /p division then raises
        # under ANSI mode (even on masked rows, since the divide
        # evaluates before the 0-mask multiplies).  The 1e-300 floor
        # binds only when p has underflowed (p < 1e-300 is far beyond
        # any finite eta's true sigmoid resolution), so clamped and
        # unclamped results are bit-identical whenever the model is
        # sane — this is an overflow guard, not a reweighting.
        return f"greatest(1e-300, (1.0 / (1.0 + exp(-{e}))))"

    # ---- Newton on the pseudo-likelihood: one agg pass per step ----
    # n_iter is the CAP; the loop stops as soon as max|step| < tol
    # (below 1e-10 further steps are FP noise — invisible at the gate's
    # 6-dp rounding and at the vectorized==scalar 1e-9 pin, same early
    # stop as ``vectorized.clw_grouped``).  tol=0 restores the exact
    # fixed-iteration behavior.
    theta = np.zeros(k)
    for _ in range(n_iter):
        p = sig(eta(theta))
        exprs = []
        for i in range(k):
            exprs.append(
                F.expr(f"sum({b} * {xs[i]} - {a} * {d} * {p} * {xs[i]})")
                .alias(f"u{i}")
            )
            for j in range(i, k):
                exprs.append(
                    F.expr(
                        f"sum({a} * {d} * {p} * (1.0 - {p}) * {xs[i]} * {xs[j]})"
                    ).alias(f"h{i}{j}")
                )
        r = df.agg(*exprs).collect()[0]
        H = np.empty((k, k))
        for i in range(k):
            for j in range(i, k):
                H[i, j] = H[j, i] = float(r[f"h{i}{j}"])
        U = np.array([float(r[f"u{i}"]) for i in range(k)])
        try:
            step = np.linalg.solve(H, U)
        except np.linalg.LinAlgError as e:
            raise IPWError(
                f"singular pseudo-likelihood Hessian (separable x?): {e}"
            ) from e
        theta = theta + step
        if tol > 0.0 and float(np.max(np.abs(step))) < tol:
            break

    p = sig(eta(theta))

    beta = None
    G = None
    oxs = _xs(outcome_x_cols, intercept)
    ko = len(oxs)
    if augment:
        # outcome model on B: OLS of y on outcome_x (CLW eq. 8 m(x))
        exprs = []
        for i in range(ko):
            exprs.append(F.expr(f"sum({b} * {oxs[i]} * {y})").alias(f"xy{i}"))
            for j in range(i, ko):
                exprs.append(
                    F.expr(f"sum({b} * {oxs[i]} * {oxs[j]})").alias(f"xx{i}{j}")
                )
        r = df.agg(*exprs).collect()[0]
        G = np.empty((ko, ko))
        for i in range(ko):
            for j in range(i, ko):
                G[i, j] = G[j, i] = float(r[f"xx{i}{j}"])
        try:
            beta = np.linalg.solve(
                G, np.array([float(r[f"xy{i}"]) for i in range(ko)])
            )
        except np.linalg.LinAlgError as e:
            raise IPWError(f"singular B-sample outcome Gram: {e}") from e

    # ---- final masked-moment pass: all estimators at once ----
    final = [
        F.expr(f"sum({a})").alias("na"),
        F.expr(f"sum({b})").alias("nb"),
        F.expr(f"sum({a} * {d})").alias("nhat"),
        F.expr(f"sum({b} / {p})").alias("sinv"),
        F.expr(f"sum({b} * {y} / {p})").alias("sy"),
    ]
    m = _dot(beta, oxs) if augment else None
    if augment:
        final.append(F.expr(f"sum({b} * ({y} - {m}) / {p})").alias("sres"))
        final.append(F.expr(f"sum({a} * {d} * {m})").alias("sma"))
    if variance:
        # Hessian at the FINAL theta + the dmu/dtheta and dmu/dbeta
        # cross-moments the sandwich needs (mu-free decompositions so
        # everything fits in this same single pass).
        for i in range(k):
            for j in range(i, k):
                final.append(
                    F.expr(
                        f"sum({a} * {d} * {p} * (1.0 - {p})"
                        f" * {xs[i]} * {xs[j]})"
                    ).alias(f"h{i}{j}")
                )
        for i in range(k):
            final.append(
                F.expr(f"sum({b} * (1.0 - {p}) / {p} * {y} * {xs[i]})")
                .alias(f"gy{i}")
            )
            final.append(
                F.expr(f"sum({b} * (1.0 - {p}) / {p} * {xs[i]})")
                .alias(f"gs{i}")
            )
            if augment:
                final.append(
                    F.expr(
                        f"sum({b} * (1.0 - {p}) / {p} * ({y} - {m})"
                        f" * {xs[i]})"
                    ).alias(f"gt{i}")
                )
        if augment:
            for i in range(ko):
                final.append(
                    F.expr(f"sum({b} * {oxs[i]} / {p})").alias(f"gb1{i}")
                )
                final.append(
                    F.expr(f"sum({a} * {d} * {oxs[i]})").alias(f"gb2{i}")
                )
    r = df.agg(*final).collect()[0]
    if not r["nb"]:
        raise IPWError("no units with ind_B = 1")
    if not r["nhat"]:
        raise IPWError("no units with ind_A = 1 (or zero design weights)")

    if not (0.0 < float(r["sinv"]) < 1e100):
        raise IPWError(
            "propensity fit diverged: sum_B 1/p = %r — the selection is "
            "(quasi-)separable in x, so some B unit's fitted propensity "
            "underflowed; revisit the propensity model" % (r["sinv"],)
        )
    mean_ipw = float(r["sy"]) / float(r["sinv"])
    mean_dr = (
        (float(r["sres"]) + float(r["sma"])) / float(r["nhat"])
        if augment
        else None
    )

    var_ipw = se_ipw = var_dr = se_dr = None
    if variance and int(r["na"]) >= 2:
        na = float(r["na"])
        Hf = np.empty((k, k))
        for i in range(k):
            for j in range(i, k):
                Hf[i, j] = Hf[j, i] = float(r[f"h{i}{j}"])
        # b_ipw = H^{-1} dU2/dtheta, dU2/dtheta = -(gy - mu*gs)
        g_ipw = -(
            np.array([float(r[f"gy{i}"]) for i in range(k)])
            - mean_ipw * np.array([float(r[f"gs{i}"]) for i in range(k)])
        )
        b_ipw = np.linalg.solve(Hf, g_ipw)
        bt = bb = None
        if augment:
            gt = np.array([float(r[f"gt{i}"]) for i in range(k)])
            b_dr_theta = np.linalg.solve(Hf, -gt)
            g_beta = -np.array(
                [float(r[f"gb1{i}"]) for i in range(ko)]
            ) + np.array([float(r[f"gb2{i}"]) for i in range(ko)])
            b_dr_beta = np.linalg.solve(G, g_beta)
            bt, bb = b_dr_theta, b_dr_beta

        # ---- one extra pass: squared-influence moments ----
        bx = _dot(b_ipw, xs)
        vexprs = [
            F.expr(
                f"sum({b} * (1.0 - {p}) * pow(({y} - ({mean_ipw!r})) / {p}"
                f" + {bx}, 2))"
            ).alias("vb_ipw"),
            F.expr(f"sum({a} * {d} * {p} * {bx})").alias("za1_ipw"),
            F.expr(f"sum({a} * pow({d} * {p} * {bx}, 2))").alias("za2_ipw"),
        ]
        if augment:
            btx = _dot(bt, xs)
            bbo = _dot(bb, oxs)
            zdr = f"({d} * (({m} - ({mean_dr!r})) - {p} * {btx}))"
            vexprs += [
                F.expr(
                    f"sum({b} * (1.0 - {p}) * pow(({y} - {m}) / {p}"
                    f" + {btx} + {bbo} * ({y} - {m}), 2))"
                ).alias("vb_dr"),
                F.expr(f"sum({a} * {zdr})").alias("za1_dr"),
                F.expr(f"sum({a} * pow({zdr}, 2))").alias("za2_dr"),
            ]
        v = df.agg(*vexprs).collect()[0]

        def _wr(s1: float, s2: float) -> float:
            # with-replacement design variance of an A total from the
            # per-unit sums s1 = sum z_i, s2 = sum z_i^2
            return na / (na - 1.0) * (s2 - s1 * s1 / na)

        var_ipw = (
            float(v["vb_ipw"])
            + _wr(float(v["za1_ipw"]), float(v["za2_ipw"]))
        ) / float(r["sinv"]) ** 2
        var_ipw = max(var_ipw, 0.0)
        se_ipw = float(np.sqrt(var_ipw))
        if augment:
            var_dr = (
                float(v["vb_dr"])
                + _wr(float(v["za1_dr"]), float(v["za2_dr"]))
            ) / float(r["nhat"]) ** 2
            var_dr = max(var_dr, 0.0)
            se_dr = float(np.sqrt(var_dr))

    return IPWResult(
        mean_ipw=mean_ipw,
        mean_dr=mean_dr,
        theta=tuple(float(t) for t in theta),
        beta=tuple(float(v) for v in beta) if beta is not None else None,
        n_a=int(r["na"]),
        n_b=int(r["nb"]),
        n_hat=float(r["nhat"]),
        sum_invp_b=float(r["sinv"]),
        n_iter=n_iter,
        var_ipw=var_ipw,
        se_ipw=se_ipw,
        var_dr=var_dr,
        se_dr=se_dr,
    )
