"""Independent single-node numpy oracle for the statistical layer.

Implements GREG calibration, OLS, IRLS logistic, the engine-normative
design-based variance, and the RegDI / PC estimator compositions directly
from the reference semantics (RegDI2.R / PC.R) — written against numpy
arrays with NO shared code with the Spark engine, so estimator tests are a
genuine cross-check (SURVEY.md §5.2 t2 'statistical layer')."""

from __future__ import annotations

import numpy as np


def greg_calibrate(X: np.ndarray, d: np.ndarray, totals: np.ndarray) -> np.ndarray:
    A = (X * d[:, None]).T @ X
    lam = np.linalg.solve(A, totals - X.T @ d)
    return d * (1.0 + X @ lam)


def ols(X: np.ndarray, y: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    w = np.ones(len(y)) if w is None else w
    A = (X * w[:, None]).T @ X
    b = (X * w[:, None]).T @ y
    return np.linalg.solve(A, b)


def irls_logistic(X: np.ndarray, y: np.ndarray, max_iter: int = 50, tol: float = 1e-12):
    beta = np.zeros(X.shape[1])
    for _ in range(max_iter):
        eta = X @ beta
        p = 1.0 / (1.0 + np.exp(-eta))
        W = p * (1 - p)
        H = (X * W[:, None]).T @ X
        g = X.T @ (y - p)
        step = np.linalg.solve(H, g)
        beta += step
        if np.max(np.abs(step)) < tol:
            break
    return beta


def svymean_var(y: np.ndarray, w: np.ndarray, X: np.ndarray | None = None,
                d: np.ndarray | None = None) -> tuple[float, float]:
    """Engine-normative svymean + linearization variance (stats.py docstring)."""
    m = float(np.sum(w * y) / np.sum(w))
    z = y - m
    if X is not None:
        B = np.linalg.solve((X * d[:, None]).T @ X, (X * d[:, None]).T @ z)
        e = z - X @ B
    else:
        e = z
    u = w * e / np.sum(w)
    n = len(y)
    V = n / (n - 1.0) * float(np.sum((u - u.mean()) ** 2))
    return m, V


def regdi_np(pop: dict[str, np.ndarray], y_A_col: str, y_B_col: str,
             ind_A: str, ind_B: str, aux_vars: list[str] | None = None,
             N_total: float | None = None, correction: int = 0,
             outcome_model_cols: list[str] | None = None) -> dict:
    """Direct-mode RegDI2 (RegDI2.R:5-333) on a dict of numpy columns."""
    iA = pop[ind_A] == 1
    iB = pop[ind_B] == 1
    N = float(N_total if N_total is not None else len(pop[ind_A]))
    nA = int(iA.sum())
    d = np.where(iA, N / nA, 0.0)

    yB = np.where(iB, np.nan_to_num(pop[y_B_col]), 0.0)
    cols = {"uno": np.ones(len(iA)), "delta_i": iB.astype(float), "delta_yi": yB}
    for z in aux_vars or []:
        cols[f"delta_{z}"] = np.where(iB, pop[z], 0.0)
    names = list(cols.keys())
    Xall = np.column_stack([cols[c] for c in names])
    totals = Xall.sum(axis=0)
    totals[0] = len(iA) if N_total is None else len(iA)  # direct mode: sum(uno)=nrow

    XA = Xall[iA]
    dA = d[iA]
    w = greg_calibrate(XA, dA, totals)

    if correction in (0, 1):
        yA = pop[y_A_col][iA]
        m, V = svymean_var(yA, w, X=XA, d=dA)
        return {"mean": m, "var": V}
    if correction == 2:
        both = iA & iB
        Xv = np.column_stack([np.ones(both.sum()), pop[y_B_col][both]])
        b = ols(Xv, pop[y_A_col][both])
        y_corr = np.array(pop[y_B_col], dtype=float)
        y_corr[iA] = (pop[y_A_col][iA] - b[0]) / b[1]
        delta_yc = np.where(iB, y_corr, 0.0)
        cols2 = dict(cols)
        cols2["delta_yi"] = delta_yc  # position 2 swaps to corrected
        X2 = np.column_stack([cols2[c] for c in names])
        t2 = np.array(totals)
        t2[2] = delta_yc.sum()
        w2 = greg_calibrate(X2[iA], dA, t2)
        m, V = svymean_var(y_corr[iA], w2, X=X2[iA], d=dA)
        return {"mean": m, "var": V}
    if correction == 3:
        Xm = np.column_stack(
            [np.ones(int(iA.sum()))] + [pop[c][iA] for c in outcome_model_cols]
        )
        beta = ols(Xm, pop[y_A_col][iA])
        Xm_all = np.column_stack(
            [np.ones(len(iA))] + [pop[c] for c in outcome_model_cols]
        )
        yhat = Xm_all @ beta
        wres = (pop[y_A_col][iA] - yhat[iA]) * w
        T = (wres.sum() + yhat.sum()) / N
        V = wres.var(ddof=1) / len(wres) + yhat.var(ddof=1) / N
        return {"mean": float(T), "var": float(V)}
    raise ValueError(correction)


def pc_np(pop: dict[str, np.ndarray], y_A_col: str | None, y_B_col: str | None,
          ind_A: str, ind_B: str, aux_vars: list[str] | None = None,
          N_total: float | None = None, scenario: int = 1,
          outcome_model_cols: list[str] | None = None,
          model_type: str = "normal") -> dict:
    """Direct-mode PC_Estimator (PC.R:47-358) on a dict of numpy columns."""
    iA = pop[ind_A] == 1
    iB = pop[ind_B] == 1
    N = float(N_total if N_total is not None else len(iA))
    dA = np.where(iA, N / iA.sum(), 0.0)
    dB = np.where(iB, N / iB.sum(), 0.0)

    aux = list(aux_vars or [])
    if aux:
        Xb = np.column_stack([pop[z] for z in aux])
        totals = Xb.sum(axis=0)  # direct mode: population sums
        wB = greg_calibrate(Xb[iB], dB[iB], totals)
        XB_cal, dB_cal = Xb[iB], dB[iB]
    else:
        wB = dB[iB]
        XB_cal = dB_cal = None

    if scenario == 1:
        m, V = svymean_var(pop[y_B_col][iB], wB, X=XB_cal, d=dB_cal)
        return {"estimate": m, "se": float(np.sqrt(V))}

    def fit_predict(mask):
        Xm = np.column_stack([np.ones(int(mask.sum()))] + [pop[c][mask] for c in outcome_model_cols])
        Xall = np.column_stack([np.ones(len(iA))] + [pop[c] for c in outcome_model_cols])
        if model_type == "normal":
            beta = ols(Xm, pop[y_A_col][mask])
            return Xall @ beta
        beta = irls_logistic(Xm, pop[y_A_col][mask])
        return 1.0 / (1.0 + np.exp(-(Xall @ beta)))

    if scenario == 2:
        yhat = fit_predict(iA & iB)
        t1 = float(np.sum(wB * yhat[iB]))
        t2 = float(np.sum(dA[iA] * (pop[y_A_col][iA] - yhat[iA])))
        return {"estimate": (t1 + t2) / N}
    if scenario == 3:
        yhat = fit_predict(iA)
        t1 = float(np.sum(wB * (pop[y_B_col][iB] - yhat[iB])))
        return {"estimate": (t1 + yhat.sum()) / N}
    raise ValueError(scenario)


def clw_np(
    x: np.ndarray,
    y: np.ndarray,
    in_a: np.ndarray,
    in_b: np.ndarray,
    d: np.ndarray,
    n_iter: int = 15,
    ox: np.ndarray | None = None,
) -> dict:
    """Numpy twin of ``estimators/ipw.propensity_weighted_mean``
    (Chen–Li–Wu 2020): pseudo-likelihood Newton, Hajek IPW, DR mean,
    and the plug-in sandwich variances.  ``x``/``ox`` are design
    matrices WITH intercept column; ``d`` may carry garbage (or nan)
    off A rows and ``y`` off B rows — masked exactly like the engine.
    """
    a = in_a.astype(float)
    b = in_b.astype(float)
    dd = np.where(a > 0, d, 0.0)          # engine's COALESCE(d, 0)
    yy = np.where(b > 0, y, 0.0)          # engine's COALESCE(y, 0)
    X = x
    Xo = x if ox is None else ox
    k = X.shape[1]

    theta = np.zeros(k)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ theta)))
        U = X.T @ (b - a * dd * p)
        H = (X * (a * dd * p * (1 - p))[:, None]).T @ X
        theta = theta + np.linalg.solve(H, U)
    p = 1.0 / (1.0 + np.exp(-(X @ theta)))

    G = (Xo * b[:, None]).T @ Xo
    beta = np.linalg.solve(G, (Xo * b[:, None]).T @ yy)
    m = Xo @ beta

    na = a.sum()
    nhat = (a * dd).sum()
    sinv = (b / p).sum()
    mu_ipw = (b * yy / p).sum() / sinv
    mu_dr = ((b * (yy - m) / p).sum() + (a * dd * m).sum()) / nhat

    H = (X * (a * dd * p * (1 - p))[:, None]).T @ X
    # IPW sandwich
    g_ipw = -(X * (b * (1 - p) / p * (yy - mu_ipw))[:, None]).sum(axis=0)
    b_ipw = np.linalg.solve(H, g_ipw)
    infl_b = (yy - mu_ipw) / p + X @ b_ipw
    vb = (b * (1 - p) * infl_b**2).sum()
    z = a * dd * p * (X @ b_ipw)
    va = na / (na - 1) * ((a * z**2).sum() - (a * z).sum() ** 2 / na)
    var_ipw = (vb + va) / sinv**2
    # DR sandwich
    gt = -(X * (b * (1 - p) / p * (yy - m))[:, None]).sum(axis=0)
    bt = np.linalg.solve(H, gt)
    g_beta = -(Xo * (b / p)[:, None]).sum(axis=0) + (
        Xo * (a * dd)[:, None]
    ).sum(axis=0)
    bb = np.linalg.solve(G, g_beta)
    infl_bd = (yy - m) / p + X @ bt + (Xo @ bb) * (yy - m)
    vbd = (b * (1 - p) * infl_bd**2).sum()
    zd = dd * ((m - mu_dr) - p * (X @ bt))
    vad = na / (na - 1) * (
        (a * zd**2).sum() - (a * zd).sum() ** 2 / na
    )
    var_dr = (vbd + vad) / nhat**2
    return {
        "theta": theta, "beta": beta, "mean_ipw": mu_ipw,
        "mean_dr": mu_dr, "var_ipw": max(var_ipw, 0.0),
        "var_dr": max(var_dr, 0.0), "n_hat": nhat, "sinv": sinv,
    }
