"""O5 — plotting helpers over COLLECTED summaries (SURVEY.md §2.8).

The reference renders its study outputs with ggplot2: bias-vs-gamma
estimator lines (``nb[26]:19-27``), faceted bias curves by sd
(``nb[43]``), and an R²-vs-bias scatter (``nb[44]``).  Per SURVEY §2.8
plots sit OUTSIDE the correctness surface; the engine's contract here is
(a) the exact plot-ready frame — a collected, tidy pandas DataFrame
matching the aesthetics the notebook maps — which IS testable, and
(b) a render step that uses matplotlib when available and raises a
clear error when not (this container ships no plotting libs).

Scale note: every helper takes a SUMMARY DataFrame (gamma × estimator
grid — tens to hundreds of rows).  Collecting it is the sanctioned
driver-side endpoint of a study; never feed a per-unit table here.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def bias_frame(summary: DataFrame) -> pd.DataFrame:
    """Plot-ready frame for the bias-vs-gamma lines (``nb[26]:19-27``):
    one row per (gamma, estimator), sorted for deterministic line order.
    Aesthetics: x=gamma, y=bias_mean, colour/group=estimator."""
    cols = [c for c in ("gamma", "sd", "estimator", "bias_mean", "bias_sd", "rmse")
            if c in summary.columns]
    pdf = summary.select(*cols).toPandas()
    sort_cols = [c for c in ("sd", "gamma", "estimator") if c in pdf.columns]
    return pdf.sort_values(sort_cols).reset_index(drop=True)


def r2_bias_frame(summary: DataFrame, r2_summary: DataFrame) -> pd.DataFrame:
    """The ``nb[44]`` join: bias summary ⋈ R² summary on the shared grid
    keys — x=r2_mean, y=bias_mean, colour=estimator, facet=sd."""
    keys = [c for c in ("gamma", "sd", "estimator") if c in summary.columns]
    left = bias_frame(summary)
    right = r2_summary.toPandas()
    return left.merge(right, on=[k for k in keys if k in right.columns], how="left")


def _require_matplotlib() -> Any:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "plot rendering needs matplotlib, which is not installed in "
            "this environment; use bias_frame()/r2_bias_frame() to get the "
            "plot-ready pandas frame and render it wherever matplotlib "
            "(or any plotting stack) is available"
        ) from e


def plot_bias_vs_gamma(
    summary: DataFrame, path: str | None = None, facet_col: str | None = None
):
    """Render the ``nb[26]``/``nb[43]`` bias-vs-gamma estimator lines:
    one line+markers per estimator, zero reference rule, optional facet
    (one subplot per ``facet_col`` value — the nb[43] per-sd layout).
    Returns the matplotlib Figure; saves to ``path`` when given
    (``ggsave`` parity, ``nb[27]:41``)."""
    plt = _require_matplotlib()
    pdf = bias_frame(summary)
    facets = sorted(pdf[facet_col].unique()) if facet_col else [None]
    fig, axes = plt.subplots(1, len(facets), figsize=(6 * len(facets), 4),
                             squeeze=False, sharey=True)
    for ax, fv in zip(axes[0], facets):
        sub = pdf if fv is None else pdf[pdf[facet_col] == fv]
        for est, grp in sub.groupby("estimator"):
            ax.plot(grp["gamma"], grp["bias_mean"], marker="o", label=est)
        ax.axhline(0.0, color="grey", linewidth=0.8, linestyle="--")
        ax.set_xlabel("gamma")
        ax.set_title("bias vs gamma" if fv is None else f"sd = {fv}")
    axes[0][0].set_ylabel("bias")
    axes[0][-1].legend(loc="best", fontsize="small")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
