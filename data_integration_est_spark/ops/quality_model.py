"""Model-based quality filtering — the DCLM / FineWeb-Edu curation
pattern: instead of hand-tuned heuristic thresholds, TRAIN a classifier
on weak quality labels, score every document, and keep the top fraction
per source.

The reference engine has no model-based filter; this composes two
certified engine layers end-to-end:

- ``kernels.linalg.fit_logistic`` — the IRLS GLM used by the PC
  estimator (unique MLE, deterministic from beta = 0), trained on
  document features against the weak labels;
- ``ops.mixing.keep_top_fraction`` — the per-source rank cut (one keyed
  window), because classifier scores are only comparable within a
  source/dump.

Production swaps the weak-label column for real labels (LLM judgments,
wiki-vs-crawl, FineWeb-Edu scores) and the feature columns for richer
ones — the pipeline shape (one Gram-pass fit + one scoring projection +
one keyed window) is unchanged and is the whole point: no per-row
Python, no model server, the "model" is k+1 coefficients folded into a
codegen expression.

Scale: training is O(iterations) Gram passes over the labeled subset
(map-side combined, k x k to the driver); scoring is a map-only
expression; the cut is one shuffle on the source key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.linalg import FitResult, fit_logistic
from data_integration_est_spark.ops.mixing import keep_top_fraction


def score_expr(coef: list[float], x_cols: list[str], intercept: bool = True) -> Column:
    """Linear score x'beta as a single codegen expression (logit scale —
    monotone in the probability, so rank cuts are identical)."""
    ofs = 1 if intercept else 0
    expr = F.lit(float(coef[0])) if intercept else F.lit(0.0)
    for j, c in enumerate(x_cols):
        expr = expr + F.lit(float(coef[j + ofs])) * F.col(c).cast("double")
    return expr


def classifier_quality_cut(
    docs: DataFrame,
    feature_cols: list[str],
    label_col: str,
    frac: float,
    key_cols: list[str] | str | None = "source",
    id_col: str = "doc_id",
    intercept: bool = True,
    max_iter: int = 25,
    score_col: str = "quality_score",
) -> tuple[DataFrame, FitResult]:
    """Train-on-weak-labels -> score -> per-source top-``frac`` cut.

    Returns ``(kept, fit)``: the surviving rows with ``score_col``
    appended, and the logistic ``FitResult`` (coefficients,
    convergence).  Training rows are those with a non-null label; the
    CUT applies to every row (the trained model scores unlabeled rows
    too — the DCLM shape, where labels exist only for the seed set).
    Raises if IRLS did not converge: a silent half-trained filter is a
    curation hazard."""
    train = docs.filter(F.col(label_col).isNotNull())
    fit = fit_logistic(
        train, label_col, list(feature_cols),
        intercept=intercept, max_iter=max_iter,
    )
    if not fit.converged:
        raise ValueError(
            "classifier_quality_cut: IRLS did not converge — refusing to "
            "cut on a half-trained model (check separation / features)"
        )
    coef = [float(b) for b in fit.coef_for(())]
    scored = docs.withColumn(
        score_col, score_expr(coef, list(feature_cols), intercept=intercept)
    )
    kept = keep_top_fraction(
        scored, score_col, frac, key_cols=key_cols, tiebreak_col=id_col
    )
    return kept, fit
