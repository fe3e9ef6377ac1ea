"""K-fold cross-validation for the engine's GLM kernels — the honesty
check behind model-based curation (``ops/quality_model``): a quality
classifier cut on in-sample scores overstates itself; CV error is the
number a pipeline owner should look at before shipping a filter.

The Spark-native trick is the fold EXPLOSION: instead of k separate
fits, each row is replicated into the k−1 training sets that include it
(``explode`` over the fold array + one filter), and ONE grouped IRLS
(``fit_logistic(group_cols=["__hold__"])`` — the stacked-solve kernel
every estimator already rides) fits all k leave-one-fold-out models in
the same passes.  Scoring then joins the k-row coefficient table back
on each row's OWN fold — every row is scored by the model that never
saw it.  Total cost: (k−1)x the data through the usual IRLS passes +
one broadcast join; no per-fold job loop, no driver iteration over
folds.

Folds are ``id % k`` — deterministic and SQL-portable, so the gate
oracle replays the entire CV (all k unrolled-Newton fits + holdout
metrics) in pure SQL.  For hash-uniform folds on non-uniform ids, pass
``fold_col`` built from ``ops.mixing.hash_split`` machinery instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.kernels.linalg import fit_logistic


def kfold_cv_logistic(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    id_col: str,
    k: int = 5,
    fold_col: str | None = None,
    intercept: bool = True,
    max_iter: int = 25,
) -> DataFrame:
    """Leave-one-fold-out logistic CV.  Returns one row per fold:
    (fold, n_train, n_test, logloss, brier, accuracy) — holdout metrics
    under the model trained WITHOUT that fold.  Raises if any fold's
    IRLS fails to converge (a half-trained fold silently poisons the CV
    average)."""
    if k < 2:
        raise ValueError("k-fold CV needs k >= 2")
    if fold_col is None:
        base = df.withColumn(
            "__fold__", F.pmod(F.col(id_col), F.lit(k)).cast("int")
        )
    else:
        base = df.withColumn("__fold__", F.col(fold_col).cast("int"))
    folds = F.array(*[F.lit(j) for j in range(k)])
    rep = (
        base.withColumn("__hold__", F.explode(folds))
        .filter(F.col("__hold__") != F.col("__fold__"))
    )
    fit = fit_logistic(
        rep, y_col, list(x_cols), intercept=intercept,
        group_cols=["__hold__"], max_iter=max_iter,
    )
    if not fit.converged:
        raise ValueError(
            "kfold_cv_logistic: IRLS did not converge on at least one "
            "fold (check separation / features)"
        )
    n_train = rep.groupBy("__hold__").count().collect()
    n_train_of = {int(r["__hold__"]): int(r["count"]) for r in n_train}

    # score each row with the model of ITS OWN fold (which excluded it)
    scored_in = base.withColumnRenamed("__fold__", "__hold__")
    joined, p = fit.predict_expr_grouped(scored_in)
    y = F.col(y_col).cast("double")
    out = (
        joined.withColumn("__p__", p)
        .groupBy("__hold__")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(
                -F.avg(y * F.log("__p__")
                       + (F.lit(1.0) - y) * F.log(F.lit(1.0) - F.col("__p__"))),
                6,
            ).alias("logloss"),
            F.round(F.avg(F.pow(y - F.col("__p__"), 2)), 6).alias("brier"),
            F.round(
                F.avg(
                    ((F.col("__p__") >= 0.5).cast("double") == y)
                    .cast("double")
                ),
                6,
            ).alias("accuracy"),
        )
        .withColumn("fold", F.col("__hold__").cast("long"))
    )
    # n_train via a literal map expression (O(k) driver data, no UDF)
    mapping = F.create_map(
        *[F.lit(v) for kv in n_train_of.items() for v in kv]
    )
    out = out.withColumn("n_train", mapping[F.col("__hold__")].cast("long"))
    return out.select(
        "fold", "n_train", "n_test", "logloss", "brier", "accuracy"
    ).orderBy("fold")
