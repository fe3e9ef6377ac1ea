"""Nearest-neighbor mass imputation for data integration (Yang & Kim
2020, "Statistical data integration in survey sampling: a review";
Rivers 2007 matching): donate the observed outcome of the nearest
donor — by a continuous matching covariate, within imputation classes
— to every recipient, then estimate with the recipients' design
weights.

This is the NONPARAMETRIC sibling of the reference's regression-based
integration (``RegDI2.R`` fits an outcome model on the big sample and
predicts; NN imputation transfers an actual observed value instead —
robust to outcome-model misspecification at the cost of a smoothness
assumption on x).

Spark-first shape — the classic NN-join is quadratic; this kernel is
the sort-merge linearization:

  1. UNION donors and recipients within each imputation class.
  2. TWO per-class window passes (ascending / descending in x) carry
     the nearest donor at-or-below and at-or-above each recipient —
     the same carry pattern as ``ops/asof.py``, with a FULLY
     DETERMINISTIC order: (x, side, donor_id DESC) so ties at equal x
     resolve to the smallest donor id.
  3. A map-only projection picks the closer of the two candidates
     (exact tie -> the below-donor, i.e. smaller donor x, then smaller
     donor id) — the rule the SQL oracle replays verbatim.

Cost: one shuffle on the class key per window direction; state is one
carried struct per row.  At 100 TB this scales like any keyed window;
classes ARE the scale contract — an empty ``class_cols`` collapses to
a single partition and raises unless ``allow_global=True`` (small-data
escape hatch, same convention as ``ops/mixing.quality_cut``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class ImputeError(ValueError):
    pass


def nn_impute(
    recipients: DataFrame,
    donors: DataFrame,
    x_col: str,
    y_col: str,
    class_cols: list,
    donor_id_col: str,
    allow_global: bool = False,
    suffix: str = "_nn",
) -> DataFrame:
    """Attach the nearest donor's outcome to every recipient.

    Output: all recipient columns plus ``<y_col><suffix>``,
    ``<x_col><suffix>`` (donor x), ``<donor_id_col><suffix>`` and
    ``dist<suffix>`` — null for recipients whose class has no donors.

    Nearest = min |x_r - x_d| within the same ``class_cols`` cell;
    exact distance ties prefer the donor at-or-below (smaller x), and
    equal-x donors resolve to the smallest ``donor_id_col`` — a total
    deterministic order, so the result is replayable in any engine.

    Null handling (round-10 fix): donors with a null ``x_col``,
    ``y_col`` or ``donor_id_col`` are DROPPED before the union — a
    null-x donor has no position on the matching axis (previously,
    when such a donor was the only at-or-below candidate, its null
    distance fell through the tie rule and the recipient silently
    received that donor's y with ``dist=null`` instead of the true
    nearest donor), and a donor with no observed outcome or id cannot
    donate.  Recipients with a null ``x_col`` get null match columns —
    they keep their row (the caller decides), never a fake match.
    """
    for c in (x_col, *class_cols):
        if c not in recipients.columns:
            raise ImputeError(f"recipient column '{c}' not found")
    for c in (x_col, y_col, donor_id_col, *class_cols):
        if c not in donors.columns:
            raise ImputeError(f"donor column '{c}' not found")
    if not class_cols and not allow_global:
        raise ImputeError(
            "empty class_cols collapses the window to a single partition "
            "— pass imputation classes, or allow_global=True for small data"
        )

    y_nn = f"{y_col}{suffix}"
    x_nn = f"{x_col}{suffix}"
    id_nn = f"{donor_id_col}{suffix}"

    donors = donors.filter(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(donor_id_col).isNotNull()
    )
    d2 = donors.select(
        *class_cols,
        F.col(x_col).cast("double").alias("__x__"),
        F.struct(
            F.col(y_col).alias(y_nn),
            F.col(x_col).cast("double").alias(x_nn),
            F.col(donor_id_col).alias(id_nn),
        ).alias("__carry__"),
        F.col(donor_id_col).alias("__did__"),
        F.lit(0).alias("__side__"),
    )
    r2 = recipients.select(
        *[F.col(c) for c in recipients.columns],
        F.col(x_col).cast("double").alias("__x__"),
        F.lit(None).cast(d2.schema["__carry__"].dataType).alias("__carry__"),
        F.lit(None).cast(d2.schema["__did__"].dataType).alias("__did__"),
        F.lit(1).alias("__side__"),
    )
    u = r2.unionByName(d2, allowMissingColumns=True)

    # donors sort before recipients at equal x (side 0 < 1) => inclusive;
    # equal-x donors ordered id DESC so the LAST carried is the SMALLEST id
    w_lo = (
        Window.partitionBy(*class_cols)
        .orderBy(F.col("__x__").asc(), F.col("__side__").asc(),
                 F.col("__did__").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_hi = (
        Window.partitionBy(*class_cols)
        .orderBy(F.col("__x__").desc(), F.col("__side__").asc(),
                 F.col("__did__").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__lo__", F.last("__carry__", ignorenulls=True).over(w_lo))
    u = u.withColumn("__hi__", F.last("__carry__", ignorenulls=True).over(w_hi))
    out = u.filter(F.col("__side__") == 1)

    d_lo = F.abs(F.col("__x__") - F.col("__lo__").getField(x_nn))
    d_hi = F.abs(F.col("__hi__").getField(x_nn) - F.col("__x__"))
    pick: Column = (
        F.when(F.col("__x__").isNull(),  # null-x recipient: no match
               F.lit(None).cast(d2.schema["__carry__"].dataType))
        .when(F.col("__lo__").isNull(), F.col("__hi__"))
        .when(F.col("__hi__").isNull(), F.col("__lo__"))
        .when(d_hi < d_lo, F.col("__hi__"))
        .otherwise(F.col("__lo__"))  # ties -> below donor (smaller x)
    )
    out = out.withColumn("__pick__", pick)
    return out.select(
        *[F.col(c) for c in recipients.columns],
        F.col("__pick__").getField(y_nn).alias(y_nn),
        F.col("__pick__").getField(x_nn).alias(x_nn),
        F.col("__pick__").getField(id_nn).alias(id_nn),
        F.abs(F.col("__x__") - F.col("__pick__").getField(x_nn))
        .alias(f"dist{suffix}"),
    )


def nn_mass_mean(
    recipients: DataFrame,
    donors: DataFrame,
    x_col: str,
    y_col: str,
    class_cols: list,
    donor_id_col: str,
    weight_col: str | None = None,
    group_cols: list | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """The mass-imputation estimator: NN-impute y onto the probability
    sample, then the (weighted) mean of imputed values per group —
    ``sum(w * y_nn) / sum(w)`` over matched recipients.  Returns
    ``(group_cols..., n_recipients, n_matched, mean_imputed,
    se_imputed)`` — the n_matched < n_recipients gap surfaces empty
    donor classes loudly instead of silently averaging over a biased
    matched subset; callers decide whether a coverage gap invalidates
    the estimate.

    ``se_imputed`` is the with-replacement linearized Hajek variance
    treating matched values as observed (Rivers 2007 §4; Yang & Kim
    2020 §4.2's mass-imputation review — the matching-error component
    is o_p(1) when the donor pool is dense relative to the recipient
    sample, the regime mass imputation targets):

        V = n/(n-1) * sum_i w_i^2 (y_nn_i - mu)^2 / (sum_i w_i)^2

    over the n matched recipients per group, expanded to pure moment
    sums so the whole estimator stays one aggregation pass.  Null when
    n_matched < 2.
    """
    imp = nn_impute(
        recipients, donors, x_col, y_col, class_cols, donor_id_col,
        allow_global=allow_global,
    )
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    y = F.col(f"{y_col}_nn").cast("double")
    wm = F.when(y.isNotNull(), w)
    gb = imp.groupBy(*(group_cols or []))
    agg = gb.agg(
        F.count(F.lit(1)).alias("n_recipients"),
        F.sum(y.isNotNull().cast("long")).alias("n_matched"),
        F.sum(wm).alias("__sw__"),
        F.sum(wm * y).alias("__swy__"),
        F.sum(wm * w).alias("__sw2__"),
        F.sum(wm * w * y).alias("__sw2y__"),
        F.sum(wm * w * y * y).alias("__sw2y2__"),
    )
    mu = F.col("__swy__") / F.col("__sw__")
    n = F.col("n_matched").cast("double")
    var = (
        n / (n - 1.0)
        * (
            F.col("__sw2y2__")
            - 2.0 * mu * F.col("__sw2y__")
            + mu * mu * F.col("__sw2__")
        )
        / (F.col("__sw__") * F.col("__sw__"))
    )
    return agg.select(
        *(group_cols or []),
        "n_recipients",
        "n_matched",
        mu.alias("mean_imputed"),
        F.when(F.col("n_matched") >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))
        .alias("se_imputed"),
    )
