"""Delete-a-group jackknife replicate variance (survey-stats extension).

The reference leans on the survey package's linearization variances
(``svymean``/``svytotal``; our ``kernels.stats``).  Replicate-weight
methods are the other canonical family (``svrepdesign(type="JKn")``):
split the sample into G random groups, recompute the estimator with each
group deleted, and read the variance off the spread of the replicates

    V_JK = (G-1)/G * sum_g (theta_(g) - theta)^2 .

Its virtue at scale: ONE pass builds the G group sums (map-side partial
aggregation), and every replicate estimate is pure arithmetic on that
G-row table — the data is never re-scanned per replicate.  G stays
driver-tiny (20-100) regardless of data size.

Group assignment must be deterministic and SQL-portable for oracle
verification: ``id % G`` on a non-negative integer id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jackknife_mean(
    df: DataFrame,
    y_col: str,
    id_col: str,
    weight_col: str | None = None,
    n_groups: int = 20,
) -> DataFrame:
    """Weighted-mean point estimate with delete-a-group jackknife SE.

    Returns one row: (mean, se_jk, n_groups).  ``theta = sum(w*y)/sum(w)``;
    replicate g drops group ``id % n_groups == g``.  Rows with null y or
    weight are excluded from both the estimate and the replicates (SQL
    sum semantics skip nulls on the product column).
    """
    if n_groups < 2:
        raise ValueError("jackknife needs at least 2 groups")
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    y = F.col(y_col).cast("double")
    base = df.select(
        F.pmod(F.col(id_col), F.lit(n_groups)).alias("__g__"),
        (w * y).alias("__wy__"),
        F.when((w * y).isNotNull(), w).alias("__w__"),
    )
    gs = base.groupBy("__g__").agg(
        F.sum("__wy__").alias("swy"), F.sum("__w__").alias("sw")
    )
    # totals over the G-row table: an unpartitioned window is fine HERE
    # (G rows, one task) — never use this shape on real data
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gs = (
        gs.withColumn("Twy", F.sum("swy").over(wall))
        .withColumn("Tw", F.sum("sw").over(wall))
        .withColumn(
            "theta_g",
            (F.col("Twy") - F.col("swy")) / (F.col("Tw") - F.col("sw")),
        )
    )
    gl = float(n_groups)
    return gs.agg(
        F.round(F.max("Twy") / F.max("Tw"), 6).alias("mean"),
        F.round(
            F.sqrt(
                F.sum(
                    F.pow(F.col("theta_g") - F.col("Twy") / F.col("Tw"), 2)
                )
                * F.lit((gl - 1.0) / gl)
            ),
            6,
        ).alias("se_jk"),
        F.lit(n_groups).cast("long").alias("n_groups"),
    )
