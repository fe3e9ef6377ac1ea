"""Range (interval-containment) join — bucketized equi-join formulation.

Spark executes a raw ``p.x BETWEEN i.lo AND i.hi`` join as a broadcast
nested loop (or worse, a cartesian product) — O(|points| x |intervals|)
at any cluster size.  The scale path: explode each interval over the
fixed-width buckets it covers, bucket each point once, equi-join on the
bucket id, then apply the exact containment filter.  Work becomes
O(|points| + |intervals| x avg_span/width + matching pairs), shuffled on
the bucket key (AQE splits hot buckets).  Each (point, interval) pair
meets in EXACTLY one bucket — the point's own — so no distinct is
needed.

``bucket_width`` trades explode factor against bucket occupancy: pick
~ the typical interval span (then each interval covers <= 2-3 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    x_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every interval row with lo <= x <= hi.

    Output: all columns of ``points`` + all columns of ``intervals``
    (names must not collide — alias beforehand).  ``how='inner'`` only;
    outer variants compose from the inner result.
    """
    if how != "inner":
        raise ValueError("range_join_points supports how='inner' only")
    w = float(bucket_width)
    p = points.withColumn(
        "__bk__", F.floor(F.col(x_col).cast("double") / F.lit(w)).cast("long")
    )
    i = intervals.withColumn(
        "__bk__",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("double") / F.lit(w)).cast("long"),
                F.floor(F.col(hi_col).cast("double") / F.lit(w)).cast("long"),
            )
        ),
    )
    return (
        p.join(i, on="__bk__")
        .filter(
            (F.col(x_col).cast("double") >= F.col(lo_col).cast("double"))
            & (F.col(x_col).cast("double") <= F.col(hi_col).cast("double"))
        )
        .drop("__bk__")
    )
