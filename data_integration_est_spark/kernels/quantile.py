"""Exact design-weighted quantiles — ``survey::svyquantile`` parity.

The lower weighted quantile: the smallest observed y with cumulative
weight >= q * W.  Spark's ``percentile_approx`` neither takes weights nor
promises exactness; a global sort-and-cumsum is a single-task
anti-pattern at scale.  Instead: ITERATIVE HISTOGRAM BISECTION.

Each round bucketizes y into ``bins`` equal-width bins over the current
per-(group, q) bracket and aggregates sum(w) per bin — ONE distributed
groupBy pass for ALL groups and quantiles together; only
O(groups x qs x bins) scalars reach the driver, which narrows each
bracket to the bin containing its target mass.  After ``n_narrow``
rounds the bracket has shrunk by bins^n (1024^3 ~ 1e9): a final pass
aggregates weight per DISTINCT y inside the bracket (tiny by then —
either few values remain or they are ties, which collapse) and the
driver reads off the exact order statistic.  Total cost: n_narrow + 2
scan-shaped passes, no sort, no shuffle wider than the groupBy.

Weighted cumulative sums are floating-point order-sensitive in general;
with integer-valued weights (the common design case) every partial sum
is exact and the result is bit-reproducible across engines — the gate
oracle exploits this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from data_integration_est_spark.design import SurveyDesign


def svyquantile(
    design: SurveyDesign,
    y_col: str,
    qs: tuple = (0.5,),
    group_cols: list[str] | None = None,
    bins: int = 1024,
    n_narrow: int = 3,
) -> DataFrame:
    """Exact lower weighted quantiles, all groups and all ``qs`` in the
    same passes.  Returns a DataFrame (group_cols..., q, quantile)."""
    if not qs or any(not (0.0 < q < 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1)")
    group_cols = list(group_cols or [])
    spark = design.df.sparkSession
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    base = design.df.na.drop(subset=[y_col, design.weight_col] + group_cols).select(
        *group_cols, y.alias("__y__"), w.alias("__w__")
    )

    stats = (
        base.groupBy(*group_cols)
        .agg(
            F.min("__y__").alias("lo"),
            F.max("__y__").alias("hi"),
            F.sum("__w__").alias("W"),
        )
        .collect()
    )
    # state per (group key, q): current bracket + weight strictly left of it
    state: dict[tuple, dict] = {}
    for r in stats:
        key = tuple(r[c] for c in group_cols)
        for qi, q in enumerate(qs):
            state[key + (qi,)] = {
                "lo": float(r["lo"]), "hi": float(r["hi"]),
                "left": 0.0, "target": float(q) * float(r["W"]),
            }

    key_fields = list(base.select(*group_cols).schema.fields)
    bounds_schema = StructType(
        key_fields
        + [
            StructField("__qi__", LongType(), False),
            StructField("__lo__", DoubleType(), False),
            StructField("__hi__", DoubleType(), False),
        ]
    )

    def _bounds_df(active: dict) -> DataFrame:
        rows = [k[:-1] + (k[-1], s["lo"], s["hi"]) for k, s in active.items()]
        return spark.createDataFrame(rows, bounds_schema)

    join_on = group_cols if group_cols else None

    for _ in range(n_narrow):
        active = {k: s for k, s in state.items() if s["lo"] < s["hi"]}
        if not active:
            break
        b = _bounds_df(active)
        joined = (
            base.join(F.broadcast(b), on=join_on, how="inner")
            if join_on
            else base.crossJoin(F.broadcast(b))
        )
        width = F.col("__hi__") - F.col("__lo__")
        binc = F.least(
            F.floor((F.col("__y__") - F.col("__lo__")) / width * bins),
            F.lit(bins - 1),
        ).cast("long")
        hist = (
            joined.filter(
                (F.col("__y__") >= F.col("__lo__")) & (F.col("__y__") <= F.col("__hi__"))
            )
            .groupBy(*group_cols, "__qi__", binc.alias("__bin__"))
            .agg(F.sum("__w__").alias("__sw__"))
            .collect()
        )
        by_key: dict[tuple, dict[int, float]] = {}
        for r in hist:
            k = tuple(r[c] for c in group_cols) + (int(r["__qi__"]),)
            by_key.setdefault(k, {})[int(r["__bin__"])] = float(r["__sw__"])
        for k, s in active.items():
            bins_w = by_key.get(k, {})
            lo, hi = s["lo"], s["hi"]
            bw = (hi - lo) / bins
            cum = s["left"]
            chosen = bins - 1
            for bi in range(bins):
                nxt = cum + bins_w.get(bi, 0.0)
                if nxt >= s["target"]:
                    chosen = bi
                    break
                cum = nxt
            s["left"] = cum
            new_lo, new_hi = lo + chosen * bw, lo + (chosen + 1) * bw
            # the bracket must keep containing the answer: clamp into
            # [lo, hi] and guard zero-width float underflow
            s["lo"], s["hi"] = max(lo, new_lo), min(hi, new_hi)
            if not (s["lo"] < s["hi"]):
                s["lo"] = s["hi"] = max(lo, min(new_lo, hi))

    # final exact pass: weight per distinct y inside each bracket
    b = _bounds_df(state)
    joined = (
        base.join(F.broadcast(b), on=join_on, how="inner")
        if join_on
        else base.crossJoin(F.broadcast(b))
    )
    fin = (
        joined.filter(
            (F.col("__y__") >= F.col("__lo__")) & (F.col("__y__") <= F.col("__hi__"))
        )
        .groupBy(*group_cols, "__qi__", "__y__")
        .agg(F.sum("__w__").alias("__sw__"))
        .collect()
    )
    vals: dict[tuple, list] = {}
    for r in fin:
        k = tuple(r[c] for c in group_cols) + (int(r["__qi__"]),)
        vals.setdefault(k, []).append((float(r["__y__"]), float(r["__sw__"])))
    out_rows = []
    for k, s in state.items():
        cum = s["left"]
        ans = None
        for yv, sw in sorted(vals.get(k, [])):
            cum += sw
            if cum >= s["target"]:
                ans = yv
                break
        if ans is None:  # numeric guard: target beyond bracket mass
            ans = s["hi"]
        out_rows.append(k[:-1] + (float(qs[k[-1]]), ans))
    out_schema = StructType(
        key_fields
        + [
            StructField("q", DoubleType(), False),
            StructField("quantile", DoubleType(), True),
        ]
    )
    return spark.createDataFrame(sorted(out_rows), out_schema)


def trim_weights(
    design: SurveyDesign,
    upper_quantile: float = 0.99,
    out_col: str = "w_trim",
) -> DataFrame:
    """Survey weight trimming: cap weights at their ``upper_quantile``
    weighted quantile and scale the result so the total weight is
    preserved — the standard variance-control step when a few extreme
    weights dominate an estimate (the multiplicative analogue of
    ``survey::trimWeights``'s redistribute-to-cap).

    The cap is the UNWEIGHTED quantile of the weight distribution (each
    row counts once): a self-weighted quantile would be useless here —
    extreme weights carry their own mass, so they'd always sit below any
    high weighted quantile and never get clipped.  Exact quantile from
    ``svyquantile`` under a unit weight, then one agg for the rescale
    factor and one map projection.  Returns the design's frame plus
    ``out_col``."""
    if not (0.0 < upper_quantile < 1.0):
        raise ValueError("upper_quantile must be in (0, 1)")
    df = design.df
    unit = df.withColumn("__one__", F.lit(1.0))
    wq = svyquantile(
        SurveyDesign(df=unit, weight_col="__one__"),
        design.weight_col, qs=(upper_quantile,),
    )
    cap = float(wq.collect()[0]["quantile"])
    w = F.col(design.weight_col).cast("double")
    capped = F.least(w, F.lit(cap))
    sums = df.agg(
        F.sum(w).alias("tw"), F.sum(capped).alias("tc")
    ).collect()[0]
    scale = float(sums["tw"]) / float(sums["tc"])
    return df.withColumn(out_col, capped * F.lit(scale))
