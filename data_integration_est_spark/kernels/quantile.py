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
rounds the bracket has shrunk by bins^n (defaults 2048^2 ~ 4.2e6 —
r17: one fewer distributed pass than the old 1024^3 at the same
per-pass cost, since the bin assignment is the same arithmetic at any
``bins``; the histogram collect stays O(groups x qs x bins) driver
scalars.  The returned quantile is EXACT for any (bins, n_narrow):
the bracket contains the answer by the crossing-bin invariant and the
final pass recomputes the order statistic from exact per-value
weights, so the geometry is a pure performance knob — raise
``n_narrow`` when a corpus is so large that the final bracket's
distinct-value count would strain the driver collect): a final pass
aggregates weight per DISTINCT y inside the bracket (tiny by then —
either few values remain or they are ties, which collapse) and the
driver reads off the exact order statistic.  The final pass ALSO
recomputes the weight strictly left of each bracket exactly (rows with
y < lo collapse into one null-keyed partial-aggregated cell), so the
read-off never trusts the histogram-derived running total — a 1-ulp
bin-boundary disagreement between Spark's floor() and the Python
bracket arithmetic cannot double-count or drop a boundary row's weight.
Total cost: n_narrow + 2 scan-shaped passes over a PERSISTED two-column
projection (at 100 TB the projection is read from the source once, not
n_narrow + 2 times), no sort, no shuffle wider than the groupBy.

``alpha`` adds Woodruff (1952) confidence intervals: the design-based
linearization SE of the estimated distribution function at the quantile
(the weighted mean of the indicator 1{y <= q_hat} under the same
with-replacement element design ``kernels.stats.svymean`` uses) gives a
symmetric interval on the PROBABILITY scale, which is inverted through
the weighted quantile function — one extra aggregation pass for the
indicator moments plus one more bisection solve for the two inverted
endpoints, all riding the same persisted projection.

Weighted cumulative sums are floating-point order-sensitive in general;
with integer-valued weights (the common design case) every partial sum
is exact and the result is bit-reproducible across engines — the gate
oracle exploits this.
"""

from __future__ import annotations

import math
from statistics import NormalDist

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from data_integration_est_spark.design import SurveyDesign
from data_integration_est_spark.util import local_df


def _solve_exact(
    spark,
    base: DataFrame,
    group_cols: list[str],
    key_fields: list,
    state: dict,
    bins: int,
    n_narrow: int,
) -> dict:
    """Histogram-bisection solver: ``state`` maps (group key..., slot) ->
    {lo, hi, target} (target on the cumulative-weight scale); returns
    key -> exact lower weighted quantile.  ``base`` must expose
    group_cols + __y__ + __w__ and should be persisted by the caller."""
    bounds_schema = StructType(
        list(key_fields)
        + [
            StructField("__qi__", LongType(), False),
            StructField("__lo__", DoubleType(), False),
            StructField("__hi__", DoubleType(), False),
        ]
    )

    def _bounds_df(entries: dict) -> DataFrame:
        rows = [k[:-1] + (k[-1], s["lo"], s["hi"]) for k, s in entries.items()]
        return local_df(spark, rows, bounds_schema)

    join_on = group_cols if group_cols else None

    def _joined(entries: dict) -> DataFrame:
        b = _bounds_df(entries)
        return (
            base.join(F.broadcast(b), on=join_on, how="inner")
            if join_on
            else base.crossJoin(F.broadcast(b))
        )

    # steering state: histogram-derived left mass (approximate is fine —
    # the final pass recomputes it exactly)
    for s in state.values():
        s["left"] = 0.0

    for _ in range(n_narrow):
        active = {k: s for k, s in state.items() if s["lo"] < s["hi"]}
        if not active:
            break
        joined = _joined(active)
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

    # final exact pass: weight per distinct y inside each bracket, PLUS
    # the exact left-of-bracket mass — rows with y < lo share a single
    # null group key, so they partial-aggregate map-side into one cell
    # per (group, slot) instead of shuffling individually
    joined = _joined(state)
    fin_key = F.when(
        F.col("__y__") < F.col("__lo__"), F.lit(None).cast("double")
    ).otherwise(F.col("__y__"))
    fin = (
        joined.filter(F.col("__y__") <= F.col("__hi__"))
        .groupBy(*group_cols, "__qi__", fin_key.alias("__y__"))
        .agg(F.sum("__w__").alias("__sw__"))
        .collect()
    )
    vals: dict[tuple, list] = {}
    left_exact: dict[tuple, float] = {}
    for r in fin:
        k = tuple(r[c] for c in group_cols) + (int(r["__qi__"]),)
        if r["__y__"] is None:
            left_exact[k] = float(r["__sw__"])
        else:
            vals.setdefault(k, []).append((float(r["__y__"]), float(r["__sw__"])))
    out: dict[tuple, float] = {}
    for k, s in state.items():
        cum = left_exact.get(k, 0.0)
        ans = None
        for yv, sw in sorted(vals.get(k, [])):
            cum += sw
            if cum >= s["target"]:
                ans = yv
                break
        if ans is None:  # numeric guard: target beyond bracket mass
            ans = s["hi"]
        out[k] = ans
    return out


def svyquantile(
    design: SurveyDesign,
    y_col: str,
    qs: tuple = (0.5,),
    group_cols: list[str] | None = None,
    bins: int = 2048,
    n_narrow: int = 2,
    alpha: float | None = None,
) -> DataFrame:
    """Exact lower weighted quantiles, all groups and all ``qs`` in the
    same passes.  Returns a DataFrame (group_cols..., q, quantile); with
    ``alpha`` set, (group_cols..., q, quantile, ci_l, ci_u) where the
    CI is the Woodruff (1 - alpha) interval (NULL when the group has
    fewer than 2 rows, matching the NaN variance convention).

    Cluster designs (``psu_col``, r15): the point quantile is
    unchanged (a functional of the weighted data alone), but the
    Woodruff SE of the indicator mean collapses to weighted PSU totals
    first — per-stratum df-corrected first-stage variance with the
    PSU-count fpc when ``fpc_col`` is set, NaN/NULL when a non-census
    stratum has a single sampled PSU.  Calibrated + psu refuses (the
    ``_psu_refuses_calibration`` discipline)."""
    if not qs or any(not (0.0 < q < 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1)")
    if alpha is not None and not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    group_cols = list(group_cols or [])
    spark = design.df.sparkSession
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    # Cluster and stratified designs (r15) change only the Woodruff SE:
    # the point quantile is a population functional of (y, w) alone.
    # The strata/psu columns ride along in the persisted projection
    # (the bisection groupBys never touch them) and feed the
    # design-aware indicator moments below — PSU-collapsed per-stratum
    # pieces under psu_col, per-stratum df-corrected element pieces
    # under strata_col alone (previously silently unstratified).
    psu = design.psu_col if alpha is not None else None
    strat = design.strata_col if alpha is not None else None
    if psu and design.is_calibrated:
        from data_integration_est_spark.kernels.stats import (
            _psu_refuses_calibration)
        _psu_refuses_calibration(design, "svyquantile")
    carry_fpc = design.fpc_col if (alpha is not None and (psu or strat)
                                   and design.fpc_col) else None
    design_cols = ([psu] if psu else []) + ([strat] if strat else [])
    base = design.df.na.drop(
        subset=[y_col, design.weight_col] + group_cols + design_cols
    ).select(
        *group_cols, y.alias("__y__"), w.alias("__w__"),
        *([F.col(psu).alias("__psu__")] if psu else []),
        *([F.col(strat).alias("__h__")] if strat else []),
        *([F.col(carry_fpc).cast("double").alias("__fpc__")]
          if carry_fpc else []),
    )
    from data_integration_est_spark.util import adaptive_coalesce

    base = adaptive_coalesce(base).persist()
    try:
        stats = (
            base.groupBy(*group_cols)
            .agg(
                F.min("__y__").alias("lo"),
                F.max("__y__").alias("hi"),
                F.sum("__w__").alias("W"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        group_info = {
            tuple(r[c] for c in group_cols): (
                float(r["lo"]), float(r["hi"]), float(r["W"]), int(r["n"])
            )
            for r in stats
        }
        key_fields = list(base.select(*group_cols).schema.fields)

        state: dict[tuple, dict] = {}
        for key, (lo, hi, W, _n) in group_info.items():
            for qi, q in enumerate(qs):
                state[key + (qi,)] = {"lo": lo, "hi": hi, "target": float(q) * W}
        point = _solve_exact(spark, base, group_cols, key_fields, state,
                             bins, n_narrow)

        if alpha is None:
            out_rows = [
                k[:-1] + (float(qs[k[-1]]), point[k]) for k in state
            ]
            out_schema = StructType(
                key_fields
                + [
                    StructField("q", DoubleType(), False),
                    StructField("quantile", DoubleType(), True),
                ]
            )
            return local_df(spark, sorted(out_rows), out_schema)

        # --- Woodruff CI -------------------------------------------------
        # one pass for the indicator moments at each point quantile:
        # z = 1{y <= q_hat};  p_hat = sum(w z)/W;  the linearized
        # variance of the weighted indicator mean needs sum(w^2 z) and
        # sum(w^2) (z^2 = z, and sum of the influence values is exactly 0)
        q_schema = StructType(
            list(key_fields)
            + [
                StructField("__qi__", LongType(), False),
                StructField("__qhat__", DoubleType(), False),
            ]
        )
        q_rows = [k[:-1] + (k[-1], point[k]) for k in state]
        qdf = local_df(spark, q_rows, q_schema)
        join_on = group_cols if group_cols else None
        joined = (
            base.join(F.broadcast(qdf), on=join_on, how="inner")
            if join_on
            else base.crossJoin(F.broadcast(qdf))
        )
        z = F.when(F.col("__y__") <= F.col("__qhat__"), 1.0).otherwise(0.0)
        w_ = F.col("__w__")
        se_by_key: dict[tuple, float] = {}
        if psu:
            # first-stage with-replacement linearization of the
            # indicator mean: collapse to weighted PSU totals
            # (u_c = Σ_{i∈c} w_i z_i, t_c = Σ w_i), then per-stratum
            # df-corrected centered second moments — a two-level
            # distributed aggregation; O(groups × qs × strata) scalars
            # reach the driver
            from data_integration_est_spark.kernels.stats import (
                _fpc_factor, _strat_var)

            hcols = ["__h__"] if strat else []
            lvl1 = joined.groupBy(
                *group_cols, "__qi__", *hcols, "__psu__"
            ).agg(
                F.sum(w_ * z).alias("uz"),
                F.sum(w_).alias("uw"),
                *([F.max("__fpc__").alias("__fpc__")]
                  if design.fpc_col else []),
            )
            uz, uw = F.col("uz"), F.col("uw")
            mom = lvl1.groupBy(*group_cols, "__qi__", *hcols).agg(
                F.count(F.lit(1)).alias("n_c"),
                F.sum(uz).alias("swz"),
                F.sum(uw).alias("sw"),
                F.sum(uz * uz).alias("szz"),
                F.sum(uz * uw).alias("szw"),
                F.sum(uw * uw).alias("sww"),
                *([F.max("__fpc__").alias("__N__")]
                  if design.fpc_col else []),
            ).collect()
            # domain estimation (group_cols): d.o.f. uses the
            # FULL-design PSU count per stratum — PSUs with no
            # in-group rows contribute zero totals but still count
            full_psu_n: dict | None = None
            if group_cols:
                cnt = base.groupBy(*hcols).agg(
                    F.countDistinct("__psu__").alias("__n__")
                ).collect()
                full_psu_n = {
                    (r["__h__"] if strat else None): int(r["__n__"])
                    for r in cnt
                }
            by_key: dict[tuple, list] = {}
            for r in mom:
                k = tuple(r[c] for c in group_cols) + (int(r["__qi__"]),)
                by_key.setdefault(k, []).append(r)
            for k, rows in by_key.items():
                _lo, _hi, W, _n = group_info[k[:-1]]
                p_hat = sum(float(r["swz"] or 0.0) for r in rows) / W
                pieces = []
                for r in rows:
                    hval = r["__h__"] if strat else None
                    n_h = (full_psu_n[hval] if full_psu_n is not None
                           else int(r["n_c"]))
                    s1 = float(r["swz"] or 0.0) - p_hat * float(r["sw"] or 0.0)
                    s2 = (
                        float(r["szz"] or 0.0)
                        - 2.0 * p_hat * float(r["szw"] or 0.0)
                        + p_hat * p_hat * float(r["sww"] or 0.0)
                    )
                    pieces.append((
                        n_h, s1, s2,
                        _fpc_factor(
                            n_h,
                            float(r["__N__"]) if design.fpc_col else None,
                        ),
                    ))
                v_p = _strat_var(pieces) / (W * W)
                se_by_key[k] = (
                    float("nan") if math.isnan(v_p)
                    else math.sqrt(max(v_p, 0.0))
                )
        elif strat:
            # stratified element design (r15): per-stratum df-corrected
            # pieces of u_i = w_i (z_i - p_hat), with the stratum fpc —
            # the same variance svymean reports on this design (the SE
            # was silently unstratified before this round)
            from data_integration_est_spark.kernels.stats import (
                _fpc_factor, _strat_var)

            mom = joined.groupBy(*group_cols, "__qi__", "__h__").agg(
                F.count(F.lit(1)).alias("n_h"),
                F.sum(w_ * z).alias("swz"),
                F.sum(w_).alias("sw"),
                F.sum(w_ * w_ * z).alias("sw2z"),
                F.sum(w_ * w_).alias("sw2"),
                *([F.max("__fpc__").alias("__N__")] if carry_fpc else []),
            ).collect()
            by_key: dict[tuple, list] = {}
            for r in mom:
                k = tuple(r[c] for c in group_cols) + (int(r["__qi__"]),)
                by_key.setdefault(k, []).append(r)
            for k, rows in by_key.items():
                _lo, _hi, W, _n = group_info[k[:-1]]
                p_hat = sum(float(r["swz"] or 0.0) for r in rows) / W
                pieces = []
                for r in rows:
                    s1 = float(r["swz"] or 0.0) - p_hat * float(r["sw"] or 0.0)
                    s2 = (1.0 - 2.0 * p_hat) * float(r["sw2z"] or 0.0) + (
                        p_hat * p_hat
                    ) * float(r["sw2"] or 0.0)
                    pieces.append((
                        int(r["n_h"]), s1, s2,
                        _fpc_factor(
                            int(r["n_h"]),
                            float(r["__N__"]) if carry_fpc else None,
                        ),
                    ))
                v_p = _strat_var(pieces) / (W * W)
                se_by_key[k] = (
                    float("nan") if math.isnan(v_p)
                    else math.sqrt(max(v_p, 0.0))
                )
        else:
            mom = (
                joined.groupBy(*group_cols, "__qi__")
                .agg(
                    F.sum(w_ * z).alias("swz"),
                    F.sum(w_ * w_ * z).alias("sw2z"),
                    F.sum(w_ * w_).alias("sw2"),
                )
                .collect()
            )
            for r in mom:
                k = tuple(r[c] for c in group_cols) + (int(r["__qi__"]),)
                _lo, _hi, W, n = group_info[k[:-1]]
                p_hat = float(r["swz"]) / W
                # sum(w^2 (z - p)^2) = (1 - 2p) sum(w^2 z) + p^2 sum(w^2)
                sum_w2e2 = (1.0 - 2.0 * p_hat) * float(r["sw2z"]) + (
                    p_hat * p_hat
                ) * float(r["sw2"])
                if n < 2:
                    se_by_key[k] = float("nan")
                    continue
                v_p = n / (n - 1.0) * sum_w2e2 / (W * W)
                se_by_key[k] = math.sqrt(max(v_p, 0.0))
        zcrit = NormalDist().inv_cdf(1.0 - alpha / 2.0)
        ci_state: dict[tuple, dict] = {}
        for k, se_p in se_by_key.items():
            if math.isnan(se_p):
                continue
            lo, hi, W, _n = group_info[k[:-1]]
            q = float(qs[k[-1]])
            t_lo = max(q - zcrit * se_p, 0.0) * W
            t_hi = min(q + zcrit * se_p, 1.0) * W
            ci_state[k + (0,)] = {"lo": lo, "hi": hi, "target": t_lo}
            ci_state[k + (1,)] = {"lo": lo, "hi": hi, "target": t_hi}

        # solve both inverted endpoints together; the slot key is
        # (..., qi*2 + side) flattened so one bisection handles all
        flat_state = {
            k[:-2] + (k[-2] * 2 + k[-1],): dict(s) for k, s in ci_state.items()
        }
        ci_vals = _solve_exact(spark, base, group_cols, key_fields,
                               flat_state, bins, n_narrow)
        out_rows = []
        for k in state:
            se = se_by_key.get(k, float("nan"))
            if math.isnan(se):
                ci_l = ci_u = None
            else:
                ci_l = ci_vals[k[:-1] + (k[-1] * 2,)]
                ci_u = ci_vals[k[:-1] + (k[-1] * 2 + 1,)]
            out_rows.append(
                k[:-1] + (float(qs[k[-1]]), point[k], ci_l, ci_u)
            )
        out_schema = StructType(
            key_fields
            + [
                StructField("q", DoubleType(), False),
                StructField("quantile", DoubleType(), True),
                StructField("ci_l", DoubleType(), True),
                StructField("ci_u", DoubleType(), True),
            ]
        )
        return local_df(spark, sorted(out_rows), out_schema)
    finally:
        base.unpersist()


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
    ``svyquantile`` under a unit weight over a PERSISTED one-column
    projection (shared by the rescale aggregation, so the source is
    scanned once for all quantile + rescale passes), then one map
    projection.  Returns the design's frame plus ``out_col``."""
    if not (0.0 < upper_quantile < 1.0):
        raise ValueError("upper_quantile must be in (0, 1)")
    df = design.df
    narrow = (
        df.na.drop(subset=[design.weight_col])
        .select(F.col(design.weight_col).cast("double").alias("__wv__"))
        .withColumn("__one__", F.lit(1.0))
        .persist()
    )
    try:
        wq = svyquantile(
            SurveyDesign(df=narrow, weight_col="__one__"),
            "__wv__", qs=(upper_quantile,),
        )
        cap = float(wq.collect()[0]["quantile"])
        wv = F.col("__wv__")
        sums = narrow.agg(
            F.sum(wv).alias("tw"),
            F.sum(F.least(wv, F.lit(cap))).alias("tc"),
        ).collect()[0]
    finally:
        narrow.unpersist()
    scale = float(sums["tw"]) / float(sums["tc"])
    w = F.col(design.weight_col).cast("double")
    return df.withColumn(out_col, F.least(w, F.lit(cap)) * F.lit(scale))


def trimmed_mean(
    design: SurveyDesign,
    y_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    winsorize: bool = False,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Robust design-weighted means — the outlier-control estimators
    survey practice pairs with weight trimming:

    - trimmed (default): drop rows with y outside the [lower, upper]
      exact weighted quantiles, weighted mean of the rest;
    - ``winsorize=True``: CLIP y into the quantile bracket instead of
      dropping (mass is preserved; extreme values contribute at the
      fence).

    Exact per-group fences come from :func:`svyquantile` (histogram
    bisection — no sort); the estimate is then ONE more aggregation with
    the fences applied as a broadcast-joined CASE expression.  Returns
    (group_cols..., q_lo, q_hi, mean, w_used, n_used)."""
    if not (0.0 < lower < upper < 1.0):
        raise ValueError("need 0 < lower < upper < 1")
    group_cols = list(group_cols or [])
    qdf = svyquantile(design, y_col, qs=(lower, upper), group_cols=group_cols)
    fences = (
        qdf.groupBy(*group_cols).agg(
            F.min(F.when(F.col("q") == lower, F.col("quantile"))).alias("q_lo"),
            F.min(F.when(F.col("q") == upper, F.col("quantile"))).alias("q_hi"),
        )
        if group_cols
        else qdf.groupBy().agg(
            F.min(F.when(F.col("q") == lower, F.col("quantile"))).alias("q_lo"),
            F.min(F.when(F.col("q") == upper, F.col("quantile"))).alias("q_hi"),
        )
    )
    df = design.df.na.drop(subset=[y_col, design.weight_col] + group_cols)
    joined = (
        df.join(F.broadcast(fences), on=group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(fences))
    )
    w = F.col(design.weight_col).cast("double")
    y = F.col(y_col).cast("double")
    if winsorize:
        y_eff = F.least(F.greatest(y, F.col("q_lo")), F.col("q_hi"))
        keep = F.lit(True)
    else:
        y_eff = y
        keep = (y >= F.col("q_lo")) & (y <= F.col("q_hi"))
    aggs = [
        F.min("q_lo").alias("q_lo"),
        F.min("q_hi").alias("q_hi"),
        (F.sum(F.when(keep, w * y_eff)) / F.sum(F.when(keep, w))).alias("mean"),
        F.sum(F.when(keep, w)).alias("w_used"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_used"),
    ]
    out = joined.groupBy(*group_cols).agg(*aggs) if group_cols else joined.agg(*aggs)
    return out
