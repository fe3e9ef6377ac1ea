"""Raking (iterative proportional fitting) — ``survey::rake`` parity.

Linear GREG calibration (``kernels/linalg.calibrate``) matches totals of
arbitrary x-columns but can produce negative weights; raking calibrates
to the MARGINS of categorical variables with multiplicative updates, so
weights stay positive — the standard post-stratification tool when only
margin counts (not the joint distribution) are known.  The reference's
calibration entry point (``RegDI2.R:188-193``) is the linear member of
the same calibration family; raking is its multiplicative sibling over
factor margins.

Algorithm (classic IPF): cycle through the margins; for margin m with
target totals T_m(level), multiply every row's weight by
``T_m(level_i) / sum_w(level_i)``.  Repeat until every margin matches
within ``tol`` or ``max_iter`` sweeps.

Scale design: the raked weight is, by construction, always
``d_i * prod_m fac_m(level_mi)`` — so the whole state is a per-margin
{level: factor} dict on the DRIVER, applied as a map-literal column
expression.  Each margin update is then ONE flat groupBy over the base
table (O(levels) rows collected, no join chain, no growing lineage), and
the final output is a single projection.  A full 10-sweep × 3-margin
rake is 30 scan-light aggregations over an unchanging plan shape.
Margins must have broadcastable level counts (thousands, not millions) —
use GREG calibration for high-cardinality margins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RakingError(ValueError):
    pass


def _weight_expr(d_col: str, factors: dict[str, dict]) -> Column:
    w = F.col(d_col).cast("double")
    for col, fac in factors.items():
        pairs: list[Column] = []
        for lvl, f in fac.items():
            pairs.extend([F.lit(lvl), F.lit(float(f))])
        w = w * F.create_map(*pairs)[F.col(col)]
    return w


def rake(
    df: DataFrame,
    margins: dict[str, dict],
    d_col: str,
    out_col: str = "w_rake",
    max_iter: int = 10,
    tol: float | None = 1e-7,
) -> DataFrame:
    """Rake design weights ``d_col`` to the margin targets.

    ``margins`` maps margin column -> {level: target_total}; every level
    present in ``df`` must have a target (unknown levels raise — silent
    zero-weighting loses rows).  ``tol`` is the worst relative margin
    error at which to stop early; pass ``None`` to always run exactly
    ``max_iter`` sweeps (deterministic work, e.g. for cross-engine
    replay).  Returns ``df`` plus ``out_col``; the input is never
    shuffled or reordered."""
    if not margins:
        raise RakingError("rake: need at least one margin")
    # seed factors from the targets so the first sweep also validates
    # that every data level has a target
    factors: dict[str, dict] = {
        col: {lvl: 1.0 for lvl in targets} for col, targets in margins.items()
    }

    for it in range(max_iter):
        worst = 0.0
        for col, targets in margins.items():
            w = _weight_expr(d_col, factors)
            rows = df.groupBy(col).agg(F.sum(w).alias("__s__")).collect()
            for r in rows:
                lvl, s = r[col], r["__s__"]
                if lvl not in targets:
                    raise RakingError(
                        f"rake: margin {col!r} level {lvl!r} has no target"
                    )
                s = float(s or 0.0)
                if s <= 0.0:
                    raise RakingError(
                        f"rake: margin {col!r} level {lvl!r} has non-positive "
                        f"weight sum {s}"
                    )
                t = float(targets[lvl])
                worst = max(worst, abs(t - s) / max(abs(t), 1e-300))
                factors[col][lvl] *= t / s
        # convergence is judged on the sums SEEN this sweep (pre-update
        # for the first margin) — one extra sweep of slack, zero extra
        # jobs; survey::rake uses the same criterion.
        if tol is not None and it > 0 and worst < tol:
            break
    return df.withColumn(out_col, _weight_expr(d_col, factors))


def poststratify(
    df: DataFrame,
    strata_col: str,
    pop_counts: dict,
    d_col: str,
    out_col: str = "w_ps",
) -> DataFrame:
    """Post-stratification — ``survey::postStratify`` parity: rescale the
    design weights so each stratum's weight total equals its known
    population count, ``w_i = d_i * N_g / sum_{j in g} d_j``.  The exact
    one-step special case of :func:`rake` with a single margin (IPF on
    one margin converges in one sweep).

    ``pop_counts`` maps stratum level -> population count; every level
    present in ``df`` must have a count (unknown levels raise — silent
    zero-weighting loses rows).  ONE flat groupBy collects the O(levels)
    stratum weight totals; the adjustment applies as a map-literal
    column expression (no join), so the output is a single projection —
    the same scale shape as ``rake``.

    Reference anchor: the survey-package weighting surface the thesis
    composes throughout (``RegDI2.R:188-193`` is the linear-calibration
    sibling; post-stratification is its exact one-margin multiplicative
    case)."""
    if not pop_counts:
        raise RakingError("poststratify: empty pop_counts")
    got = df.groupBy(strata_col).agg(
        F.sum(F.col(d_col).cast("double")).alias("__sw__")
    ).collect()
    factors: dict = {}
    for r in got:
        lvl = r[strata_col]
        if lvl not in pop_counts:
            raise RakingError(
                f"poststratify: stratum {lvl!r} has no population count"
            )
        sw = float(r["__sw__"] or 0.0)
        if sw <= 0.0:
            raise RakingError(
                f"poststratify: non-positive weight mass in stratum {lvl!r}"
            )
        factors[lvl] = float(pop_counts[lvl]) / sw
    return df.withColumn(
        out_col, _weight_expr(d_col, {strata_col: factors})
    )


def trim_weights_redistribute(
    df: DataFrame,
    d_col: str,
    lower: float | None = None,
    upper: float | None = None,
    by: str | None = None,
    out_col: str = "w_tr",
    max_iter: int = 1,
    strict: bool = False,
) -> DataFrame:
    """Weight trimming by redistribution — ``survey::trimWeights``
    parity in its literal redistribute-to-the-untrimmed form: clip
    weights to
    ``[lower, upper]`` and redistribute the clipped excess among the
    UNTRIMMED units in proportion to their weights, preserving the
    weight total exactly (per ``by`` group when given — the usual
    per-stratum discipline).  Extreme weights inflate design variance;
    trimming trades a small bias for a large variance reduction — the
    standard last step after calibration/raking produces outlier
    weights.  Sibling: ``kernels.quantile.trim_weights`` caps at a
    weight QUANTILE and rescales multiplicatively (no per-unit
    redistribution, no strict iteration) — use this one when the bounds
    are known constants and per-stratum totals must survive exactly.

    One iteration = ONE flat groupBy over the current weights
    (O(groups) rows collected) + a map-literal projection — the same
    scale shape as :func:`rake`/:func:`poststratify`: no join, no
    window over data, ``by`` must have broadcastable cardinality.
    Redistribution can push previously-interior weights past the
    bounds; ``strict=True`` iterates until clean (up to ``max_iter``,
    then raises), matching ``survey::trimWeights(strict=TRUE)``.
    ``max_iter`` passes scan the data ``max_iter`` times; the default
    single pass is the survey default (``strict=FALSE``).

    Raises :class:`RakingError` when a group is ALL-trimmed (no
    interior mass to absorb the excess) — redistribution is undefined
    there; loosen the bounds or trim within finer groups.
    """
    if lower is None and upper is None:
        raise RakingError("trim_weights_redistribute: give at least one bound")
    lo = float("-inf") if lower is None else float(lower)
    hi = float("inf") if upper is None else float(upper)
    if lo >= hi:
        raise RakingError(
            f"trim_weights_redistribute: lower {lo} >= upper {hi}")
    if max_iter < 1:
        raise RakingError(
            "trim_weights_redistribute: max_iter must be >= 1")

    gcol = by if by is not None else None
    cur = F.col(d_col).cast("double")
    work = df
    tmp = "__wtr_cur__"
    work = work.withColumn(tmp, cur)

    for it in range(max_iter):
        clip = F.least(F.greatest(F.col(tmp), F.lit(lo)), F.lit(hi))
        interior = (F.col(tmp) > lo) & (F.col(tmp) < hi)
        aggs = [
            F.sum(F.col(tmp) - clip).alias("__ex__"),
            F.sum(F.when(interior, clip).otherwise(F.lit(0.0)))
             .alias("__mass__"),
            F.sum(F.when(~interior, F.lit(1)).otherwise(F.lit(0)))
             .alias("__ntrim__"),
            F.count(F.col(tmp)).alias("__n__"),
            F.sum(F.col(tmp)).alias("__sw__"),
        ]
        cells = (work.groupBy(gcol).agg(*aggs) if gcol
                 else work.groupBy().agg(*aggs)).collect()
        fac: dict = {}
        dirty = False
        for r in cells:
            ex = float(r["__ex__"] or 0.0)
            mass = float(r["__mass__"] or 0.0)
            key = r[gcol] if gcol else None
            if it == 0:
                n, sw = int(r["__n__"] or 0), float(r["__sw__"] or 0.0)
                if sw > n * hi or sw < n * lo:
                    raise RakingError(
                        "trim_weights_redistribute: bounds are "
                        f"INFEASIBLE for group {key!r}: total weight "
                        f"{sw:.6g} lies outside [n*lower, n*upper] = "
                        f"[{n * lo:.6g}, {n * hi:.6g}] — no trimmed "
                        "weighting can both respect the bounds and "
                        "preserve the total; widen the bounds"
                    )
            if ex != 0.0 and mass <= 0.0:
                raise RakingError(
                    "trim_weights_redistribute: group "
                    f"{key!r} is entirely at the bounds with excess "
                    f"{ex:.6g} and no interior mass to absorb it"
                )
            if int(r["__ntrim__"] or 0) > 0 and ex != 0.0:
                dirty = True
            fac[key] = 1.0 + (ex / mass if mass > 0.0 else 0.0)
        if gcol:
            mapping = F.create_map(*[
                x for k, v in fac.items()
                for x in (F.lit(k), F.lit(v))
            ])
            scale = mapping[F.col(gcol)]
        else:
            scale = F.lit(fac[None])
        nxt = F.when(
            (F.col(tmp) > lo) & (F.col(tmp) < hi), clip * scale
        ).otherwise(clip)
        work = work.withColumn(tmp, nxt)
        if not dirty:
            break

    if strict:
        viol = work.filter(
            (F.col(tmp) < F.lit(lo) - F.lit(1e-9))
            | (F.col(tmp) > F.lit(hi) + F.lit(1e-9))
        ).count()
        if viol:
            raise RakingError(
                f"trim_weights_redistribute: {viol} weights still outside "
                f"[{lo}, {hi}] after {max_iter} strict iterations"
            )
    return work.withColumn(out_col, F.col(tmp)).drop(tmp)
