"""Portable quantile histogram sketch — the fourth leg of the portable
sketch family (HLL = cardinality, Bloom = membership, CMS = frequency,
this = distribution).

A fixed-range histogram is the dumbest possible quantile sketch — and
the only one whose every byte reproduces in any SQL engine: bin
boundaries are data-independent (unlike t-digest/KLL, whose compaction
depends on arrival order), counts form a sum monoid (merge = add), and
the read-off is exact integer/float arithmetic.  Resolution is the
price: estimates are bin LOWER EDGES, error <= (hi-lo)/bins — the
monitoring trade the streaming quantile monitor
(``streaming/monitor.py``) already makes; this module is its batch,
mergeable, IN-PLAN generalization (the monitor's batch twin collects
bins to the driver; here the read-off is a window + one aggregation,
no driver round-trip, so per-group quantiles scale to O(groups)).

Semantics shared with the monitor (pinned in pytest): values outside
[lo, hi) clamp to the edge bins — out-of-range mass shows up AT the
fence, where a monitor wants it; the q-quantile is the lower edge of
the first bin where the cumulative count reaches q*n.

Scale shape: build is ONE map-side-combined groupBy into at most
``bins`` rows per group; merge is union + sum; the read-off is one
keyed window (cumulative sum over <= bins rows per group) + one
aggregation.  Nothing is corpus-sized after the first scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(lo: float, hi: float, bins: int) -> None:
    if not (lo < hi) or bins < 2 or bins > (1 << 20):
        raise ValueError("need lo < hi and 2 <= bins <= 2^20")


def _q_label(q: float) -> str:
    """Column label for a quantile: ``q25`` when q*100 is a whole
    percent, else the full-precision ``q25_4``-style spelling — so two
    distinct requested quantiles can never silently share a column."""
    pct = round(q * 100.0, 9)
    if pct == int(pct):
        return f"q{int(pct)}"
    return "q" + ("%g" % pct).replace(".", "_")


def _sketch_meta(sketch: DataFrame) -> dict | None:
    """The (lo, hi, bins) build parameters stamped on the ``bin``
    column's metadata by :func:`qhist_build`, or None for a sketch
    table of unknown provenance."""
    try:
        md = sketch.schema["bin"].metadata
    except (KeyError, TypeError):
        return None
    if md and all(k in md for k in ("qhist_lo", "qhist_hi", "qhist_bins")):
        return {
            "lo": float(md["qhist_lo"]),
            "hi": float(md["qhist_hi"]),
            "bins": int(md["qhist_bins"]),
        }
    return None


def qhist_build(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the histogram: one row per (group, bin) with the count.
    Nulls skipped; out-of-range values clamp to the edge bins.  Output:
    ``group_cols..., bin, cnt`` — a mergeable sketch table
    (merge = sum per bin, :func:`qhist_merge`).  The build parameters
    ride along as schema metadata on ``bin``, so a merge or read-off
    with MISMATCHED (lo, hi, bins) fails loudly at plan time instead of
    silently summing incompatible bin layouts."""
    _check(lo, hi, bins)
    group_cols = list(group_cols or [])
    width = (float(hi) - float(lo)) / bins
    v = F.col(col).cast("double")
    b = F.least(
        F.greatest(F.floor((v - F.lit(float(lo))) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("long")
    meta = {
        "qhist_lo": float(lo), "qhist_hi": float(hi), "qhist_bins": bins,
    }
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, b.alias("bin", metadata=meta))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qhist_merge(*sketches: DataFrame) -> DataFrame:
    """Union histograms built with the SAME (lo, hi, bins, group
    columns): sum per (group, bin) — the histogram monoid.

    Every input built by :func:`qhist_build` carries its parameters in
    schema metadata; a merge across DIFFERENT (lo, hi, bins) raises
    here, at plan time — summing bin counts from incompatible layouts
    would otherwise produce silent garbage."""
    if not sketches:
        raise ValueError("need at least one sketch")
    metas = [(_sketch_meta(s), i) for i, s in enumerate(sketches)]
    known = [(m, i) for m, i in metas if m is not None]
    if len({tuple(sorted(m.items())) for m, _ in known}) > 1:
        detail = ", ".join(f"input[{i}]={m}" for m, i in known)
        raise ValueError(
            f"qhist_merge: mismatched histogram parameters — {detail}"
        )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def qhist_quantiles(
    sketch: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: tuple = (0.25, 0.5, 0.75),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Read quantiles off a histogram table, fully in the plan: per
    group, ``n`` plus one ``q{pct}`` column per requested quantile —
    the lower edge of the first bin whose cumulative count reaches
    q*n (the ``streaming/monitor`` read-off, expression form).

    ONE keyed window (cumulative count over <= bins rows) + ONE
    aggregation; no collect, so per-group quantile read-offs scale to
    O(groups) without driver traffic."""
    _check(lo, hi, bins)
    if not qs or not all(0.0 < q < 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1)")
    labels = [_q_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"quantile labels collide: {labels} for qs={tuple(qs)}"
        )
    built = _sketch_meta(sketch)
    if built is not None and built != {
        "lo": float(lo), "hi": float(hi), "bins": bins,
    }:
        raise ValueError(
            f"sketch was built with {built}, read-off requested "
            f"(lo={float(lo)}, hi={float(hi)}, bins={bins})"
        )
    group_cols = list(group_cols or [])
    width = (float(hi) - float(lo)) / bins
    w = (
        Window.partitionBy(*group_cols).orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    cum = F.sum("cnt").over(w)
    tot = F.sum("cnt").over(wall)
    edge = F.lit(float(lo)) + F.col("bin") * F.lit(width)
    aggs = [F.max(F.col("__tot__")).alias("n")]
    for q, label in zip(qs, labels):
        aggs.append(
            F.coalesce(
                F.min(
                    F.when(
                        F.col("__cum__") >= F.lit(float(q)) * F.col("__tot__"),
                        F.col("__edge__"),
                    )
                ),
                # q*n beyond the last cumulative count can only happen
                # via FP rounding of q*n against an integer cum at the
                # boundary; the read-off convention caps at the top bin
                F.lit(float(lo) + (bins - 1) * width),
            ).alias(label)
        )
    return (
        sketch.select(
            *group_cols, "bin", "cnt",
            cum.alias("__cum__"), tot.alias("__tot__"),
        )
        .withColumn("__edge__", edge)
        .groupBy(*group_cols)
        .agg(*aggs)
    )


def qhist_count_distinct_bins(sketch: DataFrame,
                              group_cols: list[str] | None = None
                              ) -> DataFrame:
    """Occupancy read-off: non-empty bins + total count per group (the
    cheap distribution-shape alarm: occupancy collapsing to a few bins
    means the metric degenerated)."""
    group_cols = list(group_cols or [])
    return sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("bin") * F.col("cnt")).alias("bin_checksum"),
    )
