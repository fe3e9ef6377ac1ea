"""Portable Count-Min sketch — approximate frequencies on the
engine-portable hash, the third leg of the sketch family (HLL =
cardinality, Bloom = membership, CMS = frequency).

Cormode & Muthukrishnan (2005): d hash rows of w counters; an item adds
its weight to one counter per row; the frequency estimate is the MIN
over its d counters — always an over-estimate, with
P[error > eps * N] <= delta for w = ceil(e/eps), d = ceil(ln(1/delta)).
The d row indices come from the same md5 double-hash family as
``ops/bloom`` (Kirsch–Mitzenmacher with an odd stride: idx_j =
(h1 mod w + j*(1 + 2*(h2 mod w/2))) mod w, coprime with w), so the
counter table — and therefore every estimate — reproduces exactly in
DuckDB/Trino/Postgres.

Why this matters at 100 TB: exact per-item counts of a high-cardinality
column (tokens, urls, user ids) are a vocabulary-sized shuffle; the CMS
is ONE map-side-combined groupBy into at most d*w counter rows per
group, mergeable across shards/sources/days by plain addition (the CMS
monoid), and the query side is a broadcast join.  The exact companion
(``ops/heavy_hitters``: Misra–Gries + exact recount) answers "which
items are heavy"; the CMS answers "how heavy is THIS item" without
rescanning.

Weighted counts are first-class (``weight_col``) — token counts, byte
sizes, revenue — since the sketch is linear in the update weights.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.ops.bloom import _FMT, _hash_halves


def _check_params(depth: int, width: int) -> None:
    if not (1 <= depth <= 16):
        raise ValueError("depth must be in [1, 16]")
    # power of two so the ODD stride is coprime with width — an item's
    # depth counter indices are then always depth distinct columns
    if not (16 <= width <= (1 << 24)) or width & (width - 1):
        raise ValueError("width must be a power of two in [16, 2^24]")


def cms_row_idx(col: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` counter indices for one value — the shared
    kernel of the builder and the prober.  Same exact-integer double
    hashing as ``ops/bloom`` (ODD stride, coprime with the power-of-two
    width, so the depth probes never collapse onto one column)."""
    _check_params(depth, width)
    h1, h2 = _hash_halves(col)
    base = h1 % F.lit(width)
    stride = F.lit(1) + F.lit(2) * (h2 % F.lit(width // 2))
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda j: (base + j.cast("long") * stride) % F.lit(width),
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the counter table: one row per (group, row_j, col_idx)
    with the summed weight (1 per item unless ``weight_col``).  Nulls
    are skipped.  Output columns: ``group_cols..., j, idx, cnt`` — a
    mergeable sketch (merge = sum per counter, :func:`cms_merge`).
    At most ``depth * width`` rows per group ever shuffle: executors
    pre-aggregate map-side, so the corpus scan emits counter rows, not
    item rows."""
    group_cols = list(group_cols or [])
    w = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    )
    idx = cms_row_idx(F.col(col), depth, width)
    pairs = (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols, w.alias("__w__"),
            F.posexplode(idx).alias("j", "idx"),
        )
    )
    # (d, w) ride the counter table as schema metadata so a merge
    # across mismatched parameters fails loudly at plan time
    meta = {"cms_depth": depth, "cms_width": width, "cms_fmt": _FMT}
    return (
        pairs.groupBy(*group_cols, "j", "idx")
        .agg(F.sum("__w__").alias("cnt"))
        .select(
            *group_cols, F.col("j").alias("j", metadata=meta), "idx", "cnt"
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables built with the SAME (depth, width, group
    columns): sum per (group, j, idx) — the CMS monoid.  Inputs built
    by :func:`cms_build` carry (d, w) as schema metadata; a merge
    across DIFFERENT parameters raises at plan time (summing counters
    from incompatible layouts over-counts silently)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    from data_integration_est_spark.util import check_same_sketch_params

    check_same_sketch_params(
        sketches, "j", ("cms_depth", "cms_width", "cms_fmt"), "cms_merge"
    )
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_query(
    df: DataFrame,
    col: str,
    sketch: DataFrame,
    depth: int,
    width: int,
    id_col: str,
    out_col: str = "cms_count",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Estimated frequency for every row of ``df``: the MIN over the
    item's ``depth`` counters (absent counter = 0).  Always >= the true
    count; the expected overshoot is ~N/width per row before the min.
    ``id_col`` must be unique per row (like ``bloom_contains``): the k
    probes fold back onto the row by id, so duplicate ids with
    different values would take the min across BOTH values' counters.

    Probing a GROUP-built sketch (``cms_build(group_cols=...)``):

    - ``group_cols=None`` (default) answers the UNION — counters are
      summed per (j, idx) first (the CMS merge), so the estimate is the
      item's TOTAL frequency and the never-undercount guarantee holds
      (without the fold, the min would range over every group's
      counters and silently undercount);
    - ``group_cols=[...]`` answers PER GROUP — ``df`` must carry the
      same group columns, each row probes its own group's counters, and
      an (item, group) pair whose group the sketch never saw estimates
      0 (nothing was counted there).

    Physical shape: posexplode the d probes, broadcast-join the counter
    table (<= groups * d*w rows — a few MB at any realistic size), min
    per id, join back.  Null values estimate 0 (nothing null was
    counted)."""
    from data_integration_est_spark.util import check_probe_params

    # same probe-layout validation as bloom_contains: a (d, w, stride
    # format) mismatch undercounts silently (r12; ADVICE r11)
    check_probe_params(
        sketch, "j",
        {"cms_depth": depth, "cms_width": width, "cms_fmt": _FMT},
        "cms_query",
    )
    gcols = list(group_cols or [])
    if gcols:
        sketch = sketch.select(*gcols, "j", "idx", "cnt")
    else:
        sketch = sketch.select("j", "idx", "cnt").groupBy("j", "idx").agg(
            F.sum("cnt").alias("cnt")
        )
    idx = cms_row_idx(F.col(col), depth, width)
    probes = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(id_col), *gcols, F.posexplode(idx).alias("j", "idx"))
    )
    est = (
        probes.join(F.broadcast(sketch), [*gcols, "j", "idx"], "left")
        .select(id_col, F.coalesce("cnt", F.lit(0.0)).alias("__c__"))
        .groupBy(id_col)
        .agg(F.min("__c__").alias(out_col))
    )
    return df.join(est, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0.0))
    )


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) for the (eps, delta) guarantee:
    w = ceil(e/eps), d = ceil(ln(1/delta))."""
    if not (0 < eps < 1) or not (0 < delta < 1):
        raise ValueError("eps and delta must be in (0, 1)")
    return (
        max(1, math.ceil(math.log(1.0 / delta))),
        max(16, math.ceil(math.e / eps)),
    )
