"""Portable mergeable sketches — HyperLogLog distinct counting with an
ENGINE-PORTABLE hash so the whole sketch is replayable in any SQL engine.

Spark's built-in ``approx_count_distinct`` is a HyperLogLog++ whose hash
(xxhash64 variant) and bias tables are engine-internal: the ESTIMATE is
not reproducible outside the JVM, which is why the r2 gate row
``approx_sketch_check`` certifies only the error CONTRACT.  This module
implements classic HyperLogLog (Flajolet et al. 2007) on an md5-derived
60-bit hash — md5 is bit-identical everywhere — so the registers AND the
estimate are exactly reproducible in DuckDB/Trino/Postgres: the gate can
hash-compare the estimate itself, and a downstream system can verify or
resume a sketch without Spark.

Scale shape: register building is ONE groupBy over at most m = 2**p keys
(map-side combined — executors emit at most m rows each); the estimate
is O(m) driver arithmetic.  Sketches over partitions/sources merge by
per-register MAX — the classic mergeable-monoid property, so per-source
sketches roll up to a corpus sketch without rescanning (``hll_merge``).

Why classic HLL and not ++: the ++ refinements (64-bit hash, bias
correction tables, sparse encoding) buy accuracy below ~5/2*m
cardinalities; the empirical bias tables are NOT portably specified, and
portability is this module's point.  The linear-counting small-range
correction is kept (it is exactly specified).

Cites: reference has no sketch surface; this extends the engine's
LLM-pipeline layer (corpus cardinality QA, per-source distinct tallies).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix bits used for the hash (15 hex chars = 60 bits: safely
# inside BIGINT range in every engine, no sign games)
_HASH_BITS = 60


def _hash60(col: Column) -> Column:
    """60-bit integer hash from the md5 hex prefix — bit-identical in
    any engine with md5 + hex->int conversion.

    Portability caveat: the value is md5'd through its STRING rendering,
    which engines agree on for integers and strings but not necessarily
    for floats ('1.0' vs '1'); hash integer/string keys (ids, tokens,
    urls) — the distinct-counting use case — or pre-format floats."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def bucket_rho_cols(col: str, p: int) -> tuple[Column, Column]:
    """(bucket, rho) column expressions for one value column — shared by
    the batch register builder and the streaming cardinality monitor.

    Exact integer bit ops only (float division would lose bits above
    2^53); rho via the binary-string length: bin(rest) has no leading
    zeros, so used_bits = length(bin(rest)) and rho = rest_bits − used
    + 1, with rest = 0 (all zeros) -> rest_bits + 1.  String ops are
    deterministic and identical across engines (DuckDB has bin too)."""
    if not (4 <= p <= 18):
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    rest_bits = _HASH_BITS - p
    h = _hash60(F.col(col))
    bucket = h.bitwiseAND(F.lit(m - 1)).cast("long")
    rest = F.shiftright(h, p).cast("long")
    rho = (
        F.when(rest == 0, F.lit(rest_bits + 1))
        .otherwise(F.lit(rest_bits + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build HLL registers: one row per (group, bucket) with the max
    rank (rho = leading-zero count + 1 of the remaining 60-p bits).

    Nulls are skipped (SQL distinct semantics).  Output columns:
    ``group_cols... , bucket, rho`` — a mergeable sketch table (merge =
    max per bucket, ``hll_merge``)."""
    group_cols = list(group_cols or [])
    bucket, rho = bucket_rho_cols(col, p)
    # p rides the register table as schema metadata so a merge across
    # mismatched precisions fails loudly at plan time
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("bucket", metadata={"hll_p": p}),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union per-register sketches (same p, same grouping columns):
    max per (group, bucket) — the HLL monoid.  Inputs built by
    :func:`hll_registers` carry p as schema metadata; a merge across
    DIFFERENT precisions raises at plan time (max-folding registers
    from different bucket spaces skews the estimate silently)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    from data_integration_est_spark.util import check_same_sketch_params

    check_same_sketch_params(sketches, "bucket", ("hll_p",), "hll_merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def read_off_estimate(s_nonzero: float, n_buckets: int, m: int) -> float:
    """Harmonic-mean estimate from (Σ 2^-rho over NON-ZERO registers,
    count of non-zero registers): absent registers contribute 2^0 = 1;
    linear counting below 2.5m when zero registers remain.  Scalar
    form — used by the streaming state handler, which folds registers
    per key INSIDE an Arrow batch; the batch/plan path uses
    ``hll_estimate_expr``."""
    s = s_nonzero + (m - n_buckets)
    v = m - n_buckets
    e = _alpha(m) * m * m / s
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return float(e)


def hll_estimate_expr(s: Column, nb: Column, m: int) -> Column:
    """``read_off_estimate`` as a column expression over the per-group
    moments s = Σ 2^-rho (non-zero registers) and nb = register count —
    the whole read-off stays inside the plan (no driver round-trip),
    so per-domain cardinality read-offs scale to O(groups) without
    O(groups) driver traffic (round-10; was a collect() loop)."""
    mf = float(m)
    s_full = s + (F.lit(mf) - nb)          # absent registers: 2^0 = 1
    v = F.lit(mf) - nb                     # zero-register count
    e = F.lit(_alpha(m) * mf * mf) / s_full
    return (
        F.when((e <= 2.5 * mf) & (v > 0),
               F.lit(mf) * F.log(F.lit(mf) / v))
        .otherwise(e)
    )


def hll_estimate(
    registers: DataFrame, p: int, group_cols: list[str] | None = None
) -> DataFrame:
    """Read the cardinality estimate off a register table: the harmonic
    mean E = alpha_m * m^2 / sum 2^-M_j (absent buckets count as M=0),
    with the exactly-specified linear-counting small-range correction
    E <= 2.5m & V>0 -> m ln(m/V).  O(m) per group, ONE aggregation,
    fully lazy: returns the unexecuted plan (order unspecified, like
    any aggregate — sort at the call site if needed)."""
    group_cols = list(group_cols or [])
    m = 1 << p
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s__"),
            F.count(F.lit(1)).alias("__nb__"),
        )
        .select(
            *group_cols,
            hll_estimate_expr(F.col("__s__"), F.col("__nb__"), m)
            .alias("hll_estimate"),
        )
    )


def hll_count_distinct(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-call estimate: registers + read-off.  Returns one row per
    group: (group_cols..., hll_estimate)."""
    return hll_estimate(
        hll_registers(df, col, p=p, group_cols=group_cols),
        p,
        group_cols=group_cols,
    )
