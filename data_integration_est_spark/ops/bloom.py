"""Portable Bloom filter — set-membership sketch on an engine-portable
hash, the companion to the portable HLL (``ops/sketches``).

Spark ships a Bloom filter two ways and neither survives the engine
boundary: ``DataFrame.stat.bloomFilter`` materializes the bits on the
DRIVER (an O(m) collect, and the sketch lives in Python memory), and the
runtime-filter Bloom join is plan-internal.  This module builds the
filter AS A DATAFRAME — one row per 32-bit word, bits OR-folded by the
executors — on the md5-derived hash family of ``ops/sketches._hash60``,
so the bit array is reproducible bit-for-bit in DuckDB/Trino/Postgres:
a downstream system can verify membership (or keep building the same
filter) without Spark.  That is what an at-scale decontamination
pipeline needs: the benchmark-membership filter is built ONCE, stored as
a tiny table, and consulted from whatever engine ingests the next crawl.

Design (classic Bloom, Kirsch–Mitzenmacher double hashing):
- one md5 per value gives two independent 60-bit halves h1, h2
  (chars 1-15 and 17-31 of the hex digest);
- position_i = (h1 mod m  +  i * (1 + 2*(h2 mod m/2))) mod m for
  i = 0..k-1 — the stride is ODD and m a power of two, so the stride is
  coprime with m and an item's k probes always hit k distinct bits;
  every term stays far inside int64 and the arithmetic is exact in any
  engine;
- the bit array packs 32 bits per word (word = pos >> 5,
  mask = 1 << (pos & 31)): every mask fits a 32-bit signed value, so no
  engine's BIGINT shift/sign semantics are in play (bit 63 of a 64-bit
  pack is a sign-bit minefield across SQL dialects).

Scale shape: building is ONE map-side-combined groupBy over at most
m/32 word rows (executors emit at most m/32 rows each — same monoid
shape as HLL registers); membership probing broadcast-joins the word
table (m = 2^27 bits is a 32 MB broadcast) against the probe set's
exploded (word, mask) pairs, then folds k hits per probe — no driver
round-trip anywhere.  Merging filters with identical (m, k) is
union + bit_or: the Bloom monoid.

False positives are the contract: ``bloom_fpr`` gives the expected rate
(1 - e^{-kn/m})^k and ``bloom_stats`` reads the observed fill fraction
plus the standard cardinality estimate n-hat = -(m/k) ln(1 - X/m)
(Swamidass & Baldi 2007) off the word table in one aggregation.

Cites: reference has no sketch surface; this extends the engine's
LLM-pipeline layer (decontamination membership at ingest,
cross-engine benchmark blocklists).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.ops.sketches import _HASH_BITS

# Probe-layout format version, stamped on every built word table and
# validated by the probe side (util.check_probe_params): v1 = the
# pre-r11 naive ``1 + h2 mod (m-1)`` stride (never stamped — old
# persisted tables must be rebuilt); v2 = the odd coprime stride.
_FMT = 2


def _hash_halves(col: Column) -> tuple[Column, Column]:
    """Two independent 60-bit hashes from ONE md5 of the value's string
    rendering — portable everywhere md5 + hex parsing exist.  Same
    float caveat as ``sketches._hash60``: hash integer/string keys."""
    hx = F.md5(col.cast("string"))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 17, 15), 16, 10).cast("long")
    return h1, h2


def _check_params(n_bits: int, n_hashes: int) -> None:
    # power of two so the ODD stride below is coprime with m — the k
    # probe positions of one item are then always k DISTINCT bits
    if not (64 <= n_bits <= (1 << 30)) or n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two in [64, 2^30]")
    if not (1 <= n_hashes <= 16):
        raise ValueError("n_hashes must be in [1, 16]")
    if n_bits >= (1 << _HASH_BITS):
        raise ValueError("n_bits must be far below the 60-bit hash range")


def bloom_word_mask(
    col: Column, n_bits: int, n_hashes: int
) -> tuple[Column, Column]:
    """(word_idx, mask) arrays (length k) for one value column — the
    shared kernel of the builder and the prober.  Exact integer ops
    only: h1 mod m <= 2^30, stride <= 2^30, i*stride <= 16*2^30 —
    nothing approaches int64."""
    _check_params(n_bits, n_hashes)
    h1, h2 = _hash_halves(col)
    base = h1 % F.lit(n_bits)
    # 1 + 2*(h2 mod m/2): an ODD stride, hence coprime with the
    # power-of-two m — the k probes land on k distinct bits.  (The naive
    # 1 + h2 mod (m-1) can share a power-of-2 factor with m — worst case
    # stride = m/2 collapses k probes onto 2 bits, breaking the
    # (1-e^{-kn/m})^k contract.)
    stride = F.lit(1) + F.lit(2) * (h2 % F.lit(n_bits // 2))
    pos = F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: (base + i.cast("long") * stride) % F.lit(n_bits),
    )
    word = F.transform(pos, lambda p: F.shiftright(p, 5))
    # 2^(pos mod 32) via pow: exact in doubles up to 2^52, and the same
    # spelling works in every SQL engine (shiftleft's bit-count argument
    # must be a literal in several dialects, so no shift here)
    mask = F.transform(
        pos,
        lambda p: F.pow(F.lit(2.0), (p % 32).cast("double")).cast("long"),
    )
    return word, mask


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the filter: one row per (group, word_idx) with the OR of
    all 32-bit masks that land in that word.  Nulls are skipped (a
    Bloom filter answers "was this VALUE inserted").  Output columns:
    ``group_cols..., word_idx, word`` — a mergeable sketch table
    (merge = bit_or per word, :func:`bloom_merge`).  Zero words are
    simply absent, so a filter over n items carries at most
    min(k*n, m/32) rows."""
    group_cols = list(group_cols or [])
    word, mask = bloom_word_mask(F.col(col), n_bits, n_hashes)
    # build parameters ride the word table as schema metadata so a
    # merge across mismatched (m, k) fails loudly at plan time
    meta = {"bloom_n_bits": n_bits, "bloom_n_hashes": n_hashes,
            "bloom_fmt": _FMT}
    pairs = (
        df.filter(F.col(col).isNotNull())
        .select(*group_cols, F.explode(F.arrays_zip(
            word.alias("w"), mask.alias("b"))).alias("__wb__"))
        .select(
            *group_cols,
            F.col("__wb__.w").alias("word_idx", metadata=meta),
            F.col("__wb__.b").alias("__mask__"),
        )
    )
    return pairs.groupBy(*group_cols, "word_idx").agg(
        F.bit_or("__mask__").alias("word")
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union word tables built with the SAME (n_bits, n_hashes, group
    columns): bit_or per (group, word_idx) — the Bloom monoid.  Inputs
    built by :func:`bloom_build` carry (m, k) as schema metadata; a
    merge across DIFFERENT parameters raises at plan time (different
    bit layouts OR-folded together would answer membership wrongly with
    no error)."""
    if not filters:
        raise ValueError("need at least one filter")
    from data_integration_est_spark.util import check_same_sketch_params

    check_same_sketch_params(
        filters, "word_idx",
        ("bloom_n_bits", "bloom_n_hashes", "bloom_fmt"),
        "bloom_merge",
    )
    out = filters[0]
    for s in filters[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "word"]
    return out.groupBy(*keys).agg(F.bit_or("word").alias("word"))


def bloom_contains(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    n_bits: int,
    n_hashes: int,
    id_col: str,
    out_col: str = "might_contain",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Probe membership for every row of ``df``: ``out_col`` is true iff
    ALL k bits of ``col``'s value are set in the filter (no false
    negatives ever; false positives at the ``bloom_fpr`` rate).  Needs a
    unique ``id_col`` to fold the k probes back onto the row.

    Physical shape: explode the k (word, mask) probes, broadcast-join
    the word table (the filter is at most m/32 rows — 32 MB of longs at
    m = 2^27), count matched bits per id, join the boolean back on the
    id.  Null values probe as false (nothing null was inserted).

    Probing a GROUP-built filter (``bloom_build(group_cols=...)``):

    - ``group_cols=None`` (default) answers the UNION of the groups —
      the word table is bit_or-folded per word_idx first (without the
      fold, duplicate word_idx rows would over-count matched bits and
      return false NEGATIVES for genuine members — the one error a
      Bloom filter must never make);
    - ``group_cols=[...]`` answers PER GROUP — ``df`` must carry the
      same group columns, each row probes its own group's words, and a
      group the filter never saw probes false."""
    from data_integration_est_spark.util import check_probe_params

    # refuse (or warn, if unstamped) when the table's build parameters
    # or stride layout differ from this probe's — the mismatch would
    # return false negatives with no error (r12; ADVICE r11)
    check_probe_params(
        bloom, "word_idx",
        {"bloom_n_bits": n_bits, "bloom_n_hashes": n_hashes,
         "bloom_fmt": _FMT},
        "bloom_contains",
    )
    gcols = list(group_cols or [])
    if gcols:
        bloom = bloom.select(*gcols, "word_idx", "word")
    else:
        bloom = bloom.select("word_idx", "word").groupBy("word_idx").agg(
            F.bit_or("word").alias("word")
        )
    word, mask = bloom_word_mask(F.col(col), n_bits, n_hashes)
    probes = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(id_col), *gcols, F.explode(F.arrays_zip(
            word.alias("w"), mask.alias("b"))).alias("__wb__"))
        .select(
            id_col, *gcols,
            F.col("__wb__.w").alias("word_idx"),
            F.col("__wb__.b").alias("__mask__"),
        )
    )
    hits = (
        probes.join(F.broadcast(bloom), [*gcols, "word_idx"], "left")
        .select(
            id_col,
            (F.col("word").isNotNull()
             & (F.col("word").bitwiseAND(F.col("__mask__"))
                == F.col("__mask__"))).cast("int").alias("__hit__"),
        )
        .groupBy(id_col)
        .agg((F.sum("__hit__") == n_hashes).alias(out_col))
    )
    return df.join(hits, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(False))
    )


def bloom_stats(
    bloom: DataFrame, n_bits: int, n_hashes: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-aggregation read-off per group: words present, bits set, fill
    fraction, and the Swamidass–Baldi cardinality estimate
    n-hat = -(m/k) ln(1 - X/m) — all inside the plan (no collect)."""
    group_cols = list(group_cols or [])
    m = float(n_bits)
    agg = bloom.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.bit_count("word")).alias("bits_set"),
    )
    x = F.col("bits_set").cast("double")
    return agg.select(
        *group_cols,
        "n_words",
        "bits_set",
        F.round(x / m, 6).alias("fill_fraction"),
        F.round(
            -F.lit(m / n_hashes) * F.log(F.lit(1.0) - x / m), 2
        ).alias("n_estimate"),
    )


def bloom_fpr(n_items: int, n_bits: int, n_hashes: int) -> float:
    """Expected false-positive probability (1 - e^{-kn/m})^k."""
    if n_items <= 0:
        return 0.0
    return (1.0 - math.exp(-n_hashes * n_items / n_bits)) ** n_hashes


def optimal_n_hashes(n_bits: int, n_items: int) -> int:
    """k* = (m/n) ln 2, clamped to [1, 16]."""
    if n_items <= 0:
        return 1
    return max(1, min(16, round(n_bits / n_items * math.log(2.0))))
