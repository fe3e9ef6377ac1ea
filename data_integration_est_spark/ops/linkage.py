"""Fuzzy record linkage (engine extension; the approximate cousin of the
reference's exact two-table integration, ``RegDI2.R:68-101`` joins on
``id_var_A = id_var_B``).

Real-world integration rarely has clean keys; the standard recipe is
blocked candidate generation + edit-distance verification:

  1. BLOCK: an equi-join on a cheap deterministic key (first token, last
     n characters, a phonetic code) — turns the O(|L|x|R|) all-pairs
     problem into a sum of per-block products.  This is the same
     candidate-generation shape as the MinHash/SimHash dedup operators.
  2. VERIFY: ``levenshtein`` (JVM built-in, codegen) on the candidates
     only, thresholded.
  3. RESOLVE: per right record keep the best match (min distance,
     deterministic tie-break) — a partial top-1 window.

At 100 TB the block join shuffles on the block key; skewed blocks are
ordinary join skew (AQE splits them), unlike windows.  All semantics are
ANSI-SQL-portable so DuckDB verifies exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def block_first_token(col: Column) -> Column:
    """Block on the first whitespace token (lowercased)."""
    return F.split(F.lower(col), r"\s+").getItem(0)


def block_suffix(col: Column, n: int = 6) -> Column:
    """Block on the last ``n`` characters — robust to head-of-string
    typos; ``right()`` keeps short strings intact in Spark and DuckDB
    alike."""
    return F.right(col, F.lit(n))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    left_id: str,
    right_id: str,
    block_left: Column,
    block_right: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Blocked fuzzy join: candidate pairs share a block key, verified
    with ``levenshtein(left_name, right_name) <= max_dist``.

    Returns (l_id, l_name, r_id, r_name, dist).  Recall is bounded by
    the blocking: pairs whose block keys differ are never considered —
    choose a key the expected error mode cannot corrupt (e.g. suffix
    blocking for head typos).  Null names never match (levenshtein with
    a null is null, filtered by the threshold).
    """
    bl = left.select(
        F.col(left_id).alias("l_id"),
        F.col(left_name).alias("l_name"),
        block_left.alias("__blk__"),
    )
    br = right.select(
        F.col(right_id).alias("r_id"),
        F.col(right_name).alias("r_name"),
        block_right.alias("__blk__"),
    )
    return (
        bl.join(br, on="__blk__")
        .withColumn("dist", F.levenshtein(F.col("l_name"), F.col("r_name")))
        .filter(F.col("dist") <= max_dist)
        .drop("__blk__")
    )


def best_matches(matches: DataFrame, per: str = "r_id") -> DataFrame:
    """Resolve a ``fuzzy_join`` result to the single best match per
    record: min distance, ties to the smallest counterpart id.  A
    partial top-1 window (WindowGroupLimit) — never a full sort."""
    other = "l_id" if per == "r_id" else "r_id"
    w = Window.partitionBy(per).orderBy(
        F.col("dist").asc(), F.col(other).asc()
    )
    return (
        matches.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") == 1)
        .drop("__rk__")
    )
