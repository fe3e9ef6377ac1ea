"""Skew mitigation: salted joins for hot keys (SURVEY.md §4.4).

AQE's skew-join splitting handles sort-merge joins automatically; salting
is the explicit fallback for cases AQE can't rebalance (e.g. a hot key in
a shuffled-hash join, or pre-AQE engines).  The pattern: append a random
salt ∈ [0, n) to the BIG side's key, replicate the SMALL side n times
(one copy per salt value), join on (key, salt).  Each hot key's rows now
spread over n reducer partitions.

Cost model: small side is materialized n_salt×; choose n_salt ≈ the skew
factor (hot-key rows / median-key rows), not more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on equi-key(s) with the big side salted.

    Result is identical to ``big.join(small, on, how)`` for inner/left
    joins (each big row joins exactly the matching small rows — every
    small key exists under every salt)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full would duplicate unmatched small rows per salt)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = "__salt__"
    big_s = big.withColumn(salt, F.floor(F.rand(seed) * n_salt).cast("int"))
    salts = big.sparkSession.range(n_salt).select(F.col("id").cast("int").alias(salt))
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, on=keys + [salt], how=how).drop(salt)
