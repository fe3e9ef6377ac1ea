"""Exact distributed heavy hitters — frequent values without shuffling
the long tail.

The naive plan for "values with frequency >= phi*N" is a full
groupBy-count: at 100 TB that shuffles EVERY distinct value (frequent
n-grams over a web corpus: billions of keys, almost all of them seen
once).  The classical two-pass fix (Misra-Gries 1982; mergeable-summary
form per Agarwal et al., "Mergeable Summaries", PODS'12):

1. CANDIDATES — each partition keeps a Misra-Gries summary of
   ``k = ceil(1/phi)+1`` counters.  MG guarantees any value with local
   frequency > n_p/(k+1) survives; by a weighted-average argument a
   value with GLOBAL frequency >= phi*N exceeds that bound in at least
   one partition, so the union of partition summaries is a SUPERSET of
   the true heavy hitters (no false negatives; O(partitions/phi)
   candidates total, independent of N and of the number of distincts).
2. EXACT RECOUNT — broadcast the candidate set, semi-join the base (a
   map-side hash filter: the long tail never enters a shuffle), exact
   groupBy-count of candidates only, filter ``count >= phi*N``.

The result is EXACT — the sketch only prunes, never decides.  The
summaries are maintained per Arrow batch with the MERGE rule (add batch
counts, subtract the (k+1)-th largest, drop non-positive), so the inner
loop is pandas ``value_counts``/``nlargest`` — no per-row Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, phi: float) -> DataFrame:
    """Per-partition Misra-Gries candidate values for the phi threshold
    (superset guarantee — see module docstring).  Returns a one-column
    DataFrame of distinct candidate values, O(partitions/phi) rows."""
    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    k = int(math.ceil(1.0 / phi)) + 1
    import pandas as pd

    narrow = df.select(col).na.drop()
    schema = narrow.schema

    def mg(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            batch = pdf[col].value_counts()
            counters = counters.add(batch, fill_value=0)
            if len(counters) > k:
                # mergeable-summary decrement: subtract the (k+1)-th
                # largest count from EVERY counter, drop the non-positive.
                # The subtraction is load-bearing: dropping without
                # decrementing lets persistent-but-diffuse values be
                # evicted repeatedly past the n/(k+1) error budget,
                # breaking the no-false-negative guarantee.
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters.sub(cut)
                counters = counters[counters > 0]
        yield pd.DataFrame({col: counters.index})

    return narrow.mapInPandas(mg, schema=schema).distinct()


def misra_gries_candidates_by(
    df: DataFrame, col: str, by: str, phi: float, max_groups: int = 10_000
) -> DataFrame:
    """Per-GROUP Misra-Gries candidates: one independent summary per
    group per partition (the no-false-negative pigeonhole argument is
    per-group, so a shared summary would not guarantee per-group
    thresholds).  Returns distinct (by, col) candidate pairs,
    O(partitions x groups / phi) rows — sized for modest group counts
    (languages, sources), not high-cardinality keys.

    ``max_groups`` guards that sizing: once a partition's summary dict
    exceeds it, the task fails loudly instead of silently degrading into
    per-group pandas overhead with an O(groups/phi) candidate blow-up —
    at that cardinality a plain groupBy-count IS the right plan, so the
    error says to use it (or raise the bound deliberately)."""
    if not (0.0 < phi < 1.0):
        raise ValueError("phi must be in (0, 1)")
    if max_groups < 1:
        raise ValueError("max_groups must be >= 1")
    k = int(math.ceil(1.0 / phi)) + 1
    import pandas as pd

    narrow = df.select(by, col).na.drop()
    schema = narrow.schema

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            batch = pdf.groupby([by, col]).size()
            for g, sub in batch.groupby(level=0):
                cur = counters.get(g, pd.Series(dtype="int64"))
                cur = cur.add(sub.droplevel(0), fill_value=0)
                if len(cur) > k:
                    cut = cur.nlargest(k + 1).iloc[-1]
                    cur = cur.sub(cut)
                    cur = cur[cur > 0]
                counters[g] = cur
            if len(counters) > max_groups:
                raise ValueError(
                    f"misra_gries_candidates_by: more than {max_groups} "
                    f"distinct {by!r} groups observed in one partition — "
                    "per-group MG summaries are sized for modest group "
                    "counts; use a plain groupBy-count for high-"
                    "cardinality keys, or raise max_groups deliberately"
                )
        rows = [(g, v) for g, cur in counters.items() for v in cur.index]
        yield pd.DataFrame(rows, columns=[by, col])

    return narrow.mapInPandas(mg, schema=schema).distinct()


def heavy_hitters_by(
    df: DataFrame, col: str, by: str, phi: float
) -> DataFrame:
    """Exact per-group heavy hitters: every (group, value) whose count
    is >= ``phi`` x the group's non-null rows.  Same two-pass shape as
    ``heavy_hitters`` with per-group thresholds resolved by a broadcast
    join of the tiny group-total table."""
    narrow = df.select(by, col).na.drop()
    cand = misra_gries_candidates_by(df, col, by, phi)
    totals = narrow.groupBy(by).agg(F.count(F.lit(1)).alias("__N__"))
    return (
        narrow.join(F.broadcast(cand), [by, col])
        .groupBy(by, col)
        .agg(F.count(F.lit(1)).alias("count"))
        .join(F.broadcast(totals), by)
        .filter(F.col("count") >= F.ceil(F.lit(phi) * F.col("__N__")))
        .drop("__N__")
    )


def heavy_hitters(
    df: DataFrame, col: str, phi: float, candidates: DataFrame | None = None
) -> DataFrame:
    """Exact (value, count) rows for every value with
    ``count >= phi * N`` (N = non-null rows).  ``candidates`` defaults to
    the Misra-Gries pass; inject a precomputed or known candidate set to
    skip it (e.g. when re-thresholding)."""
    from pyspark.sql import Window

    narrow = df.select(col).na.drop()
    if candidates is None:
        candidates = misra_gries_candidates(df, col, phi)
    # ONE pass over the base for recount AND total N: non-candidate rows
    # collapse into a single null-keyed group (map-side combined — the
    # long tail still never shuffles individually), so N = sum of all
    # group counts; the threshold resolves via an empty-frame window over
    # the O(candidates)-row aggregate, keeping the whole plan lazy and
    # saving the separate narrow.count() job.
    flagged = narrow.join(
        F.broadcast(candidates.withColumn("__c__", F.lit(1))), col, "left"
    )
    key = F.when(F.col("__c__") == 1, F.col(col))
    counts = flagged.groupBy(key.alias(col)).agg(
        F.count(F.lit(1)).alias("count")
    )
    total = F.sum("count").over(Window.partitionBy())
    return (
        counts.withColumn("__N__", total)
        .filter(
            F.col(col).isNotNull()
            & (F.col("count") >= F.ceil(F.lit(phi) * F.col("__N__")))
        )
        .drop("__N__")
    )
