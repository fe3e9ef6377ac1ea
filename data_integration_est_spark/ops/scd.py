"""Snapshot integration: keyed diff between two table versions and
slowly-changing-dimension (SCD type 2) history construction from
stacked snapshots — the change-data-capture layer of a data
integration pipeline (Kimball SCD2; Delta/Hudi ``MERGE`` semantics,
re-expressed as plain deterministic DataFrame ops).

Spark-first shapes:

  ``snapshot_diff`` — ONE full outer equi-join on the key (broadcast
      if a side is small, AQE otherwise) + a map-only null-safe
      comparison per tracked column.  Changed columns are reported as
      a sorted comma-joined string (engine-portable, no array
      ordering ambiguity).
  ``scd2_merge`` — gaps-and-islands per key: one window pass marks
      attribute changes vs the previous snapshot (null-safe), a
      running sum numbers the islands, one groupBy collapses each
      island to [valid_from, valid_to) with ``lead`` supplying the
      close timestamp.  Two shuffles on the key total (window +
      groupBy share partitioning; Catalyst reuses the exchange).

Both operators shuffle only on the key columns — the 100 TB cost is
the unavoidable co-location of a key's history, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list,
    compare_cols: list | None = None,
) -> DataFrame:
    """Keyed diff old -> new.  Returns one row per key present in
    either side: ``key_cols...``, ``status`` in
    ``added | removed | changed | unchanged``, and ``changed_cols``
    (sorted comma-joined names whose values differ null-safely; empty
    string unless status = changed).

    ``compare_cols`` defaults to the non-key columns present in BOTH
    sides.  Null keys never equi-join, so a null-keyed row would
    silently double-report as added+removed; such rows are surfaced
    with a loud ``null_key`` status instead.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs key_cols")
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(key_cols)
        )
    for c in key_cols + list(compare_cols):
        for side, df in (("old", old), ("new", new)):
            if c not in df.columns:
                raise ValueError(f"column '{c}' not in {side} snapshot")

    o = old.select(
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for c in key_cols:
        e = F.col(f"__ok_{c}") == F.col(f"__nk_{c}")
        cond = e if cond is None else (cond & e)
    j = o.join(n, cond, "full_outer")

    diffs = [
        F.when(
            ~F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed = (
        F.concat_ws(",", F.array_sort(F.array_compact(F.array(*diffs))))
        if compare_cols
        else F.lit("")
    )
    any_key_null = None
    for c in key_cols:
        e = F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).isNull()
        any_key_null = e if any_key_null is None else (any_key_null | e)
    status = (
        F.when(any_key_null, F.lit("null_key"))
        .when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed != "", F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).alias(c)
            for c in key_cols
        ],
        status.alias("status"),
        F.when(status == "changed", changed).otherwise(F.lit("")).alias(
            "changed_cols"
        ),
    )


def scd2_merge(
    snapshots: DataFrame,
    key_cols: list,
    attr_cols: list,
    ts_col: str,
) -> DataFrame:
    """Collapse stacked snapshots (one row per key per snapshot
    timestamp) into SCD2 validity intervals: one row per (key, island
    of consecutive identical attributes) with ``valid_from`` (first
    snapshot showing these values), ``valid_to`` (the snapshot that
    replaced them; null while current) and ``is_current``.

    A key absent from a later snapshot simply keeps its last interval
    open — deletion tracking needs a tombstone row upstream (document
    the convention rather than inventing one here).  Duplicate
    (key, ts) rows raise downstream ambiguity; they are surfaced by a
    loud count column instead of being silently last-writer-wins:
    the function raises if any (key, ts) appears twice.
    """
    if not key_cols or not attr_cols:
        raise ValueError("scd2_merge needs key_cols and attr_cols")
    for c in [*key_cols, *attr_cols, ts_col]:
        if c not in snapshots.columns:
            raise ValueError(f"column '{c}' not in snapshots")

    dup = (
        snapshots.groupBy(*key_cols, ts_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"duplicate (key, {ts_col}) snapshot row, e.g. {tuple(dup[0])[:-1]}"
            " — deduplicate upstream; last-writer-wins here would be silent"
        )

    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    chg: Column = F.lit(False)
    for c in attr_cols:
        chg = chg | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    d = snapshots.withColumn(
        "__chg", F.when(F.lag(F.col(ts_col)).over(w).isNull(), F.lit(1))
        .when(chg, F.lit(1)).otherwise(F.lit(0))
    ).withColumn("__island", F.sum("__chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ))
    g = (
        d.groupBy(*key_cols, "__island", *attr_cols)
        .agg(F.min(ts_col).alias("valid_from"))
    )
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("valid_from").asc())
    return (
        g.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__island")
    )
