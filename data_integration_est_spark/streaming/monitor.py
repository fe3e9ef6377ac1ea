"""Streaming distribution monitoring — per-key quantile tracking with
bounded, order-independent state.

Spark has no streaming percentiles: the built-in approx_percentile is
not available as a streaming aggregate, and order-dependent sketches
(P², t-digest) give nondeterministic results under micro-batch
reordering.  This module tracks per-key quantiles with a FIXED-RANGE
histogram held in ``applyInPandasWithState`` state: bin counts form a
commutative monoid, so the result after draining a source is a pure
function of the data — independent of arrival order and batch
boundaries — and the batch twin (same histogram algebra as ordinary
DataFrame ops) is an exact oracle, the ``streaming.docs`` convention.

The price of determinism is resolution: estimates are bin lower edges
(error <= (hi-lo)/bins), the right trade for MONITORING (quality-score
drift, length distributions) where the range is known a priori.  State
is O(keys * bins) longs — bounded, unlike any exact method.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

from data_integration_est_spark.util import local_df


def _out_schema(qs: tuple) -> StructType:
    return StructType(
        [StructField("key", StringType(), True),
         StructField("n", LongType(), False)]
        + [StructField(f"q{int(round(q * 100))}", DoubleType(), True)
           for q in qs]
    )


_STATE_SCHEMA = StructType([StructField("counts", ArrayType(LongType()), True)])


def _read_off(counts: list, lo: float, width: float, bins: int, qs: tuple):
    n = sum(counts)
    if n == 0:
        return 0, [None] * len(qs)
    out = []
    for q in qs:
        target = q * n  # > 0 since q in (0,1) and n >= 1
        cum = 0
        est = lo + (bins - 1) * width
        for bi in range(bins):
            cum += counts[bi]
            if cum >= target:  # first crossing is at a non-empty bin
                est = lo + bi * width
                break
        out.append(float(est))
    return n, out


def _monitor_fn(lo: float, hi: float, bins: int, qs: tuple):
    width = (hi - lo) / bins

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        counts = np.asarray(
            state.get[0] if state.exists else [0] * bins, dtype=np.int64
        )
        for pdf in pdfs:
            v = pdf["value"].to_numpy(dtype=float)
            v = v[~np.isnan(v)]
            if v.size:
                # floor-div then clamp — same bin rule as the batch twin
                bi = np.clip(
                    np.floor((v - lo) / width).astype(np.int64), 0, bins - 1
                )
                counts += np.bincount(bi, minlength=bins)
        counts = [int(c) for c in counts]
        state.update((counts,))
        n, ests = _read_off(counts, lo, width, bins, qs)
        yield pd.DataFrame(
            {"key": [k], "n": [n],
             **{f"q{int(round(q * 100))}": [e] for q, e in zip(qs, ests)}}
        )

    return fn


def quantile_monitor_stream(
    df: DataFrame,
    value_col: str,
    key_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    qs: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Streaming per-key quantile monitor: emits (key, n, q25, q50, ...)
    every trigger in update mode; the latest emission per key is the
    current estimate.  Values outside [lo, hi) clamp to the edge bins
    (monitoring semantics: out-of-range mass shows up AT the fence)."""
    if not (lo < hi) or bins < 2:
        raise ValueError("need lo < hi and bins >= 2")
    return (
        df.select(F.col(key_col).cast("string").alias("key"),
                  F.col(value_col).cast("double").alias("value"))
        .groupBy("key")
        .applyInPandasWithState(
            _monitor_fn(float(lo), float(hi), int(bins), tuple(qs)),
            outputStructType=_out_schema(tuple(qs)),
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def quantile_monitor_batch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    qs: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """The batch twin — identical histogram algebra as one groupBy over
    (key, bin) plus a driver read-off per key; the streaming oracle."""
    if not (lo < hi) or bins < 2:
        raise ValueError("need lo < hi and bins >= 2")
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    binc = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("long")
    cells = (
        df.filter(v.isNotNull())
        .select(F.col(key_col).cast("string").alias("key"), binc.alias("b"))
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_key: dict[str, list] = {}
    for r in cells:
        by_key.setdefault(r["key"], [0] * bins)[int(r["b"])] += int(r["c"])
    rows = []
    for k in sorted(by_key):
        n, ests = _read_off(by_key[k], lo, width, bins, tuple(qs))
        rows.append((k, n, *ests))
    return local_df(df.sparkSession, rows, _out_schema(tuple(qs)))
