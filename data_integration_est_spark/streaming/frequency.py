"""Streaming per-key frequency monitoring — Count-Min counters as
``applyInPandasWithState`` state.

The counter table is a commutative monoid (per-counter SUM), so — like
the quantile monitor's histogram and the cardinality monitor's HLL
registers — the drained state is a pure function of the data,
independent of arrival order and batch boundaries, and the batch twin
(``ops/cms.cms_build`` + the same summary aggregation) is an EXACT
oracle for every emitted field.  State is O(keys · d·w) counts —
bounded, unlike exact per-item counting on an unbounded stream: this is
how you watch token/url/id frequency skew develop per source without a
vocabulary-sized state store.

The hash work (md5 double-hash → d counter indices) happens BEFORE the
stateful operator as codegen column expressions (``ops/cms.cms_row_idx``
+ posexplode) — the Python side only folds ``np.add.at`` over Arrow
batches; no per-row Python (the engine's no-interpreted-hot-loop rule).

The monitor counts OCCURRENCES (weight 1 per row): counters stay
integer-valued in doubles (exact far past 2^50), so stream == batch is
bit-exact on every field, not approximately.  Per-item estimates come
from the batch twin's sketch via ``ops/cms.cms_query`` — pass
``group_cols=["key"]`` for per-key frequencies (the default probes the
UNION: total frequency across keys) — or from the drained counters;
the monitor's emission is the sketch summary —
mass, occupancy, a whole-table checksum, and the row-0 max counter (an
upper bound on the heaviest item's count: alarm when one key's stream
degenerates onto few values)."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

from data_integration_est_spark.ops.cms import cms_row_idx

_OUT_SCHEMA = StructType([
    StructField("key", StringType(), True),
    StructField("mass", LongType(), False),
    StructField("n_nonzero", LongType(), False),
    StructField("sketch_checksum", LongType(), False),
    StructField("max_counter", LongType(), False),
])

_STATE_SCHEMA = StructType(
    [StructField("cnt", ArrayType(LongType()), True)]
)


def _fold_fn(depth: int, width: int):
    dw = depth * width

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        cnt = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(dw, dtype=np.int64)
        )
        for pdf in pdfs:
            j = pdf["j"].to_numpy(dtype=np.int64)
            idx = pdf["idx"].to_numpy(dtype=np.int64)
            np.add.at(cnt, j * width + idx, 1)
        state.update(([int(x) for x in cnt],))
        nz = np.flatnonzero(cnt)
        yield pd.DataFrame({
            "key": [k],
            # every row sums the full mass; read it off row 0
            "mass": [int(cnt[:width].sum())],
            "n_nonzero": [int(nz.size)],
            "sketch_checksum": [int((cnt[nz] * nz).sum())],
            "max_counter": [int(cnt[:width].max()) if width else 0],
        })

    return fn


def frequency_monitor_stream(
    df: DataFrame,
    value_col: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming per-key CMS monitor: emits (key, mass, n_nonzero,
    sketch_checksum, max_counter) every trigger in update mode; the
    latest emission per key reflects the whole stream so far.  Nulls
    are skipped (count semantics)."""
    idx = cms_row_idx(F.col(value_col), depth, width)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.posexplode(idx).alias("j", "idx"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _fold_fn(int(depth), int(width)),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def frequency_monitor_batch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """The batch twin — identical counters via ``cms_build`` grouped by
    the key, plus the same summary read-off as ONE aggregation (fully
    lazy, no driver round-trip).  Exact on every field: the counters
    are order-independent integer sums."""
    from data_integration_est_spark.ops.cms import cms_build

    sk = cms_build(
        df.select(F.col(key_col).cast("string").alias("key"), value_col),
        value_col, depth=depth, width=width, group_cols=["key"],
    )
    flat = F.col("j") * width + F.col("idx")
    return (
        sk.groupBy("key")
        .agg(
            (F.sum(F.when(F.col("j") == 0, F.col("cnt")).otherwise(0.0)))
            .cast("long").alias("mass"),
            F.count(F.lit(1)).cast("long").alias("n_nonzero"),
            F.sum(F.col("cnt") * flat).cast("long").alias("sketch_checksum"),
            F.max(F.when(F.col("j") == 0, F.col("cnt")))
            .cast("long").alias("max_counter"),
        )
    )
