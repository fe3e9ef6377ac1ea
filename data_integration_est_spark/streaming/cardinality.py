"""Streaming per-key distinct-count monitoring — HyperLogLog registers
as ``applyInPandasWithState`` state.

The register table is a commutative monoid (per-bucket MAX), so — like
the quantile monitor's histogram (``streaming/monitor.py``) — the
drained result is a pure function of the data, independent of arrival
order and batch boundaries, and the batch twin (``ops/sketches``) is an
exact oracle for the REGISTERS.  State is O(keys · 2^p) small ints —
bounded, unlike exact distinct counting, which is the whole point of
monitoring cardinality on an unbounded stream (user-id churn, vocab
growth, join-key explosion alarms).

The hash work (md5 → bucket, rho) happens BEFORE the stateful operator
as codegen column expressions (``ops/sketches.bucket_rho_cols``) — the
Python side only folds ``np.maximum.at`` over Arrow batches; no per-row
Python, keeping the engine's no-interpreted-hot-loop rule (the r7
monitor nit, fixed r8).

Estimates are read off with the same ``read_off_estimate`` as the batch
sketch; float summation order over the ≤ 2^p registers can differ from
the batch read-off by ~1e-13 relative, so emissions round to 2 dp (the
sketch's honest resolution — its own standard error is ~1.04/sqrt(m)).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from data_integration_est_spark.ops.sketches import (
    bucket_rho_cols, read_off_estimate,
)

_OUT_SCHEMA = StructType([
    StructField("key", StringType(), True),
    StructField("hll_estimate", DoubleType(), True),
    StructField("n_registers", LongType(), False),
    StructField("reg_checksum", LongType(), False),
])

_STATE_SCHEMA = StructType(
    [StructField("regs", ArrayType(IntegerType()), True)]
)


def _fold_fn(p: int):
    m = 1 << p

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        regs = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(m, dtype=np.int64)
        )
        for pdf in pdfs:
            b = pdf["bucket"].to_numpy(dtype=np.int64)
            r = pdf["rho"].to_numpy(dtype=np.int64)
            np.maximum.at(regs, b, r)
        state.update(([int(x) for x in regs],))
        nz = regs > 0
        nb = int(nz.sum())
        s = float(np.ldexp(1.0, -regs[nz]).sum())
        est = read_off_estimate(s, nb, m)
        chk = int((np.flatnonzero(nz) * regs[nz]).sum())
        # HALF_UP on the shortest decimal repr — exactly what the batch
        # twin's F.round does (BigDecimal.valueOf == Double.toString ==
        # Python repr), not Python's banker's round(): the documented
        # stream == batch estimate parity needs one rounding rule
        est2 = float(
            Decimal(repr(est)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        )
        yield pd.DataFrame(
            {"key": [k], "hll_estimate": [est2],
             "n_registers": [nb], "reg_checksum": [chk]}
        )

    return fn


def distinct_monitor_stream(
    df: DataFrame, value_col: str, key_col: str, p: int = 12
) -> DataFrame:
    """Streaming per-key distinct-count monitor: emits (key,
    hll_estimate, n_registers, reg_checksum) every trigger in update
    mode; the latest emission per key is the current estimate.  Nulls
    are skipped (distinct semantics)."""
    bucket, rho = bucket_rho_cols(value_col, p)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("key"),
            bucket.alias("bucket"), rho.alias("rho"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _fold_fn(int(p)),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def distinct_monitor_batch(
    df: DataFrame, value_col: str, key_col: str, p: int = 12
) -> DataFrame:
    """The batch twin — identical registers via the sketch groupBy plus
    the same read-off; the streaming oracle (registers exact, estimate
    to the emitted 2 dp).  Fully lazy since round 10: the read-off is
    the ``hll_estimate_expr`` column expression, so per-key estimates
    never round-trip O(keys) rows through the driver."""
    from data_integration_est_spark.ops.sketches import (
        hll_estimate_expr, hll_registers,
    )

    m = 1 << p
    regs = hll_registers(
        df.select(F.col(key_col).cast("string").alias("key"), value_col),
        value_col, p=p, group_cols=["key"],
    )
    return (
        regs.groupBy("key")
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s__"),
            F.count(F.lit(1)).alias("__nb__"),
            F.sum(F.col("bucket") * F.col("rho")).alias("__chk__"),
        )
        .select(
            "key",
            F.round(
                hll_estimate_expr(F.col("__s__"), F.col("__nb__"), m), 2
            ).alias("hll_estimate"),
            F.col("__nb__").cast("long").alias("n_registers"),
            F.col("__chk__").cast("long").alias("reg_checksum"),
        )
    )
