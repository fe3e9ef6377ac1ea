"""Scale-posture proof for the delete-a-group jackknife (VERDICT r3 #7).

The wrong way to compute G delete-one-group replicates is to materialize
G copies of the data (explode/union) and aggregate each — an n_groups×
blow-up that dies at 100 TB.  ``kernels/replicate.jackknife_mean`` instead
builds per-group sufficient statistics in ONE aggregation pass and forms
every replicate estimate as arithmetic over the resulting G-row table.

These tests pin that plan shape: exactly one scan of the input, no
row-multiplying operator anywhere, and an operator profile that does not
change with input size (so cost is one agg pass regardless of N).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from data_integration_est_spark.kernels.replicate import jackknife_mean


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _jk(spark, n):
    src = spark.range(n).select(
        F.col("id"), (F.col("id") % 13).cast("double").alias("y")
    )
    return jackknife_mean(src, "y", "id", n_groups=20)


def _op_counts(plan: str) -> dict[str, int]:
    # formatted explain prints each node once as a numbered detail header
    # "(n) OpName ..." — count those, not raw word occurrences (node names
    # also appear in the tree sketch and codegen annotations)
    ops = ["Range", "Exchange", "Window", "HashAggregate", "Union",
           "CartesianProduct", "Generate", "BroadcastNestedLoopJoin"]
    headers = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.MULTILINE)
    return {op: sum(1 for h in headers if h == op) for op in ops}


def test_jackknife_single_pass_no_replication(spark):
    counts = _op_counts(_plan(_jk(spark, 100_000)))
    # one scan of the source — replicates are NOT re-scans
    assert counts["Range"] == 1, counts
    # no G× data blow-up of any flavor
    assert counts["Union"] == 0, counts
    assert counts["CartesianProduct"] == 0, counts
    assert counts["Generate"] == 0, counts
    assert counts["BroadcastNestedLoopJoin"] == 0, counts
    # shuffle budget: group-sum exchange + the single-partition exchange
    # feeding the G-row window (G=20 rows — documented as safe)
    assert counts["Exchange"] <= 3, counts


def test_jackknife_plan_shape_independent_of_input_size(spark):
    small = _op_counts(_plan(_jk(spark, 1_000)))
    large = _op_counts(_plan(_jk(spark, 1_000_000)))
    assert small == large, (small, large)


def test_jackknife_replicates_bounded_by_groups(spark):
    """The only intermediate wider than one row is the G-row group table:
    with G=20 over any N, distinct __g__ values cap at 20."""
    src = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("y")
    )
    groups = src.select(F.pmod("id", F.lit(20)).alias("g")).distinct().count()
    assert groups == 20
    row = jackknife_mean(src, "y", "id", n_groups=20).collect()[0]
    assert row["n_groups"] == 20 and row["se_jk"] is not None
