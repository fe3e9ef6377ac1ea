"""Small utilities (SURVEY.md §2.8 O4).

The reference wraps noisy estimator calls in ``suppressWarnings`` /
``quiet()`` sinks and ``tryCatch`` rethrows (``nb[12]:35``, ``PC.R:41-45,
221-230``).  Python/Spark analogues: a log-level context manager and an
error-context re-raiser.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def quiet_logs(spark: SparkSession, level: str = "ERROR"):
    """Temporarily raise the Spark log level (``quiet()``, ``PC.R:41-45``)."""
    sc = spark.sparkContext
    prev = sc._jvm.org.apache.log4j.LogManager.getRootLogger().getLevel()
    sc.setLogLevel(level)
    try:
        yield
    finally:
        sc._jvm.org.apache.log4j.LogManager.getRootLogger().setLevel(prev)


def spread(df, min_parts: int | None = None):
    """Adaptive fan-out repartition for expansion-heavy operators (shingle
    explodes, all-pairs scoring): when the input plan has FEWER partitions
    than the cluster's parallelism — e.g. one small parquet file — the
    downstream explode/join would run on a single core no matter how many
    executors exist, because Spark can't split a partition mid-stage.

    At real scale (inputs with >= cores partitions) this is a NO-OP — no
    shuffle is added; the check is a driver-side plan inspection only.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


@contextmanager
def error_context(what: str):
    """Re-raise any failure with added context — the ``tryCatch(...,
    error = stop(paste(...)))`` pattern (``PC.R:221-230``)."""
    try:
        yield
    except Exception as e:  # noqa: BLE001
        # Don't reconstruct type(e)(...): many exception classes (Py4J, Spark
        # internals) reject a single-string constructor, which would mask the
        # original error with a TypeError.  Annotate and re-raise instead.
        e.add_note(what)
        raise
