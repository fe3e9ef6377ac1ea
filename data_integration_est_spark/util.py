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
