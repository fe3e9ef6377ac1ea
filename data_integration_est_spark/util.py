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


def schema_meta(df, column: str, keys: tuple) -> dict | None:
    """Read the metadata keys stamped on ``column`` by a sketch builder
    (None for a table of unknown provenance — hand-built sketch tables
    stay accepted everywhere)."""
    try:
        md = df.schema[column].metadata
    except (KeyError, TypeError):
        return None
    if md and all(k in md for k in keys):
        return {k: md[k] for k in keys}
    return None


def check_same_sketch_params(inputs, column: str, keys: tuple, op: str) -> None:
    """Raise at PLAN time when sketch tables built with different
    parameters are merged — folding incompatible layouts (different
    Bloom m/k, CMS d/w, HLL p, histogram bins) produces silent garbage,
    so builders stamp their parameters as schema metadata and every
    merge validates here (r11; the ``qhist_merge`` guard generalized)."""
    metas = [(schema_meta(s, column, keys), i) for i, s in enumerate(inputs)]
    known = [(m, i) for m, i in metas if m is not None]
    if len({tuple(sorted(m.items())) for m, _ in known}) > 1:
        detail = ", ".join(f"input[{i}]={m}" for m, i in known)
        raise ValueError(f"{op}: mismatched sketch parameters — {detail}")
