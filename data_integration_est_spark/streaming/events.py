"""Structured Streaming surface over the events table (SURVEY.md §7.1 M6).

The reference has no streaming operators; this is the engine extension the
testdata's ``events`` table exists for.  Design rules:

- every transformation is written against a plain DataFrame so the SAME
  function serves batch (parquet scan) and streaming (``readStream``)
  plans — the batch run doubles as the streaming oracle in tests;
- event-time semantics with watermarks bound state for late data;
- the custom stateful operator (gap-based sessionization) uses
  ``applyInPandasWithState`` — Arrow-batched, per-key state, timeout-based
  session emission — the pattern for operators window aggs can't express.

Scale posture: streaming aggregations shuffle on the groupBy key exactly
like batch; state size is O(open windows/sessions per key), bounded by the
watermark.  File sources at 100 TB use ``maxFilesPerTrigger`` to bound
micro-batch size.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType(), True),
    StructField("ts", TimestampType(), True),
    StructField("user_id", LongType(), True),
    StructField("event_type", StringType(), True),
    StructField("value", DoubleType(), True),
    StructField("props", StringType(), True),
])


def _prepare_reader_conf(spark: SparkSession) -> None:
    # nanosAsLong lets the reader accept TIMESTAMP(NANOS) files (older
    # testdata vintage) — it does NOT affect micros files.  Session tz is
    # pinned to UTC so epoch-based ts math matches DuckDB's naive read of
    # the same parquet regardless of the host session's timezone.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def adapt_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to TIMESTAMP whatever the parquet
    vintage delivered:

    - ``LongType`` (epoch nanos via ``nanosAsLong``): rebuild a micros
      timestamp via integer ``div`` — ``/`` would go through double,
      whose ulp at epoch-nanos magnitude is ~256 ns and can shift a
      microsecond boundary.  ``div`` truncation matches DuckDB's ns→us
      conversion for the post-1970 testdata.
    - ``TIMESTAMP_NTZ`` (plain ``timestamp[us]`` parquet): cast to
      TIMESTAMP — with the session tz pinned UTC this is value-identical
      to what DuckDB reads, and downstream ``unix_micros``/watermark code
      needs the zoned type.
    - ``TIMESTAMP``: pass through.

    The testdata's events schema drifted between rounds (nanos → micros);
    this is the single place that absorbs it for batch AND streaming."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampType):
        return df
    # TIMESTAMP_NTZ (or DATE-ish drift): cast via the SQL engine.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of event parquet under ``path``.  The required
    explicit schema is probed from the parquet footer (a metadata-only
    batch read), so the stream adapts to the same ts-dtype drift as the
    batch reader instead of forcing a stale schema onto the files.  When
    the directory is empty at stream start (source populated after the
    query starts — a normal streaming deployment), the probe can't infer
    anything, so fall back to ``EVENT_SCHEMA`` (micros vintage): the
    stream still starts, and ``adapt_event_ts`` is a no-op passthrough
    for that schema."""
    _prepare_reader_conf(spark)
    try:
        probed = spark.read.parquet(path).schema
    except Exception:  # AnalysisException: unable to infer schema (empty dir)
        probed = EVENT_SCHEMA
    reader = spark.readStream.schema(probed)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return adapt_event_ts(reader.parquet(path))


def read_event_batch(spark: SparkSession, path: str) -> DataFrame:
    """The batch twin of ``read_event_stream`` (same schema and ts)."""
    _prepare_reader_conf(spark)
    return adapt_event_ts(spark.read.parquet(path))


def hourly_counts(
    events: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window per-type counts/sums.  Works identically on batch
    and streaming inputs; on streams the watermark bounds the agg state
    and admits ``append`` output."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
    timeout_sec: float | None = None,
) -> DataFrame:
    """Drain a (bounded) stream into an in-memory table with one
    available-now trigger; returns the result as a batch DataFrame.
    ``timeout_sec`` guards queries that schedule extra batches (e.g.
    processing-time timeouts) and would otherwise never terminate."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if timeout_sec is None:
        q.awaitTermination()
    else:
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name)


def enriched_hourly_counts(
    events: DataFrame,
    user_dim: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static join + windowed aggregation: enrich each event with a
    (broadcastable) static user dimension, then count per (window, user
    segment).  The static side is re-read per micro-batch by Spark; at
    scale keep it broadcast-sized or pre-bucketed.  Batch/stream shared."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    joined = src.join(F.broadcast(user_dim), "user_id", "left")
    return (
        joined.groupBy(
            F.window("ts", window).alias("win"),
            F.coalesce(F.col("segment"), F.lit("unknown")).alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "segment", "n", "sum_value")
    )


def interval_join(
    purchases: DataFrame,
    clicks: DataFrame,
    max_lag_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    each purchase pairs with the same user's clicks from the preceding
    ``max_lag_minutes``.

    On streaming inputs both sides are watermarked and the time-range
    condition lets Spark expire join state (the canonical watermarked
    stream-stream join shape — state is O(events inside the lag window
    per key), not unbounded).  On batch inputs the same function is the
    plan Catalyst picks for the theta-join — the batch twin doubles as
    the streaming oracle in tests, and DuckDB's BETWEEN join oracles the
    batch twin at the gate."""
    p = purchases.select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"),
        "user_id", F.col("value").alias("p_value"),
    )
    c = clicks.select(
        F.col("ts").alias("c_ts"), F.col("user_id").alias("c_uid"),
        F.col("value").alias("c_value"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_uid"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES"))
    )
    return p.join(c, cond, "inner").select(
        "p_id", "p_ts", "user_id", "p_value", "c_ts", "c_value"
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via the BUILT-IN ``session_window`` aggregation —
    the preferred path when per-session state is just an aggregate (the
    stateful operator below exists for session logic the built-in can't
    express).  Batch/stream shared; note the built-in defines session_end
    as last-event + gap, so ``session_start``/``n_events`` are the
    comparable outputs."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), True),
    StructField("session_start", TimestampType(), True),
    StructField("session_end", TimestampType(), True),
    StructField("n_events", LongType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), True),
    StructField("last_us", LongType(), True),
    StructField("n", LongType(), True),
])


def _session_fn(gap_us: int, timeout_ms: int | None):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user session accumulator: emits a session row whenever a
        gap > gap_us closes one; the open session stays in state (flushed
        by processing-time timeout when one is configured)."""
        (user_id,) = key
        if timeout_ms is not None and state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                })
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
        ts_list.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = 0, 0, 0

        out = []
        for t in ts_list:
            if n == 0:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        state.update((int(start_us), int(last_us), int(n)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame({
                "user_id": [r[0] for r in out],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in out],
                "n_events": [r[3] for r in out],
            })

    return fn


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, idle_timeout_sec: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState``.  Closed sessions stream out; the open
    session per user lives in state.

    ``idle_timeout_sec`` flushes idle open sessions via processing-time
    timeouts — the production-stream mode.  Leave None for bounded inputs:
    a processing-time timeout makes the query schedule timeout-only
    micro-batches forever, so an availableNow drain would never
    terminate."""
    timeout_ms = None if idle_timeout_sec is None else idle_timeout_sec * 1000
    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds * 1_000_000, timeout_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )


def dedup_events(
    events: DataFrame, id_col: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Exact-key event dedup, batch/stream shared — the at-least-once
    ingestion companion (replayed files/offsets re-emit the same
    event_id).  Streaming uses ``dropDuplicatesWithinWatermark`` so the
    dedup state is BOUNDED by the watermark delay (plain
    ``dropDuplicates`` on a stream keeps every key forever — unbounded
    state, the canonical streaming OOM); duplicates arriving inside the
    watermark window are suppressed, which is exactly the replay window
    file/Kafka sources need.  Batch twin is a plain dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            [id_col]
        )
    return events.dropDuplicates([id_col])
