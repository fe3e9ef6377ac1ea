"""Regression tests for the schema-adaptive events reader (VERDICT r3 #1).

Round 3's headline failure: the events reader assumed ts was
TIMESTAMP(NANOS)-as-long forever; when the testdata drifted to
timestamp[us] every events query crashed, and — worse (ADVICE.md) — the
streaming module silently produced 1970-epoch timestamps behind green
stream-vs-batch tests, because both twins shared the same wrong reader.

These tests therefore check reader output against an INDEPENDENT truth
source (pyarrow's own read of the file), not against another Spark code
path, and they exercise every vintage the reader claims to adapt:
micros-typed, nanos-typed, and nanos-as-long.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import LongType, TimestampType

from data_integration_est_spark.streaming.events import (
    adapt_event_ts, read_event_batch, read_event_stream, run_to_memory,
)

# wall-clock instants (UTC) with sub-millisecond parts so unit mix-ups
# can't cancel out
_TS_US = [
    1704067200_000001,  # 2024-01-01 00:00:00.000001
    1704070800_123456,  # 2024-01-01 01:00:00.123456
    1704074400_999999,  # 2024-01-01 02:00:00.999999
]


def _write_events(path, ts_arr):
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array([10, 10, 11], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    })
    pq.write_table(tbl, str(path))


def _truth_utc(path):
    """Independent oracle: pyarrow's read of the same file, normalized to
    naive-UTC datetimes."""
    col = pq.read_table(str(path)).column("ts").cast(pa.timestamp("us"))
    return sorted(col.to_pylist())


def _spark_utc(df):
    # session tz is pinned UTC by the reader; collected values are naive
    rows = df.select("ts").collect()
    return sorted(r["ts"] for r in rows)


@pytest.fixture(
    params=["micros", "nanos"],
    ids=["timestamp_us", "timestamp_ns"],
)
def events_file(request, tmp_path):
    if request.param == "micros":
        arr = pa.array(_TS_US, pa.timestamp("us"))
    else:
        arr = pa.array([t * 1000 for t in _TS_US], pa.timestamp("ns"))
    p = tmp_path / "events.parquet"
    _write_events(p, arr)
    return p


def test_batch_reader_matches_pyarrow_truth(spark, events_file):
    df = read_event_batch(spark, str(events_file))
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert _spark_utc(df) == _truth_utc(events_file)


def test_stream_reader_matches_pyarrow_truth(spark, events_file):
    sdf = read_event_stream(spark, str(events_file.parent))
    out = run_to_memory(sdf.select("event_id", "ts"), "t_evreader", "append")
    assert _spark_utc(out) == _truth_utc(events_file)


def test_adapt_long_nanos_column(spark):
    """Direct unit check of the LongType branch (nanosAsLong vintage)."""
    df = spark.createDataFrame(
        [(t * 1000 + 999,) for t in _TS_US], "ts long"  # +999ns: must floor
    )
    assert isinstance(df.schema["ts"].dataType, LongType)
    out = adapt_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    got = sorted(r["ts"] for r in out.collect())
    want = sorted(
        datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=t)
        for t in _TS_US
    )
    assert got == want


def test_stream_starts_on_empty_directory(spark, tmp_path):
    """Streaming deployment reality: the watched dir is often empty when
    the query starts and only fills afterwards.  The schema probe can't
    infer anything from zero files, so the reader must fall back to
    EVENT_SCHEMA instead of raising — and still read micros-vintage files
    that land later."""
    src = tmp_path / "stream_src"
    src.mkdir()
    sdf = read_event_stream(spark, str(src))  # must not raise on empty dir
    assert isinstance(sdf.schema["ts"].dataType, TimestampType)
    # files arrive after the stream was constructed
    p = src / "events.parquet"
    _write_events(p, pa.array(_TS_US, pa.timestamp("us")))
    out = run_to_memory(sdf.select("event_id", "ts"), "t_evempty", "append")
    assert _spark_utc(out) == _truth_utc(p)


def test_timestamps_are_not_epoch_1970(spark, events_file):
    """The r3 silent-wrongness signature: micros misread as nanos lands in
    1970.  Assert the adapted values are in the data's real era."""
    df = read_event_batch(spark, str(events_file))
    lo = min(_spark_utc(df))
    assert lo.year >= 2024, f"reader collapsed timestamps to {lo}"
