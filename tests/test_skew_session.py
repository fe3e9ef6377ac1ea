"""Salted-join equivalence + built-in session_window vs the window-function
sessionization oracle."""

import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_integration_est_spark.ops.skew import salted_join
from data_integration_est_spark.streaming import events as se


def test_salted_join_matches_plain(spark):
    # one hot key (90% of rows) + a long tail
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("double").alias("dim")
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    salted = salted_join(big, small, "k", n_salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    )
    assert sorted(tuple(r) for r in plain.collect()) == sorted(
        tuple(r) for r in salted.collect()
    )


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(100).select(F.col("id").alias("k"))
    small = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = salted_join(big, small, "k", n_salt=4, how="left")
    assert out.count() == 100
    assert out.filter(F.col("v").isNull()).count() == 90


def test_salted_join_rejects_full(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full_outer")


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_sw")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    return str(d)


def test_session_window_matches_window_function_oracle(spark, events_dir):
    ev = se.read_event_batch(spark, events_dir)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in se.session_counts(ev).collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts")
    oracle_df = (
        ev.withColumn(
            "new_s",
            F.when(
                (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
                > 1800 * 1_000_000, 1,
            ).otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
        )
        .withColumn("sid", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
    )
    oracle = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in oracle_df.collect()
    }
    assert got == oracle
    assert len(got) > 0


def test_session_window_streaming_matches_batch(spark, events_dir):
    batch = se.session_counts(se.read_event_batch(spark, events_dir))
    stream = se.run_to_memory(
        se.session_counts(se.read_event_stream(spark, events_dir)),
        "session_counts_t", output_mode="complete",
    )
    assert sorted(tuple(r) for r in batch.collect()) == sorted(
        tuple(r) for r in stream.collect()
    )
