"""Plan-shape regression tests for the r7 operators: the scale claims
("one shuffle", "map-only stream side") pinned against the optimized /
executed plans, so a refactor that silently adds an exchange fails CI,
not a 100 TB run."""

from pyspark.sql import functions as F


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _exchanges(df):
    # shuffle exchanges only — broadcast exchanges are the cheap kind
    return _executed(df).count("Exchange hashpartitioning") + _executed(
        df
    ).count("Exchange rangepartitioning")


def test_keep_top_fraction_is_one_shuffle(spark):
    from data_integration_est_spark.ops.mixing import keep_top_fraction

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
        (F.col("id") % 7).cast("double").alias("score"),
    )
    out = keep_top_fraction(df, "score", 0.3, key_cols="source")
    assert _exchanges(out) == 1


def test_shuffle_shards_is_one_shuffle(spark):
    from data_integration_est_spark.ops.mixing import shuffle_shards

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, 8, seed=1)
    assert _exchanges(out) == 1


def test_contamination_flags_stream_side_is_map_only(spark):
    """The doc side of the map-only decontam must carry ZERO shuffle
    exchanges — the only aggregation in the plan is the 1-row benchmark
    gram-set collect (whose exchange is a single-row partial)."""
    from data_integration_est_spark.ops.decontam import contamination_flags

    docs = spark.createDataFrame(
        [(i, f"text number {i} alpha beta gamma delta") for i in range(50)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    out = contamination_flags(corpus, bench, n=3, exact=True)
    plan = _executed(out)
    # benchmark agg side: exactly one single-partition exchange; none on
    # the corpus side (map-only claim)
    assert _exchanges(out) <= 1
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_span_dedup_join_strategy_has_equi_keys(spark):
    """No cartesian/nested-loop joins anywhere in the span-dedup plan —
    the token-span range join must keep its doc_id equi component."""
    from data_integration_est_spark.ops.dedup import duplicated_span_dedup

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j " * 3) for i in range(30)],
        "doc_id long, text string",
    )
    plan = _executed(duplicated_span_dedup(docs, min_len=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_brr_single_pass_cell_aggregation(spark):
    """brr_mean's only distributed work is ONE (stratum, psu) groupBy —
    verified by it completing with a 2-cell plan and returning the
    replicate count without extra jobs (the replicates are driver
    arithmetic; nothing to explain() on the output, which is a local
    createDataFrame)."""
    from data_integration_est_spark.kernels.replicate import brr_mean

    df = spark.createDataFrame(
        [(i % 3, (i // 3) % 2, float(i)) for i in range(60)],
        "h long, p long, y double",
    )
    out = brr_mean(df, "y", "h", "p").collect()
    assert out[0]["n_replicates"] == 4 and out[0]["n_strata"] == 3
