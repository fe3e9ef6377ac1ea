"""Bucketed-table co-located joins: the join between two tables bucketed
on the key must plan WITHOUT a shuffle (no Exchange above either scan)."""

from pyspark.sql import functions as F

from data_integration_est_spark import io as dio


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _drop(spark, *tables):
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    _drop(spark, "b_cust", "b_orders")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    dio.write_bucketed(cust, "b_cust", ["c_custkey"], n_buckets=8)
    dio.write_bucketed(orders, "b_orders", ["c_custkey"], n_buckets=8)

    # the sf0.001 tables fit the broadcast threshold; disable it so the
    # plan shows the large-large strategy bucketing is designed for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bj = dio.read_table(spark, "b_cust").join(
            dio.read_table(spark, "b_orders"), "c_custkey"
        )
        plan = _explain(bj)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan

        # same join on plain parquet DOES shuffle — the baseline
        pj = cust.join(orders, "c_custkey")
        assert "Exchange" in _explain(pj)

        # and the results agree
        assert bj.count() == pj.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_elides_shuffle(spark, sf_dir):
    agg = (
        dio.read_table(spark, "b_orders")
        .groupBy("c_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    assert "Exchange" not in _explain(agg)
    assert agg.count() > 0


def test_ivf_partitioned_probe_prunes_scan(spark, sf_dir, tmp_path):
    """The IVF 100 TB layout (VERDICT r02 item 6): corpus written
    partitionBy(cluster_id); a probe pushes a literal cluster_id IN (...)
    PARTITION filter, so the scan reads only the probed clusters'
    directories — and returns exactly what the in-memory IVF returns."""
    from data_integration_est_spark.ops import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(8)
    path = str(tmp_path / "ivf_corpus")

    cents = sim.ivf_build_partitioned(
        emb, path, n_clusters=8, n_iter=2, seed=42
    )
    got = sim.ivf_probe_partitioned(
        spark, path, cents, queries, k=5, n_probe=2
    )

    plan = _explain(got)
    assert "PartitionFilters" in plan
    # the IN-list partition filter reaches the scan node (pruning), rather
    # than being applied post-scan as a data filter
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*cluster_id[^\]]*IN \(", plan)
    assert m, "cluster_id IN (...) not in PartitionFilters:\n" + plan

    # fewer partition directories scanned than exist on disk
    import os
    n_dirs = len([d for d in os.listdir(path) if d.startswith("cluster_id=")])
    probed = {r["__c__"] for r in sim._query_probes(
        queries, cents, 2, "vec_id", "embedding"
    ).select("__c__").distinct().collect()}
    assert 0 < len(probed) < n_dirs

    # identical results to the all-in-memory IVF with the same seed/params
    mem = sim.ivf_knn(emb, queries, k=5, n_clusters=8, n_probe=2, n_iter=2, seed=42)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, mem.collect()))
