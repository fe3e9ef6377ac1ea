"""CSV / Parquet source-sink round-trips (S9-S10)."""

from pyspark.sql import functions as F

from data_integration_est_spark import io as dio


def _summary(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
    )


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = _summary(spark, sf_dir)
    path = str(tmp_path / "summary_csv")
    dio.write_csv(df, path, single_file=True)
    back = dio.read_csv(spark, path)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted((r["c_mktsegment"], r["n"], r["avg_bal"]) for r in back.collect())
    assert [(s, int(n), float(v)) for s, n, v in a] == [
        (s, int(n), float(v)) for s, n, v in b
    ]


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    df = _summary(spark, sf_dir)
    path = str(tmp_path / "summary_pq")
    dio.write_parquet(df, path, partition_by=["c_mktsegment"])
    back = dio.read_parquet(spark, path)
    assert sorted((r["c_mktsegment"], r["n"]) for r in back.collect()) == sorted(
        (r["c_mktsegment"], r["n"]) for r in df.collect()
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """JSONL round-trip preserves values; the on-disk format is one JSON
    object per line (the training-data interchange contract)."""
    import json as _json
    from pathlib import Path

    df = _summary(spark, sf_dir)
    path = str(tmp_path / "summary_jsonl")
    dio.write_jsonl(df, path, single_file=True)
    back = dio.read_jsonl(
        spark, path, schema="c_mktsegment string, n long, avg_bal double"
    )
    a = sorted(tuple(r) for r in df.collect())
    b = sorted((r["c_mktsegment"], r["n"], r["avg_bal"]) for r in back.collect())
    assert [(s, int(n), float(v)) for s, n, v in a] == [
        (s, int(n), float(v)) for s, n, v in b
    ]
    # each data line is standalone JSON
    part = next(p for p in Path(path).iterdir() if p.name.startswith("part-"))
    lines = [l for l in part.read_text().splitlines() if l.strip()]
    assert len(lines) == df.count()
    assert all(isinstance(_json.loads(l), dict) for l in lines)


def test_training_shards_roundtrip_preserves_order(spark, tmp_path):
    """r7: the emission sink writes shards whose read-back order equals
    the deterministic shuffle on any cluster layout."""
    from data_integration_est_spark.io import (
        read_training_shard, write_training_shards,
    )
    from data_integration_est_spark.ops.mixing import shuffle_shards

    df = spark.range(500).withColumnRenamed("id", "doc_id").withColumn(
        "payload", F.col("doc_id") * 2
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, n_shards=4, seed=9)
    want = shuffle_shards(df, 4, seed=9)
    for k in range(4):
        got = [
            (r["doc_id"], r["payload"])
            for r in read_training_shard(spark, path, k).collect()
        ]
        exp = [
            (r["doc_id"], r["payload"])
            for r in want.filter(F.col("shard") == k)
            .orderBy("shard_pos").collect()
        ]
        assert got == exp and len(got) > 0, k
