"""Sources / sinks (SURVEY.md §2.1 S9-S10).

The reference's only persistence is CSV round-trips of Monte Carlo result
tables (``nb[23]:159``, ``nb[24]:1``).  The engine default is Parquet
(columnar, predicate-pushdown-able); CSV is kept for reference parity and
interchange.  All writers are directory-based (one file per partition) —
the distributed layout; ``coalesce(1)`` only for tiny summary tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink with header — ``write.csv(row.names=FALSE)`` parity
    (``nb[23]:159``).  ``single_file`` coalesces tiny summary tables."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """CSV source — ``read.csv`` parity (``nb[24]:1``).  Prefer an explicit
    schema; inference scans the data twice."""
    reader = spark.read.option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """Engine-default sink.  ``partition_by`` prunes downstream scans."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                single_file: bool = False) -> None:
    """JSON-Lines sink — the training-data interchange format (one JSON
    object per line; Spark's json writer IS jsonl).  Directory-based like
    every writer here; ``single_file`` only for tiny tables."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | str | None = None) -> DataFrame:
    """JSON-Lines source.  ALWAYS pass a schema in production: inference
    scans all data once, and at 100 TB that doubles the read.  Malformed
    lines surface in ``_corrupt_record`` under the default PERMISSIVE
    mode rather than failing the job."""
    reader = spark.read
    if schema is not None:
        return reader.schema(schema).json(path)
    return reader.json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED (and bucket-sorted) managed table.

    Bucketing is the co-located-join primitive at scale: two tables
    bucketed the same way on the join key sort-merge-join with NO shuffle
    on either side (verified at the plan level in tests).  For the A/B
    integration workload, bucket both sample tables by ``id`` once and
    every estimator run afterwards skips the join exchange."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    mode: str = "overwrite",
) -> None:
    """The training-data EMISSION sink (r7): deterministic global
    shuffle (``ops.mixing.shuffle_shards``) + a parquet layout
    partitioned by shard, rows carrying their in-shard position — a
    training loader reads ``shard=K/`` and sorts by ``shard_pos`` to
    replay the exact pseudo-random order on any cluster, any rerun.
    The shard-key shuffle IS the write repartition: one exchange
    total."""
    from data_integration_est_spark.ops.mixing import shuffle_shards

    sh = shuffle_shards(df, n_shards, id_col=id_col, seed=seed)
    (
        sh.repartition("shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shard(
    spark: SparkSession, path: str, shard: int
) -> DataFrame:
    """Read one emitted shard in its deterministic order (partition
    pruning on the shard directory; the loader-side sort is a no-op
    re-sort of an already-ordered file in the common case)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .orderBy("shard_pos")
    )
