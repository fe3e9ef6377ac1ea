"""Similarity search over embedding columns (array<float>).

- ``brute_force_knn``: exact cosine top-k — the correctness baseline.
  Query side is broadcast (queries << corpus); the corpus is scanned once;
  per-query top-k via a window over the query key.  O(|Q| * N * d) work,
  fully distributed, no driver collection.
- ``lsh_knn``: random-hyperplane LSH (sign sketches) — the scale path.
  Hyperplanes are deterministic literals (seeded numpy on the driver,
  broadcast as array literals), bucket join replaces the cross join,
  exact cosine re-ranks within buckets.  Recall < 1, tunable via
  (n_bits, n_tables).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_arrays(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated in double, in index
    order (bit-reproducible against any oracle that sums in order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_array(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_arrays(a, b) / (norm_array(a) * norm_array(b))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Excludes self-matches.  Deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold, id_a < id_b.

    With ``candidates`` (e.g. LSH bucket cohabitants from
    ``lsh_bucket_candidates``) only those pairs are scored — the scale
    path.  Without, all pairs are scored (small N / oracle checking)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def lsh_bucket_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs cohabiting any random-hyperplane LSH
    bucket — the sublinear candidate generator for cosine near-dup dedup.
    Same table/bucket scheme as ``lsh_knn`` but self-joined."""
    parts = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, t, seed)
        parts.append(
            df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
            .withColumn("table", F.lit(t))
            .withColumn("bucket", _bucket_expr(F.col("v"), planes))
            .select("vid", "table", "bucket")
        )
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    from pyspark import StorageLevel

    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.table") == F.col("r.table"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.vid") < F.col("r.vid"),
            ],
        )
        .select(F.col("l.vid").alias("id_a"), F.col("r.vid").alias("id_b"))
        .distinct()
    )


def _centroid_lits(centroids: list[list[float]]) -> list[Column]:
    return [F.array(*[F.lit(float(v)) for v in c]) for c in centroids]


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid by cosine (0-based), as a Column.
    Distances are an array expression; argmax via array_position."""
    sims = F.array(*[cosine_expr(vec, c) for c in _centroid_lits(centroids)])
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    n_iter: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Spherical k-means (cosine) via distributed Lloyd iterations.

    Per iteration: ONE pass assigns every vector to its nearest centroid
    (centroids broadcast as literals), then posexplode + groupBy(cluster,
    dim) computes elementwise means — only the k x dim centroid matrix is
    collected.  Init: the k rows with smallest xxhash64(id, seed)
    (deterministic, partition-independent)."""
    init = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h__", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h__")
        .limit(k)
        .collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in init]

    for _ in range(n_iter):
        assigned = corpus.select(
            _nearest_centroid(F.col(vec_col), centroids).alias("__c__"),
            F.posexplode(F.col(vec_col)).alias("__pos__", "__val__"),
        )
        rows = (
            assigned.groupBy("__c__", "__pos__")
            .agg(F.avg("__val__").alias("__m__"))
            .collect()
        )
        new = {c: dict() for c in range(len(centroids))}
        for r in rows:
            new[r["__c__"]][r["__pos__"]] = r["__m__"]
        centroids = [
            [new[c][p] for p in sorted(new[c])] if new.get(c) else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate kNN: k-means-partition the corpus, probe only the
    ``n_probe`` nearest clusters per query, exact cosine re-rank inside.

    Scale shape: the corpus is scanned once to assign cluster ids (a
    partition-pruning key at 100 TB when written bucketed/partitioned by
    cluster); each query joins only its probed clusters — candidate count
    drops by ~n_clusters/n_probe versus brute force."""
    centroids = kmeans_centroids(
        corpus, vec_col, id_col, k=n_clusters, n_iter=n_iter, seed=seed
    )
    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("__c__", _nearest_centroid(F.col("cv"), centroids))

    sims = F.array(*[cosine_expr(F.col("qv"), c) for c in _centroid_lits(centroids)])
    q_probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("__sims__", sims)
        .select(
            "query_id", "qv",
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(F.arrays_zip(
                        F.col("__sims__").alias("s"),
                        F.sequence(F.lit(0), F.lit(len(centroids) - 1)).alias("c"),
                    ))),
                    1, n_probe,
                )
            ).alias("__p__"),
        )
        .select("query_id", "qv", F.col("__p__.c").cast("int").alias("__c__"))
    )
    cand = q_probes.join(c_assigned, on="__c__").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, table: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed + 7919 * table)
    return rng.standard_normal((n_bits, dim)).tolist()


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-sketch bucket id: one bit per hyperplane."""
    bucket: Column = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot_arrays(vec, lit_plane) >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each vector lands in ``n_tables`` buckets (one per table); candidates
    are bucket-cohabitants in ANY table; exact cosine re-ranks.  The
    bucket equi-join shuffles on (table, bucket) — sublinear candidate
    generation, the 100 TB-safe replacement for the cross join."""
    def bucketize(df: DataFrame, idname: str) -> DataFrame:
        parts = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_bits, t, seed)
            parts.append(
                df.select(
                    F.col(id_col).alias(idname),
                    F.col(vec_col).alias(f"{idname}_v"),
                ).withColumn("table", F.lit(t)).withColumn(
                    "bucket", _bucket_expr(F.col(f"{idname}_v"), planes)
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    qb = bucketize(queries, "query_id")
    cb = bucketize(corpus, "neighbor_id")
    cand = (
        qb.join(cb, on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", F.round(cosine_expr(F.col("query_id_v"), F.col("neighbor_id_v")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
