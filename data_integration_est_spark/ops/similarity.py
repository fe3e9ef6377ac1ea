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

from data_integration_est_spark.util import spread


def dot_arrays(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array columns, accumulated in double, in index
    order (bit-reproducible against any oracle that sums in order).

    With a known static ``dim`` the sum expands to element_at arithmetic,
    which whole-stage-codegen compiles (higher-order lambdas run
    INTERPRETED per element — ~10x slower on all-pairs scans); the
    summation order is identical, so results are bit-equal.

    Pass ``dim`` only on BIG scans (>= ~10^6 row-pairs): the expanded
    expression costs ~1-3 s of one-off codegen compilation, which
    dominates small brute-force/candidate scoring where the interpreted
    path finishes in well under a second."""
    if dim is not None:
        expr: Column = F.lit(0.0)
        for j in range(1, dim + 1):
            expr = expr + F.element_at(a, j).cast("double") * F.element_at(b, j).cast("double")
        return expr
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_array(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        s: Column = F.lit(0.0)
        for j in range(1, dim + 1):
            e = F.element_at(a, j).cast("double")
            s = s + e * e
        return F.sqrt(s)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_arrays(a, b, dim) / (norm_array(a, dim) * norm_array(b, dim))


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Excludes self-matches.  Deterministic tie-break on neighbor id."""
    # per-side norms precompute BEFORE the pair join (r17): evaluated
    # once per VECTOR row instead of once per PAIR, and the pair-level
    # expression shrinks to the dot product alone — the full inlined
    # cosine (dot + both norms), duplicated by filter pushdown, grew the
    # generated pair-stage method past janino's 64 KB limit at dim=64
    # and silently ran interpreted.  Bit-identical: the same sqrt
    # results are multiplied in the same order.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("__qn__", norm_array(F.col("qv"), dim))
    c = spread(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )).withColumn("__cn__", norm_array(F.col("cv"), dim))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot_arrays(F.col("qv"), F.col("cv"), dim)
                / (F.col("__qn__") * F.col("__cn__")),
                6,
            ),
        )
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
    dim: int | None = None,
    max_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold, id_a < id_b.

    With ``candidates`` (e.g. LSH bucket cohabitants from
    ``lsh_bucket_candidates``) only those pairs are scored — the scale
    path.  Without, all pairs are scored (small N / oracle checking).

    ``max_pairs`` is the quadratic-blowup refusal (r13; the
    ``ops/dedup.ngram_jaccard_pairs`` discipline): the sf10 probe found
    a FIXED bucket count turning the candidate join into 1.25e9 pairs
    (a >20-minute grind) — bucket geometry must grow with the corpus
    (``n_bits``), and when it doesn't, refusing in seconds with the
    knob named beats hanging.  The candidate pre-count doubles as
    materialization for the verify join (bounded registry).  ``None``
    disables."""
    from data_integration_est_spark.util import bounded_persist

    if max_pairs is not None:
        if candidates is not None:
            candidates = bounded_persist(candidates)
            n_pairs = candidates.count()
        else:
            n = df.count()
            n_pairs = n * (n - 1) // 2
        if n_pairs > max_pairs:
            raise ValueError(
                f"cosine_near_dup_pairs: {n_pairs:,} candidate pairs exceed "
                f"max_pairs={max_pairs:,} — the verify join would carry the "
                "vector arrays through a quadratic-volume join.  Grow the "
                "LSH bucket geometry with the corpus (n_bits: ~+3 bits per "
                "data decade keeps per-bucket occupancy constant, ~+7 keeps "
                "total noise-pair volume constant; exact-dup retention "
                "stays ~1 at any n_bits) or raise/disable max_pairs "
                "explicitly."
            )
    # per-side norm precompute — see brute_force_knn (r17): once per
    # vector row, not per pair; pair stage = the dot alone (bit-equal)
    a = spread(df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )).withColumn("__an__", norm_array(F.col("va"), dim))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("__bn__", norm_array(F.col("vb"), dim))
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine",
            F.round(
                dot_arrays(F.col("va"), F.col("vb"), dim)
                / (F.col("__an__") * F.col("__bn__")),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# The candidate join returned by the two functions below is LAZY, so
# the persist that lets the self-join reuse the explode cannot be
# released at return time — route it through the session-wide bounded
# registry instead of leaking one cache block per call (r12; ADVICE
# r11).  An evicted frame recomputes if re-materialized — correct,
# just slower.
def _persist_buckets(buckets: DataFrame) -> DataFrame:
    from data_integration_est_spark.util import bounded_persist

    return bounded_persist(buckets)


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
    src = spread(df.select(F.col(id_col), F.col(vec_col)))
    buckets = src.select(
        F.col(id_col).alias("vid"),
        F.posexplode(
            _all_table_buckets(vec_col, dim, n_bits, n_tables, seed)
        ).alias("table", "bucket"),
    )
    buckets = _persist_buckets(buckets)
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


def lsh_bucket_candidates_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """:func:`lsh_bucket_candidates` on the md5-derived Rademacher
    planes (:func:`hyperplanes_portable`) — identical plan shape (one
    scan, one posexplode, bucket self-join), but buckets and the
    candidate SET reproduce in any engine, so the pipeline is
    oracle-checkable end-to-end (`embedding_lsh_portable` gate row).
    The Gaussian-plane production path stays the default."""
    src = spread(df.select(F.col(id_col), F.col(vec_col)))
    buckets = src.select(
        F.col(id_col).alias("vid"),
        F.posexplode(
            _all_table_buckets(
                vec_col, dim, n_bits, n_tables, seed=0,
                planes_fn=lambda d, b, t: hyperplanes_portable(d, b, t),
            )
        ).alias("table", "bucket"),
    )
    buckets = _persist_buckets(buckets)
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


def _centroid_sims_sql(vec_name: str, centroids: list[list[float]]) -> str:
    """SQL for the per-centroid similarity array.  One ``F.expr`` parse
    instead of py4j-composing k x dim literal Columns (the same driver-time
    trap as ``_all_table_buckets`` — seconds per call at k=16, dim=64).

    Centroids are L2-normalized on the driver, so the per-row work is the
    k dot products only: argmax-by-cosine == argmax-by-dot-with-unit-
    centroid, and both callers (cluster assignment, probe selection) use
    the array solely for ORDERING.  Row-vector norms cancel entirely."""
    C = np.asarray(centroids, dtype=float)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    C = C / nrm
    # Flat element_at arithmetic, not zip_with/aggregate lambdas: higher-
    # order functions run INTERPRETED per element; the expanded sum-of-
    # products compiles into whole-stage codegen (~10x on the hot path).
    dots = [
        " + ".join(
            f"{float(cv)!r}D * CAST(element_at(`{vec_name}`, {j + 1}) AS DOUBLE)"
            for j, cv in enumerate(c)
        )
        for c in C.tolist()
    ]
    return "array(" + ", ".join(f"({d})" for d in dots) + ")"


# Above this many k x dim literal terms the expanded sum-of-products
# no longer compiles: janino's recursive local-variable-map build blows
# the compiler stack (measured: k=256, dim=64 = 16,384 terms dies; the
# r8 probe's k=40, dim=64 = 2,560 compiled fine).  Past the limit the
# centroid matrix moves into an Arrow-batched numpy matmul instead —
# the documented "built-ins can't express it" escape hatch, and the
# realistic-k scale path (FAISS-style coarse quantizers run k in the
# hundreds-to-thousands).
_CODEGEN_CENTROID_TERMS = 4096

# Below this optimizer-estimated input size the Arrow twin wins even
# when the expression WOULD compile: every kmeans/assignment pass pays
# a fresh ~1-3 s of driver analysis + compile for a new k x dim literal
# tree (new centroid literals each iteration — the codegen cache never
# hits), while pushing half a GB through the Arrow boundary costs well
# under a second at local[32].  Above it, whole-stage codegen amortizes
# its compile over the scan — the 100 TB regime keeps the JVM path.
# (r16 optimization round; the ivf/pq recall rows measured 9-25 s of
# pure per-pass compile on a 2,000-row corpus before this gate.)
_ARROW_SMALL_PLAN_BYTES = 512 * 1024 * 1024


def _use_arrow_assign(df: DataFrame, n_terms: int) -> bool:
    """Route a nearest-centroid/scoring pass to the Arrow twin when the
    literal expression would not compile (``n_terms`` past the janino
    limit) OR the input is small enough that per-pass compile dominates
    (optimizer size estimate — a driver-side plan inspection only).
    Both paths are bit-exact twins (left-to-right IEEE accumulation,
    first-max ties; pinned by tests/test_similarity.py)."""
    if n_terms > _CODEGEN_CENTROID_TERMS:
        return True
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — stats unavailable: keep codegen
        return False
    return size < _ARROW_SMALL_PLAN_BYTES


def assign_nearest_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out_c: str = "__c__",
    out_dot: str | None = None,
):
    """Arrow-batched nearest-centroid assignment (large-k scale path).

    Adds ``out_c`` (0-based argmax cluster, int) and optionally
    ``out_dot`` (the max dot product against the L2-NORMALIZED centroid
    — the same quantity as ``array_max(_centroid_sims_sql(...))``).
    BIT-EXACT twin of the expression path (r14; previously ulp-exposed
    on ties): centroids unit-normalized by the same driver numpy code
    (identical literals), the dot accumulates LEFT-TO-RIGHT per
    coordinate — the same IEEE-754 operation sequence as the codegen'd
    ``c0*x0 + c1*x1 + ...`` chain, not a BLAS pairwise matmul — and
    ties break first-max (np.argmax == the strict-``>`` fold).  Pinned
    by ``tests/test_similarity.py::test_assign_arrow_bit_identical``.
    The small-k paths still prefer the codegen expression: at real
    scale the corpus scan stays whole-stage-JVM with no Arrow hop, and
    the expression's driver compile seconds amortize over the job.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    # NOTE (r16): deliberately NO partition narrowing here even when the
    # input is small.  This pass feeds the Lloyd/k-means|| SUM
    # aggregations, and k-means is chaotically order-sensitive: changing
    # the partition count reorders the float accumulation, a boundary
    # vector flips cluster, and the drift AMPLIFIES per iteration until
    # pinned recall booleans move (observed at sf0.1 — the gate hash
    # flipped).  Per-row-consumer Arrow passes (_query_probes,
    # _encode_arrow) narrow safely; this one must preserve the input
    # partitioning bit-for-bit.
    C = np.asarray(centroids, dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Cn = C / nrm

    fields = list(df.schema.fields) + [StructField(out_c, IntegerType(), False)]
    if out_dot:
        fields.append(StructField(out_dot, DoubleType(), False))
    schema = StructType(fields)
    in_cols = df.schema.fieldNames()

    def gen(batches):
        for pdf in batches:
            pdf = pdf[in_cols]
            if len(pdf) == 0:
                pdf[out_c] = np.empty(0, np.int32)
                if out_dot:
                    pdf[out_dot] = np.empty(0, np.float64)
                yield pdf
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # left-to-right accumulation == the SQL chain's IEEE order
            S = V[:, 0][:, None] * Cn[:, 0][None, :]
            for j in range(1, Cn.shape[1]):
                S = S + V[:, j][:, None] * Cn[:, j][None, :]
            c = np.argmax(S, axis=1)
            pdf = pdf.assign(**{out_c: c.astype(np.int32)})
            if out_dot:
                pdf[out_dot] = S[np.arange(len(c)), c]
            yield pdf

    return df.mapInPandas(gen, schema)


def _with_cluster(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    out: str = "__c__",
) -> DataFrame:
    """Attach the nearest-centroid index as column ``out`` — codegen
    expression below ``_CODEGEN_CENTROID_TERMS`` literal terms, Arrow
    matmul above (the large-k IVF/coarse-quantizer regime)."""
    if _use_arrow_assign(df, len(centroids) * len(centroids[0])):
        return assign_nearest_arrow(df, centroids, vec_col, out_c=out)
    return df.withColumn(out, _nearest_centroid(vec_col, centroids))


def _nearest_centroid(vec_name: str, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid by cosine (0-based), as a Column.

    Single-reference argmax: a fold over (sim, index) structs references
    the sims array ONCE — `array_position(s, array_max(s))` would inline
    the k-dot-product expression twice (higher-order lambdas run
    interpreted, so duplicate evaluation is real cost, not codegen-CSE'd).
    Strict `>` keeps the first max — array_position's tie-break."""
    sims = _centroid_sims_sql(vec_name, centroids)
    k = len(centroids)
    return F.expr(
        f"aggregate(zip_with({sims}, sequence(0, {k - 1}), (s, i) -> struct(s AS s, i AS i)), "
        "struct(CAST(-1E300 AS DOUBLE) AS s, -1 AS i), "
        "(acc, x) -> IF(x.s > acc.s, x, acc)).i"
    )


def kmeans_parallel_init(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    oversample: int | None = None,
    rounds: int = 2,
    seed: int = 42,
) -> list[list[float]]:
    """k-means|| initialization (Bahmani et al., VLDB 2012) — the
    distributed replacement for hash-top-k seeding.

    Each round: score every row's cosine distance to the current center
    set (one codegen pass), then an independent inclusion draw with
    probability min(1, l * d_i / sum d) — deterministic via the
    hash-derived uniform, so results are partition-independent.  The
    ~1 + l*rounds oversampled candidates are weighted by how many corpus
    rows they attract and reduced to k centers with a driver-side
    weighted Lloyd (numpy, trivial at |C| <= ~50).

    Cost: 2 passes per round + 1 weighting pass, independent of N — the
    scale-safe shape; quality: candidates land proportional to residual
    distance mass, fixing hash-init's blind spots (empty/duplicate seeds
    in dense regions) that depressed IVF recall."""
    from data_integration_est_spark import rng as _rng

    l = oversample or 2 * k
    first = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h__", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h__").limit(1).collect()
    )
    centers = [[float(v) for v in first[0][vec_col]]]

    src = spread(corpus.select(F.col(id_col), F.col(vec_col)))
    # _centroid_sims_sql normalizes only the CENTROIDS (enough for argmax
    # ordering), but here the values feed the distance-weighted sampling
    # draw, so divide by the row norm too: without it a non-unit row with
    # |x|cos > 1 clamps to d=0 and can never be sampled, skewing seeding.
    dim = len(centers[0])
    sq = " + ".join(
        f"CAST(element_at(`{vec_col}`, {j + 1}) AS DOUBLE) * "
        f"CAST(element_at(`{vec_col}`, {j + 1}) AS DOUBLE)"
        for j in range(dim)
    )
    row_norm = F.greatest(F.expr(f"sqrt({sq})"), F.lit(1e-12))
    for r in range(rounds):
        if _use_arrow_assign(src, len(centers) * dim):
            d = assign_nearest_arrow(
                src, centers, vec_col, out_dot="__m__"
            ).withColumn(
                "__d__",
                F.greatest(
                    F.lit(0.0), F.lit(1.0) - F.col("__m__") / row_norm
                ),
            )
        else:
            sims = _centroid_sims_sql(vec_col, centers)
            # cosine distance to the nearest current center, clamped at 0
            d = src.withColumn(
                "__d__",
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - F.expr(f"array_max({sims})") / row_norm,
                ),
            )
        # two consumers (the total and the inclusion draw) read the
        # scored frame; persist it so the assignment pass runs once per
        # round, not twice (same values — the draw reads the cache)
        d = d.persist()
        try:
            total = d.agg(F.sum("__d__")).collect()[0][0] or 0.0
            if total <= 0:
                break  # every row coincides with a center already
            u = _rng.uniform([id_col], seed, f"kmpar_{r}")
            picked = (
                d.withColumn("__p__", F.least(F.lit(1.0), F.lit(float(l)) * F.col("__d__") / F.lit(float(total))))
                .filter(u < F.col("__p__"))
                .select(vec_col)
                .collect()
            )
        finally:
            d.unpersist()
        centers.extend([[float(v) for v in row[vec_col]] for row in picked])

    # weight candidates by attraction counts (one pass), then reduce to k
    # with a weighted Lloyd on the driver
    if _use_arrow_assign(src, len(centers) * dim):
        assign = assign_nearest_arrow(src, centers, vec_col).select("__c__")
    else:
        assign = src.select(_nearest_centroid(vec_col, centers).alias("__c__"))
    counts = {r["__c__"]: r["n"] for r in
              assign.groupBy("__c__").agg(F.count(F.lit(1)).alias("n")).collect()}
    C = np.asarray(centers, dtype=float)
    w = np.array([float(counts.get(i, 0)) for i in range(len(centers))])
    if len(centers) <= k:
        return C.tolist()
    # init the reduction from the k heaviest candidates
    order = np.argsort(-w)
    centroids = C[order[:k]].copy()
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    for _ in range(8):
        Mn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
        a = np.argmax(Cn @ Mn.T, axis=1)
        for j in range(k):
            m = a == j
            if w[m].sum() > 0:
                centroids[j] = (C[m] * w[m, None]).sum(axis=0) / w[m].sum()
    return centroids.tolist()


def kmeans_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    init: str = "kmeans||",
    init_rounds: int = 2,
    sample_frac: float | None = None,
) -> list[list[float]]:
    """Spherical k-means (cosine) via distributed Lloyd iterations.

    ``sample_frac`` trains init + Lloyd on a Bernoulli sample of the
    corpus (deterministic given ``seed``) — the standard billion-vector
    practice (FAISS trains coarse quantizers on ~256 vectors/centroid,
    not the full corpus); assignment of the FULL corpus to the returned
    centroids is unchanged.  Cuts training cost by 1/frac at a centroid
    perturbation that downstream recall probes tolerate.

    Per iteration: ONE groupBy pass assigns every vector to its nearest
    centroid (centroids broadcast as a folded literal matrix) and computes
    the per-cluster elementwise sums as ``dim`` codegen'd `element_at`
    aggregates — only the k x (dim+1) result reaches the driver.

    Deliberately NOT a posexplode + groupBy(cluster, dim): a generator in
    the same projection re-evaluates the (interpreted, higher-order)
    assignment expression once per EXPLODED element — a dim-fold blowup of
    the dominant cost.  Init: ``"kmeans||"`` (default, see
    ``kmeans_parallel_init``) or ``"hash"`` — the k rows with smallest
    xxhash64(id, seed) (deterministic but distance-blind)."""
    if sample_frac is not None:
        if not (0.0 < sample_frac <= 1.0):
            raise ValueError(f"sample_frac must be in (0, 1], got {sample_frac}")
        # hash-Bernoulli, not df.sample(): replayable on any cluster /
        # partitioning, same contract as the engine's hash splits
        corpus = corpus.filter(
            (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed ^ 0x5EED)), F.lit(1_000_003)))
            < F.lit(int(sample_frac * 1_000_003))
        )
    if init == "kmeans||":
        centroids = kmeans_parallel_init(
            corpus, vec_col=vec_col, id_col=id_col, k=k, seed=seed,
            rounds=init_rounds,
        )
    else:
        rows = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .withColumn("__h__", F.xxhash64(F.col(id_col), F.lit(seed)))
            .orderBy("__h__")
            .limit(k)
            .collect()
        )
        centroids = [[float(v) for v in r[vec_col]] for r in rows]
    dim = len(centroids[0])

    for _ in range(n_iter):
        base = spread(corpus)
        if _use_arrow_assign(base, len(centroids) * dim):
            assigned = assign_nearest_arrow(
                base.select(F.col(vec_col)), centroids, vec_col
            ).select("__c__", F.col(vec_col).alias("__v__"))
        else:
            assigned = base.select(
                _nearest_centroid(vec_col, centroids).alias("__c__"),
                F.col(vec_col).alias("__v__"),
            )
        rows = (
            assigned
            .groupBy("__c__")
            .agg(
                F.count(F.lit(1)).alias("__n__"),
                *[
                    F.sum(F.element_at("__v__", j + 1).cast("double")).alias(f"__s_{j}__")
                    for j in range(dim)
                ],
            )
            .collect()
        )
        by_c = {r["__c__"]: r for r in rows}
        new_centroids = [
            [float(by_c[c][f"__s_{j}__"]) / by_c[c]["__n__"] for j in range(dim)]
            if c in by_c and by_c[c]["__n__"]
            else centroids[c]
            for c in range(len(centroids))
        ]
        # exact convergence early-exit (r17): bit-identical centroids
        # reproduce the SAME assignment and the SAME sums next pass, so
        # every remaining iteration is a fixed point — skipping them
        # cannot change the result (float equality, not a tolerance).
        if new_centroids == centroids:
            break
        centroids = new_centroids
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
    dim: int | None = None,
    init_rounds: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate kNN: k-means-partition the corpus, probe only the
    ``n_probe`` nearest clusters per query, exact cosine re-rank inside.

    Scale shape: the corpus is scanned once to assign cluster ids (a
    partition-pruning key at 100 TB when written bucketed/partitioned by
    cluster); each query joins only its probed clusters — candidate count
    drops by ~n_clusters/n_probe versus brute force.

    PERF: pass a MATERIALIZED vector column (persisted or read straight
    from parquet).  A computed ``vec_col`` (e.g. a lazy normalization
    transform) gets INLINED by Catalyst into every one of the
    n_clusters x dim centroid product terms across every Lloyd
    iteration — measured ~10x analysis+codegen blowup (335 s -> 25 s
    after a persist) — the same higher-order-function inlining trap
    ``word_shingles``/``minhash_signatures`` document.

    Pass ``centroids=`` (e.g. from one ``kmeans_centroids`` call) to
    reuse a trained index across many query batches — training per
    call is the convenience mode, not the production one."""
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, vec_col, id_col, k=n_clusters, n_iter=n_iter, seed=seed,
            init_rounds=init_rounds,
        )
    c_assigned = _with_cluster(
        spread(corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )),
        centroids, "cv",
    )
    return _probe_and_rank(c_assigned, queries, centroids, k, id_col, vec_col,
                           n_probe, dim)


def ivf_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    seed: int = 42,
    init_rounds: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """RAW IVF candidate pairs (query_id, neighbor_id) — the pre-rerank
    candidate generator of the production ``IVF x PQ`` path (r7): each
    query meets only the members of its ``n_probe`` nearest clusters;
    no scoring happens here, so the output feeds ``pq_knn`` (ADC
    rerank), ``ngram_jaccard_pairs``-style verifies, or an exact
    rerank.  Same plan as ``ivf_knn`` minus the rank: one corpus
    assignment scan (a partition-pruning key at 100 TB when the corpus
    is written partitioned by cluster) + a cluster-key equi-join.
    ``centroids=`` reuses a trained index (see ``ivf_knn``)."""
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, vec_col, id_col, k=n_clusters, n_iter=n_iter, seed=seed,
            init_rounds=init_rounds,
        )
    c_assigned = _with_cluster(
        spread(corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )),
        centroids, "cv",
    )
    probes = _query_probes(queries, centroids, n_probe, id_col, vec_col)
    return (
        probes.join(c_assigned.select("neighbor_id", "__c__"), "__c__")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )


def _query_probes(
    queries: DataFrame, centroids: list[list[float]], n_probe: int, id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, qv, __c__) — each query exploded to its n_probe nearest
    cluster ids by centroid cosine.  Tie rule (equal centroid sims):
    HIGHER cluster id first — reverse(array_sort) on (s, c) pairs; the
    large-k Arrow path replicates it with a per-row lexsort."""
    k = len(centroids)
    if _use_arrow_assign(queries, k * len(centroids[0])):
        import pandas as pd  # noqa: F401
        from pyspark.sql.types import IntegerType, StructField, StructType

        C = np.asarray(centroids, dtype=np.float64)
        nrm = np.linalg.norm(C, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Cn = C / nrm
        from data_integration_est_spark.util import adaptive_coalesce

        # same near-empty-task argument as assign_nearest_arrow: the
        # Arrow probe pass runs on a small query frame
        src = adaptive_coalesce(queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ))
        schema = StructType(
            list(src.schema.fields)
            + [StructField("__c__", IntegerType(), False)]
        )
        np_take = min(n_probe, k)
        cols = np.arange(k)

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(__c__=np.empty(0, np.int32))
                    continue
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["qv"]]
                )
                S = V @ Cn.T
                picks = np.stack([
                    np.lexsort((-cols, -row))[:np_take] for row in S
                ])
                rep = np.repeat(np.arange(len(pdf)), np_take)
                out = pdf.iloc[rep].reset_index(drop=True)
                out["__c__"] = picks.reshape(-1).astype(np.int32)
                yield out

        return src.mapInPandas(gen, schema)
    sims = F.expr(_centroid_sims_sql("qv", centroids))
    return (
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


def _probe_and_rank(
    c_assigned: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int,
    id_col: str,
    vec_col: str,
    n_probe: int,
    dim: int | None,
) -> DataFrame:
    """Shared IVF probe: equi-join queries' probed cluster ids against the
    (neighbor_id, cv, __c__) corpus, exact cosine re-rank, partial top-k."""
    # per-side norm precompute — see brute_force_knn (r17)
    q_probes = _query_probes(
        queries, centroids, n_probe, id_col, vec_col
    ).withColumn("__qn__", norm_array(F.col("qv"), dim))
    cand = q_probes.join(
        c_assigned.withColumn("__cn__", norm_array(F.col("cv"), dim)),
        on="__c__",
    ).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            dot_arrays(F.col("qv"), F.col("cv"), dim)
            / (F.col("__qn__") * F.col("__cn__")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_build_partitioned(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    n_iter: int = 3,
    seed: int = 42,
    init_rounds: int = 2,
) -> list[list[float]]:
    """The IVF 100 TB layout: assign every corpus vector its cluster id and
    persist PARTITIONED BY cluster_id (one directory per cluster).

    A probe query then filters ``cluster_id IN (<probed>)`` and the parquet
    scan never opens the other clusters' files — partition pruning turns
    n_probe/n_clusters into a SCAN-SIZE reduction, not just a candidate-
    count reduction (``ivf_probe_partitioned``; plan evidence in SCALE.md
    and tests/test_bucketing.py).  Returns the centroid matrix the caller
    must keep for probing (tiny: k x dim floats)."""
    from data_integration_est_spark.io import write_parquet

    centroids = kmeans_centroids(
        corpus, vec_col, id_col, k=n_clusters, n_iter=n_iter, seed=seed,
        init_rounds=init_rounds,
    )
    assigned = _with_cluster(
        spread(corpus.select(F.col(id_col), F.col(vec_col))),
        centroids, vec_col, out="cluster_id",
    )
    write_parquet(assigned, path, partition_by=["cluster_id"])
    return centroids


def ivf_probe_partitioned(
    spark,
    path: str,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Probe an ``ivf_build_partitioned`` layout with static partition
    pruning: the probed cluster ids are computed from the (small) query
    side and pushed as a literal ``cluster_id IN (...)`` partition filter,
    so the corpus scan reads only ~n_probe/n_clusters of the files —
    the pruning shows up as ``PartitionFilters`` on the scan node."""
    q_probes = _query_probes(
        queries, centroids, n_probe, id_col, vec_col
    ).withColumn("__qn__", norm_array(F.col("qv"), dim))
    probed = sorted(
        r["__c__"] for r in q_probes.select("__c__").distinct().collect()
    )
    corpus = (
        spark.read.parquet(path)
        .filter(F.col("cluster_id").isin([int(c) for c in probed]))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.col("cluster_id").cast("int").alias("__c__"),
        )
        .withColumn("__cn__", norm_array(F.col("cv"), dim))
    )
    cand = q_probes.join(corpus, on="__c__").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.withColumn(
        "cosine",
        F.round(
            dot_arrays(F.col("qv"), F.col("cv"), dim)
            / (F.col("__qn__") * F.col("__cn__")),
            6,
        ),
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


def _rademacher_sign(tag: str) -> float:
    """+1/-1 from the top bit of md5's first hex nibble — the
    engine-portable plane entry (any engine computes the same md5 of
    the same tag string)."""
    import hashlib

    return 1.0 if int(hashlib.md5(tag.encode()).hexdigest()[0], 16) >= 8 \
        else -1.0


def hyperplanes_portable(dim: int, n_bits: int, table: int) -> list[list[float]]:
    """Rademacher (±1) hyperplanes derived from md5 of "hp:{t}:{i}:{d}"
    — sign-agreement LSH with ±1 planes has the same collision-
    probability law as Gaussian planes (Charikar 2002; Achlioptas 2003
    for the ±1 substitution), and the md5 derivation reproduces in ANY
    engine, so buckets/candidates replay in a SQL oracle."""
    return [
        [_rademacher_sign(f"hp:{table}:{i}:{d}") for d in range(dim)]
        for i in range(n_bits)
    ]


def _all_table_buckets(
    vec_name: str, dim: int, n_bits: int, n_tables: int, seed: int,
    planes_fn=None,
) -> Column:
    """Array of per-table bucket ids — ONE corpus scan + one posexplode
    produces every (table, bucket) row, instead of an n_tables-way union
    (which multiplies scheduled tasks by n_tables on small inputs).

    Built as a single SQL expression string: composing it from nested
    ``F.array(F.lit(...))`` Columns costs thousands of py4j round trips
    (~6 s of driver time for 36 planes x 64 dims before any data moves);
    one ``F.expr`` parse is milliseconds.  The plane matrix is a foldable
    literal, so Catalyst constant-folds it once; the per-row work is the
    n_tables * n_bits dot products and nothing else."""
    planes: list[list[float]] = []
    for t in range(n_tables):
        planes.extend(
            (planes_fn or (lambda d, b, tt: _hyperplanes(d, b, tt, seed)))(
                dim, n_bits, t
            )
        )
    plane_sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in p) + ")" for p in planes
    ) + ")"
    return F.expr(
        f"transform(sequence(0, {n_tables - 1}), t -> "
        f"aggregate(sequence(0, {n_bits - 1}), 0L, (acc, i) -> acc + "
        f"IF(aggregate(zip_with(`{vec_name}`, {plane_sql}[t * {n_bits} + i], "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, b) -> a + b) >= 0, "
        "shiftleft(1L, i), 0L)))"
    )


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
    generation, the 100 TB-safe replacement for the cross join.

    Shuffle hygiene: the bucket join and the candidate ``distinct`` carry
    ONLY (id, table, bucket) — never the embeddings (~16 B/row instead of
    ~1 KB/row for 64-d float vectors, a ~50x shuffle-volume saving at
    scale).  Vectors are re-attached after dedup: the query side by
    broadcast (queries << corpus), the corpus side by one equi-join on
    the already-deduped candidate ids."""
    def bucketize(df: DataFrame, idname: str) -> DataFrame:
        return spread(df.select(F.col(id_col), F.col(vec_col))).select(
            F.col(id_col).alias(idname),
            F.posexplode(
                _all_table_buckets(vec_col, dim, n_bits, n_tables, seed)
            ).alias("table", "bucket"),
        )

    qb = bucketize(queries, "query_id")
    cb = bucketize(corpus, "neighbor_id")
    cand = (
        qb.join(cb, on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("__qn__", norm_array(F.col("qv"), dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("__cn__", norm_array(F.col("cv"), dim))
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            F.round(
                dot_arrays(F.col("qv"), F.col("cv"), dim)
                / (F.col("__qn__") * F.col("__cn__")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_second_moment(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    with_means: bool = False,
) -> DataFrame:
    """Long-form uncentered second-moment matrix of an embedding column:
    rows (i, j, m) with ``m = mean(e_i * e_j)`` over the upper triangle
    (j >= i) — the one-pass sufficient statistic behind covariance, PCA
    whitening, and Mahalanobis near-dup.

    Physical shape: Arrow-batched ``mapInPandas`` computes each batch's
    ``X^T X`` in numpy (cast to float64 BEFORE the product so a SQL
    engine multiplying DOUBLEs reproduces every term exactly) and emits
    d(d+1)/2 partial rows; one groupBy(i, j) reduces them.  Shuffle
    volume is O(partitions x d^2), independent of row count — the same
    sufficient-statistic discipline as the Gram kernels (SCALE.md rule
    1).  ``with_means=True`` appends rows (i, -1, mean(e_i)) so a
    centered covariance needs no second pass."""
    import pandas as pd

    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    d = int(dim)

    def part(batches):
        iu0, iu1 = np.triu_indices(d)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            G = X.T @ X
            out = pd.DataFrame({
                "i": iu0.astype("int32"),
                "j": iu1.astype("int32"),
                "s": G[iu0, iu1],
                "n": np.full(len(iu0), len(X), dtype="int64"),
            })
            if with_means:
                out = pd.concat([out, pd.DataFrame({
                    "i": np.arange(d, dtype="int32"),
                    "j": np.full(d, -1, dtype="int32"),
                    "s": X.sum(axis=0),
                    "n": np.full(d, len(X), dtype="int64"),
                })], ignore_index=True)
            yield out

    partials = df.select(vec_col).mapInPandas(part, "i int, j int, s double, n long")
    return partials.groupBy("i", "j").agg(
        F.round(F.sum("s") / F.sum("n"), 6).alias("m")
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dim: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k PCA of an embedding column: returns (components [k x d],
    eigenvalues [k], mean [d]).  The distributed work is ONE
    sufficient-statistic pass (``embedding_second_moment`` with means);
    the eigendecomposition is a d x d driver ``numpy.linalg.eigh`` —
    O(d^3) on d<=a few thousand, never on row count.  Component signs
    are normalized (largest-|loading| entry positive) so results are
    partitioning-independent (SCALE.md rule 7)."""
    if dim is None:
        dim = df.select(F.size(F.col(vec_col))).first()[0]
    d = int(dim)
    rows = embedding_second_moment(df, vec_col, dim=d, with_means=True).collect()
    M = np.zeros((d, d))
    mu = np.zeros(d)
    for r in rows:
        if r["j"] == -1:
            mu[r["i"]] = r["m"]
        else:
            M[r["i"], r["j"]] = r["m"]
            M[r["j"], r["i"]] = r["m"]
    cov = M - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    # deterministic sign: the largest-|loading| coordinate is positive
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    return comps, vals[order], mu


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray | None = None,
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Project embeddings onto PCA components as new columns
    ``{out_prefix}0..{k-1}``.  The (k x d) component matrix is inlined as
    ONE parsed SQL expression of ``element_at`` arithmetic per component
    — map-only, codegen'd, no shuffle (SCALE.md round-2 expression
    rules; higher-order lambdas would run interpreted per element)."""
    k, d = components.shape
    mu = np.zeros(d) if mean is None else mean
    exprs = []
    for c in range(k):
        terms = " + ".join(
            f"(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) - ({mu[i]!r})) * ({components[c, i]!r})"
            for i in range(d)
        )
        exprs.append(F.expr(terms).alias(f"{out_prefix}{c}"))
    return df.select("*", *exprs)
