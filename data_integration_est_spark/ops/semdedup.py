"""SemDeDup — semantic deduplication via embedding clusters (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication").

The scale trick is the paper's: k-means the embeddings first, then look
for near-duplicate pairs ONLY within a cluster — pair cost drops from
O(N²) to sum of per-cluster squares, and clusters are sized by k.  The
keep/drop rule is the paper's deterministic dominance order: rank the
cluster's members (by similarity to the cluster centroid, ties by id);
a member is a semantic duplicate iff some HIGHER-ranked member is within
``threshold`` cosine.  No connected components needed — the rule is a
single anti-join predicate, and the survivor set is replayable by any
SQL engine given the same centroids (which the gate oracle recomputes
from the same deterministic init by unrolling Lloyd iterations — the
BPE/IRLS oracle convention).

Physical shape: centroid assignment is one broadcast-literal codegen
pass (``ops/similarity._nearest_centroid``); the rank + pair scan is
ONE ``applyInPandas`` over the cluster key — per bounded group the
pairwise cosine matrix is a single numpy Gram (Arrow batch in, no
per-pair Python), and the dominance rule is a triangular ``any``.
Never a global cross join; one shuffle total.  At 100 TB the cluster
count k is chosen so N/k rows fit an executor's memory (the paper uses
k ~ 10k-100k for web corpora); the per-cluster quadratic term is the
algorithm's documented cost, bounded by clustering.  (A DataFrame
self-join expressing the same scan puts the dim-term dot product in
the join condition, where whole-stage codegen exceeds the JVM's 64 KB
method limit and silently falls back to interpreted eval — measured
10x slower; the numpy Gram is the honest fast path.)

Engine-normative ordering: rank = row_number over (cosine(vec,
centroid) DESC, id ASC) — "closest to the centroid survives", the
paper's ``keep_hard=False`` low-variance choice, made deterministic by
the id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.ops.similarity import (
    _centroid_sims_sql,
    kmeans_centroids,
    norm_array,
)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Add ``cluster`` (0-based nearest-centroid-by-cosine, first max on
    ties) and ``centroid_sim`` (cosine to that centroid) columns.  One
    codegen pass; the k x dim centroid matrix rides the plan as a
    folded literal (same mechanics as IVF assignment).  Above
    ``_CODEGEN_CENTROID_TERMS`` literal terms (realistic coarse-
    quantizer k — the r10 probe's k=256 x dim=64 overflowed janino's
    compiler stack) assignment switches to the Arrow matmul path."""
    from data_integration_est_spark.ops.similarity import (
        _use_arrow_assign, assign_nearest_arrow,
    )

    k = len(centroids)
    if _use_arrow_assign(df, k * len(centroids[0])):
        out = assign_nearest_arrow(df, centroids, vec_col, out_dot="__m__")
        return (
            out.withColumn("cluster", F.col("__c__").cast("int"))
            .withColumn(
                "centroid_sim", F.col("__m__") / norm_array(F.col(vec_col))
            )
            .drop("__c__", "__m__")
        )
    sims = F.expr(_centroid_sims_sql(vec_col, centroids))
    out = df.withColumn("__sims__", sims)
    cluster = F.expr(
        f"aggregate(zip_with(__sims__, sequence(0, {k - 1}), "
        "(s, i) -> struct(s AS s, i AS i)), "
        "struct(CAST(-1E300 AS DOUBLE) AS s, -1 AS i), "
        "(acc, x) -> IF(x.s > acc.s, x, acc)).i"
    )
    # centroids in _centroid_sims_sql are L2-normalized, so the chosen
    # sim is dot(e, c_unit) = array_max(sims); cosine = that / ||e||
    csim = F.expr("array_max(__sims__)") / norm_array(F.col(vec_col))
    return (
        out.withColumn("cluster", cluster.cast("int"))
        .withColumn("centroid_sim", csim)
        .drop("__sims__")
    )


def semdedup_flags(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    k: int = 16,
    n_iter: int = 5,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    init: str = "kmeans||",
    max_cluster_rows: int | None = 100_000,
) -> DataFrame:
    """Per-row SemDeDup verdicts: (id, cluster, c_rank, centroid_sim,
    is_semdup).  ``centroids`` skips training (pass a precomputed or
    deterministic set — the gate oracle path uses ``init="first_k"``
    via ``deterministic_centroids``); otherwise spherical k-means runs
    here (``ops/similarity.kmeans_centroids``).

    ``max_cluster_rows`` is the quadratic-blowup refusal (r13; the
    sf10 probe wedged on 50k-row clusters): the dominance scan is
    O(rows^2) WITHIN a cluster, and the paper's design constraint is
    that cluster size N/k stays bounded — k must GROW with the corpus.
    The guard pre-counts rows (one cheap scalar pass, the ``max_pairs``
    discipline) and refuses loudly when the MEAN cluster size exceeds
    the cap, telling the caller to raise ``k``; it is an average-size
    heuristic, not a per-cluster bound (a skewed assignment can still
    exceed it).  ``None`` disables."""
    if centroids is None:
        centroids = kmeans_centroids(
            df, vec_col=vec_col, id_col=id_col, k=k, n_iter=n_iter,
            seed=seed, init=init,
        )
    if max_cluster_rows is not None:
        n_rows = df.count()
        mean_sz = n_rows / max(len(centroids), 1)
        if mean_sz > max_cluster_rows:
            raise ValueError(
                f"semdedup_flags: {n_rows} rows over k={len(centroids)} "
                f"clusters averages {mean_sz:,.0f} rows/cluster > "
                f"max_cluster_rows={max_cluster_rows:,} — the dominance "
                "scan is quadratic within a cluster, so grow k with the "
                "corpus (the SemDeDup paper's design constraint) or "
                "raise/disable max_cluster_rows explicitly"
            )
    a = assign_clusters(df, centroids, vec_col=vec_col, id_col=id_col)
    # Per-cluster dominance scan as ONE applyInPandas over the cluster
    # key: each bounded group (N/k rows — the paper's design constraint)
    # becomes a single vectorized numpy Gram G = Vn Vn', and the
    # dominance rule is a triangular any() over G.  A DataFrame
    # self-join alternative puts the 64-term dot in the join condition,
    # where whole-stage codegen blows the 64 KB method limit and falls
    # back to interpreted eval (measured 10x slower at sf0.1) — this is
    # exactly the "built-ins can't express it efficiently" case for an
    # Arrow-batched kernel.  One shuffle total (the cluster groupBy).
    import numpy as np
    import pandas as pd

    id_field = df.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, cluster int, "
        "centroid_sim double, c_rank int, is_semdup boolean"
    )
    thr = float(threshold)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["centroid_sim", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["__vec__"]]
        )
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0] = 1.0
        Vn = V / nrm[:, None]
        n = len(pdf)
        # dup_i iff any j with rank_j < rank_i (strictly above in the
        # sort) has round(cos(i, j), 6) >= threshold.  TILED (r13): the
        # full n x n Gram is 20 GB at a 50k-row cluster (the sf10 probe
        # wedged three executors on exactly that allocation); compute
        # G in row x column tiles and reduce each to a boolean
        # any-over-prior-rows — memory O(tile), compute unchanged, and
        # each dot product is the same full-width contraction, so the
        # rounded values (and the SQL-oracle hash) are identical.
        dup = np.zeros(n, dtype=bool)
        RB, CB = 1024, 8192
        for s in range(0, n, RB):
            e = min(s + RB, n)
            blk = Vn[s:e]
            hit = np.zeros(e - s, dtype=bool)
            for cs in range(0, e, CB):
                ce = min(cs + CB, e)
                g = np.round(blk @ Vn[cs:ce].T, 6) >= thr
                # columns are global j in [cs, ce); row t is global
                # i = s + t; count only j < i
                if ce <= s:
                    hit |= g.any(axis=1)
                else:
                    j = np.arange(cs, ce)[None, :]
                    i = (s + np.arange(e - s))[:, None]
                    hit |= (g & (j < i)).any(axis=1)
            dup[s:e] = hit
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "centroid_sim": pdf["centroid_sim"],
                "c_rank": np.arange(1, n + 1, dtype=np.int32),
                "is_semdup": dup,
            }
        )

    flags = (
        a.select(
            id_col, "cluster", "centroid_sim",
            F.col(vec_col).alias("__vec__"),
        )
        .groupBy("cluster")
        .applyInPandas(_scan, schema=out_schema)
    )
    return flags


def semdedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    **kw,
) -> DataFrame:
    """Survivor rows only (the curated corpus) — original columns
    preserved via a semi-join on the survivor ids."""
    flags = semdedup_flags(
        df, vec_col=vec_col, id_col=id_col, threshold=threshold, **kw
    )
    keep = flags.filter(~F.col("is_semdup")).select(id_col)
    return df.join(keep, id_col, "semi")


def deterministic_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    n_iter: int = 2,
) -> list[list[float]]:
    """SQL-portable k-means: init = the embeddings of the k LOWEST ids
    (no hashing — replayable verbatim in any engine), then ``n_iter``
    exact Lloyd iterations (cosine assignment, elementwise-mean update,
    empty clusters keep their centroid).  Exists so the correctness
    gate can replay the ENTIRE SemDeDup pipeline — init, Lloyd,
    assignment, dominance dedup — in pure SQL; production paths use
    ``kmeans_centroids`` (k-means|| init) instead."""
    rows = (
        df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in rows]
    dim = len(centroids[0])
    for _ in range(n_iter):
        kk = len(centroids)
        cl = F.expr(
            f"aggregate(zip_with({_centroid_sims_sql(vec_col, centroids)}, "
            f"sequence(0, {kk - 1}), (s, i) -> struct(s AS s, i AS i)), "
            "struct(CAST(-1E300 AS DOUBLE) AS s, -1 AS i), "
            "(acc, x) -> IF(x.s > acc.s, x, acc)).i"
        )
        agg = (
            df.select(cl.alias("__c__"), F.col(vec_col).alias("__v__"))
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
        by_c = {r["__c__"]: r for r in agg}
        centroids = [
            [float(by_c[c][f"__s_{j}__"]) / by_c[c]["__n__"] for j in range(dim)]
            if c in by_c and by_c[c]["__n__"]
            else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids
