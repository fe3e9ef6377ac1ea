"""Product quantization (PQ) for embedding search — Jegou et al. 2011.

The compression half of a billion-scale ANN index (FAISS's ``IVFxx,PQyy``
family): each d-dim vector splits into ``m`` contiguous subvectors; each
subvector is quantized to its nearest centroid among a per-subspace
codebook of ``k`` centroids, so the vector stores as ``m`` small codes
(m bytes at k<=256) instead of 4d bytes — a 100 TB embedding corpus
becomes sub-TB, and queries score against codes without touching the
raw vectors (asymmetric distance computation, ADC).

Spark-first shapes:

- ``pq_train``: per-subspace k-means rides the existing distributed
  Lloyd machinery (``ops.similarity.kmeans_centroids``'s aggregation
  pattern) with an L2 assignment — one groupBy pass per (subspace,
  iteration), only k x (d/m + 1) scalars to the driver each.
- ``pq_encode``: pure column expressions — the m nearest-centroid
  argmins compile into whole-stage codegen (folded literal centroid
  matrices; no Python, no shuffle).
- ``pq_score``/``pq_knn`` (ADC): each QUERY precomputes m lookup arrays
  (its subvector's dot product with every centroid — m x k doubles as
  column expressions); a corpus code row scores as the sum of m
  ``element_at`` probes — never touching raw corpus vectors.  The scorer
  is candidate-agnostic: feed it an IVF/LSH-restricted candidate join at
  scale, or the full cross join for small query sets / recall checks.

Codes are deterministic given (corpus, seed): k-means init is the
engine's hash-based ``kmeans||``; ties in assignment break toward the
lower centroid index on both train and encode.

Codebook-size envelope (r7 scale probe, SCALE.md): at the FAISS-
realistic m=16/k=256 the driver state is dim * k * 8 bytes (131 kB at
d=64) and 10x data costs 1.37x wall; the dominant small-corpus cost is
Catalyst compiling the 256-way argmin CASE — fixed and data-
independent.  Beyond k ~ 1000, swap the codegen argmin for a broadcast
numpy ``mapInPandas`` scorer (the expression tree, not the math, is
the limit).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.util import spread


def _l2_score_sql(
    vec_name: str, centroids: list[list[float]], offset: int = 0
) -> str:
    """Array of per-centroid L2 ORDER scores: x.c - ||c||^2/2 (argmax of
    this == argmin of squared L2; the row's own norm cancels).  Flat
    codegen arithmetic — same rationale as similarity._centroid_sims_sql.
    ``offset`` indexes a subvector INSIDE a full vector column, so
    callers need no intermediate slice column (identical element values,
    one less projection for Catalyst to re-analyze)."""
    C = np.asarray(centroids, dtype=float)
    offs = 0.5 * (C * C).sum(axis=1)
    dots = [
        " + ".join(
            f"{float(cv)!r}D * CAST(element_at(`{vec_name}`, "
            f"{offset + j + 1}) AS DOUBLE)"
            for j, cv in enumerate(c)
        )
        + f" - {float(o)!r}D"
        for c, o in zip(C.tolist(), offs.tolist())
    ]
    return "array(" + ", ".join(f"({d})" for d in dots) + ")"


def _argmax_expr(arr_sql: str, k: int) -> Column:
    """0-based argmax over a k-element SQL array (first max wins)."""
    return F.expr(
        f"aggregate(zip_with({arr_sql}, sequence(0, {k - 1}), "
        "(s, i) -> struct(s AS s, i AS i)), "
        "struct(CAST(-1E300 AS DOUBLE) AS s, -1 AS i), "
        "(acc, x) -> IF(x.s > acc.s, x, acc)).i"
    )


# Above this many total centroids (m*k) the assignment/encode argmins
# dispatch to the Arrow numpy twin below instead of codegen'd column
# expressions: the SQL expression tree costs Catalyst seconds of
# analysis/compilation PER ACTION at m=16/k=16 (256 argmin branches x
# d_sub element_at terms — the r7 scale probe's documented envelope),
# while the math itself is microseconds.  The expr path stays for
# small codebooks where whole-stage codegen wins.
_ARROW_MIN_CELLS = 64


def _l2_argmax_np(X: np.ndarray, centroids: list[list[float]]) -> np.ndarray:
    """BIT-EXACT numpy twin of ``_l2_score_sql`` + ``_argmax_expr``:
    scores accumulate left-to-right per coordinate (the same IEEE-754
    operation sequence as the SQL ``c0*x0 + c1*x1 + ...`` chain, so a
    float tie or near-tie resolves identically), the -||c||²/2 offset
    uses the same numpy-computed literal, and ties break to the LOWER
    centroid index (``np.argmax`` first-max == the strict ``>``
    accumulator).  Engine invariant: expr path and Arrow path produce
    IDENTICAL codes on identical input — pinned by
    ``tests/test_pq.py::test_arrow_and_expr_paths_bit_identical``."""
    C = np.asarray(centroids, dtype=np.float64)
    offs = 0.5 * (C * C).sum(axis=1)
    X = X.astype(np.float64, copy=False)
    scores = C[:, 0][None, :] * X[:, 0][:, None]
    for j in range(1, C.shape[1]):
        scores = scores + C[:, j][None, :] * X[:, j][:, None]
    scores = scores - offs[None, :]
    return np.argmax(scores, axis=1)


def _subvec(vec_col: str, s: int, d_sub: int) -> Column:
    return F.slice(F.col(vec_col), s * d_sub + 1, d_sub)


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    n_iter: int = 5,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks (list of m k x d/m centroid
    lists).  Dimension must divide evenly by ``m``.

    ALL m subspace k-means run together: the corpus explodes once to
    (subspace, subvector) rows (persisted — m small rows per vector),
    the hash-seeded init is ONE windowed pass over all subspaces, and
    every Lloyd iteration is ONE groupBy(subspace, cluster) pass whose
    assignment expression is a subspace-dispatched CASE over the m
    argmin expressions.  Per-subspace sequential training (the naive
    form) costs m x (n_iter + 1) job launches — 64 jobs and ~50 s of
    pure overhead at m=16 on a small corpus; batched it is n_iter + 2
    jobs regardless of m."""
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("pq_train: empty corpus")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    from pyspark.sql import Window

    sub = spread(corpus.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[_subvec(vec_col, s, d_sub) for s in range(m)])
        ).alias("__s__", "__sv__"),
    )).persist()
    try:
        # hash-seeded init (distance-blind but deterministic): the k
        # smallest per-subspace hashes — identical selection and order to
        # the sequential orderBy().limit(k) form
        hcol = F.xxhash64(F.col(id_col), F.col("__s__") + F.lit(seed))
        win = Window.partitionBy("__s__").orderBy(hcol.asc())
        init_rows = (
            sub.withColumn("__rn__", F.row_number().over(win))
            .filter(F.col("__rn__") <= k)
            .select("__s__", "__rn__", "__sv__")
            .collect()
        )
        books: list[list[list[float]]] = [[] for _ in range(m)]
        for r in sorted(init_rows, key=lambda r: (r["__s__"], r["__rn__"])):
            books[r["__s__"]].append([float(v) for v in r["__sv__"]])

        for _ in range(n_iter):
            if m * max(len(b) for b in books) >= _ARROW_MIN_CELLS:
                # Arrow twin of the dispatched CASE below — identical
                # codes (see _l2_argmax_np), micro-cost math instead of
                # a 256-branch expression tree per iteration
                assigned = _assign_subspace_arrow(sub, books)
            else:
                # subspace-dispatched assignment:
                # CASE WHEN s=0 THEN argmin_0 ...
                assign = None
                for s in range(m):
                    arr = _l2_score_sql("__sv__", books[s])
                    am = _argmax_expr(arr, len(books[s]))
                    assign = (
                        F.when(F.col("__s__") == s, am) if assign is None
                        else assign.when(F.col("__s__") == s, am)
                    )
                assigned = sub.select(
                    "__s__", assign.alias("__c__"), "__sv__"
                )
            agg_rows = (
                assigned
                .groupBy("__s__", "__c__")
                .agg(
                    F.count(F.lit(1)).alias("__n__"),
                    *[
                        F.sum(F.element_at("__sv__", j + 1).cast("double"))
                        .alias(f"__s_{j}__")
                        for j in range(d_sub)
                    ],
                )
                .collect()
            )
            by_sc = {(r["__s__"], r["__c__"]): r for r in agg_rows}
            new_books = [
                [
                    [float(by_sc[(s, c)][f"__s_{j}__"]) / by_sc[(s, c)]["__n__"]
                     for j in range(d_sub)]
                    if (s, c) in by_sc and by_sc[(s, c)]["__n__"]
                    else books[s][c]
                    for c in range(len(books[s]))
                ]
                for s in range(m)
            ]
            # exact convergence early-exit (r17, same argument as
            # kmeans_centroids): bit-identical codebooks reproduce the
            # same assignment and sums — remaining passes are fixed points
            if new_books == books:
                break
            books = new_books
        return books
    finally:
        sub.unpersist()


def _assign_subspace_arrow(sub: DataFrame, books) -> DataFrame:
    """Arrow-batched Lloyd assignment over the exploded (subspace,
    subvector) rows: (__s__, __c__, __sv__) with __c__ from the
    bit-exact ``_l2_argmax_np``.  A map (no repartition), so the row
    order feeding the downstream sum aggregation is unchanged — the
    trained codebooks are bit-identical to the expression path's."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    src = sub.select("__s__", "__sv__")
    schema = StructType([
        src.schema["__s__"],
        StructField("__c__", IntegerType(), False),
        src.schema["__sv__"],
    ])
    bks = [list(b) for b in books]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            svs = np.stack([
                np.asarray(v, dtype=np.float64) for v in b["__sv__"]
            ])
            ss = b["__s__"].to_numpy()
            codes = np.empty(len(b), dtype=np.int32)
            for s in np.unique(ss):
                mask = ss == s
                codes[mask] = _l2_argmax_np(svs[mask], bks[int(s)])
            yield pd.DataFrame({
                "__s__": b["__s__"], "__c__": codes, "__sv__": b["__sv__"],
            })

    return src.mapInPandas(run, schema)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Add the m-element code array (0-based centroid indices) — pure
    codegen'd column expressions (no shuffle) for small codebooks;
    above ``_ARROW_MIN_CELLS`` total centroids, the bit-exact Arrow
    numpy twin (the m*k expression tree costs Catalyst seconds per
    action; the math is microseconds — r14)."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    work = spread(df)
    # r14 (ADVICE): select('*', ...) — unlike the old withColumn — would
    # DUPLICATE a pre-existing out_col and poison every downstream
    # by-name reference with ambiguity; replace it like withColumn did
    if out_col in work.columns:
        work = work.drop(out_col)
    if m * max(len(b) for b in codebooks) >= _ARROW_MIN_CELLS:
        return _encode_arrow(work, codebooks, vec_col, out_col, d_sub)
    # ONE projection: each subspace's argmax indexes the full vector at
    # its offset directly — r13: the previous 16 chained withColumn
    # slices made Catalyst re-analyze a thousand-node tree per column
    # (driver seconds per action, scale-invariant overhead)
    code_cols = [
        _argmax_expr(
            _l2_score_sql(vec_col, codebooks[s], offset=s * d_sub),
            len(codebooks[s]),
        )
        for s in range(m)
    ]
    return work.select("*", F.array(*code_cols).alias(out_col))


def _encode_arrow(
    work: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str,
    out_col: str,
    d_sub: int,
) -> DataFrame:
    """Arrow twin of the expression encode: all input columns pass
    through one ``mapInPandas`` batch; codes from ``_l2_argmax_np``
    (bit-identical to the expr path).  Null vectors encode to NULL."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, IntegerType, StructField, StructType,
    )

    from data_integration_est_spark.util import adaptive_coalesce

    # per-row encode: partition-count invariant, so narrow small inputs
    # to a data-proportional partition count instead of paying one
    # Python-worker task per near-empty partition (no-op at real scale)
    work = adaptive_coalesce(work)

    m = len(codebooks)
    out_schema = StructType(
        list(work.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType()), True)]
    )
    bks = [list(b) for b in codebooks]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            if not len(b):
                out[out_col] = []
                yield out
                continue
            vals = list(b[vec_col])
            ok = [i for i, v in enumerate(vals) if v is not None]
            codes: list = [None] * len(vals)
            if ok:
                X = np.stack([
                    np.asarray(vals[i], dtype=np.float64) for i in ok
                ])
                per_s = [
                    _l2_argmax_np(
                        X[:, s * d_sub:(s + 1) * d_sub], bks[s]
                    )
                    for s in range(m)
                ]
                stacked = np.stack(per_s, axis=1)
                for row_i, i in enumerate(ok):
                    codes[i] = [int(c) for c in stacked[row_i]]
            out[out_col] = codes
            yield out

    return work.mapInPandas(run, out_schema)


def _luts_arrow(
    work: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec_col: str,
    d_sub: int,
) -> DataFrame:
    """Arrow twin of the LUT projection in ``pq_score_expr``: one
    ``mapInPandas`` batch computes every ``__pqlut{s}__`` array.
    BIT-EXACT per entry — the dot accumulates LEFT-TO-RIGHT per
    coordinate, the same IEEE-754 operation sequence as the SQL
    ``c0*x0 + c1*x1 + ...`` chain (the ``_l2_argmax_np`` argument);
    a NULL query vector yields all-NULL entries exactly like
    ``element_at`` on NULL.  Exists because the expression form at
    m=16/k=16/d_sub=4 generates a ~17k-line processNext() that blows
    janino's 64 KB method limit: the compile FAILS on every action
    (an ERROR + ~0.5-1 s of wasted driver compile per evaluation) and
    the stage silently runs interpreted (r17; the r16 LUT persist
    stopped downstream INLINING but not the build stage itself)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    m = len(codebooks)
    Cs = [np.asarray(b, dtype=np.float64) for b in codebooks]
    out_schema = StructType(
        list(work.schema.fields)
        + [StructField(f"__pqlut{s}__", ArrayType(DoubleType()), True)
           for s in range(m)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            n = len(b)
            if not n:
                for s in range(m):
                    out[f"__pqlut{s}__"] = []
                yield out
                continue
            vals = list(b[query_vec_col])
            ok = [i for i, v in enumerate(vals) if v is not None]
            X = (
                np.stack([np.asarray(vals[i], dtype=np.float64) for i in ok])
                if ok else np.empty((0, m * d_sub))
            )
            for s in range(m):
                C = Cs[s]
                col: list = [None] * n
                if ok:
                    # left-to-right accumulation == the SQL chain's order
                    S = X[:, s * d_sub][:, None] * C[:, 0][None, :]
                    for j in range(1, d_sub):
                        S = S + X[:, s * d_sub + j][:, None] * C[:, j][None, :]
                    for row_i, i in enumerate(ok):
                        col[i] = [float(v) for v in S[row_i]]
                out[f"__pqlut{s}__"] = col
            yield out

    return work.mapInPandas(run, out_schema)


def pq_score_expr(
    query_vec_col: str,
    code_col: str,
    codebooks: list[list[list[float]]],
    work: DataFrame,
) -> tuple[DataFrame, Column]:
    """ADC score: augment ``work`` (must carry the query vector column)
    with per-subspace lookup arrays, return (df, score column) where
    score approximates dot(query, corpus_vec) from codes alone.  The
    LUT construction routes to the bit-exact Arrow twin above
    ``_ARROW_MIN_CELLS`` total centroids (same gate as
    ``pq_encode``/``pq_train``); the probe/score column is always the
    JVM ``element_at`` chain (m probes — tiny, codegen-friendly)."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    # r14 (ADVICE): same duplicate-column hazard as pq_encode if a frame
    # already carrying __pqlut*__ (a second pq_score_expr pass) comes in
    stale = [c for c in work.columns
             if c.startswith("__pqlut") and c.endswith("__")]
    if stale:
        work = work.drop(*stale)
    if m * max(len(b) for b in codebooks) >= _ARROW_MIN_CELLS:
        work = _luts_arrow(work, codebooks, query_vec_col, d_sub)
    else:
        lut_cols = []
        for s in range(m):
            # dot-only array (no -||c||^2/2 offset): ADC approximates the
            # dot; element_at indexes the full query vector at the subspace
            # offset (identical values to the old slice column, ONE
            # projection total)
            C = np.asarray(codebooks[s], dtype=float)
            dots = [
                " + ".join(
                    f"{float(cv)!r}D * CAST(element_at(`{query_vec_col}`, "
                    f"{s * d_sub + j + 1}) AS DOUBLE)"
                    for j, cv in enumerate(c)
                )
                for c in C.tolist()
            ]
            lut_cols.append(
                F.expr("array(" + ", ".join(f"({d})" for d in dots) + ")")
                .alias(f"__pqlut{s}__")
            )
        work = work.select("*", *lut_cols)
    score: Column = F.lit(0.0)
    for s in range(m):
        score = score + F.element_at(
            F.col(f"__pqlut{s}__"), F.element_at(F.col(code_col), s + 1) + 1
        )
    return work, score


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k by ADC score.  With ``candidates`` ((query_id, neighbor_id)
    pairs from IVF/LSH) only those pairs score — the scale path; without,
    every query scores the whole encoded corpus (small query sets /
    recall checks).  Returns (query_id, neighbor_id, adc_score, rank)."""
    from pyspark.sql import Window

    enc = pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        codebooks, vec_col=vec_col,
    ).select("neighbor_id", "pq_code")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    # LUTs materialize on the QUERY side BEFORE the join — m x k doubles
    # per query row, not per (query, corpus) pair
    q, score = pq_score_expr("__qv__", "pq_code", codebooks, q)
    q = q.drop("__qv__")
    # materialize the LUT projection: left lazy, Catalyst inlines the
    # m*k*d_sub unrolled dot-product tree into every downstream stage,
    # whose generated method then exceeds janino's 64 KB limit and the
    # whole pipeline silently falls back to interpreted evaluation
    # (measured: 4.1 s -> 1.5 s for the composed IVFxPQ scoring stage).
    # The persisted frame is |Q| rows of m*k doubles — query-side small.
    from data_integration_est_spark.util import bounded_persist

    q = bounded_persist(q)
    if candidates is not None:
        pairs = candidates.join(q, "query_id").join(enc, "neighbor_id")
    else:
        pairs = q.crossJoin(enc)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("adc_score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_score", "rank")
    )
