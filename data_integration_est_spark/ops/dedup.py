"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- exact dedup is a hash-groupBy (one shuffle on the fingerprint).
- MinHash signatures are pure Column expressions over the shingle array
  (no Python, no explode): sig[i] = min over shingles of xxhash64(s, i).
- LSH banding turns all-pairs comparison into an equi-join on
  (band_index, band_hash) — the only all-pairs step runs within buckets,
  which is the standard near-dup sublinear path at 100 TB.
- exact n-gram Jaccard (array_intersect/array_union) is the verify step
  on candidate pairs, and doubles as a small-N oracle-checkable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.ops.text import fingerprint
from data_integration_est_spark.util import spread


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact (normalized-content) dedup: one row per fingerprint, keeping
    the smallest id; adds ``dup_count``.  One shuffle."""
    fp = fingerprint(F.col(text_col))
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; documents shorter than n tokens get
    their whole (trimmed) text as a single shingle.

    PERF: the transform lambda references ``toks`` per iteration, and
    Spark does NOT hoist loop-invariant subexpressions out of
    higher-order-function lambdas — so whatever expression ``text`` is
    gets re-evaluated PER GRAM.  Pass a cheap column (raw attribute);
    materialize any normalization into a real column first (see
    ``ops/decontam._gram_keys``, where inlining the regex pipeline cost
    ~8x)."""
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(F.array(F.trim(text)))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
    out_col: str = "minhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures as a ``(id_col, out_col)`` DataFrame, with
    ``out_col`` an array<bigint> of length ``num_hashes``.

    Physical shape: explode shingles to (id, shingle) rows, hash each
    shingle ``num_hashes`` ways (salted xxhash64 simulating independent
    permutations), then ONE groupBy(id) with ``num_hashes`` min-aggregates.
    The partial (map-side) min makes the shuffle O(docs x num_hashes)
    regardless of document length — the 100 TB-safe shape.

    Deliberately NOT expressed as array_min(transform(...)) per slot over a
    lazy shingle column: Catalyst inlines the shingle expression into every
    downstream consumer (e.g. 16 LSH band slots x 32 slots), which blew
    analysis+codegen up to minutes on tiny data.  The aggregation here is
    an optimizer barrier — downstream sees 32 concrete columns."""
    pairs = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__sh__"),
    )
    aggs = [
        F.min(F.xxhash64("__sh__", F.lit(i))).alias(f"__mh_{i}__")
        for i in range(num_hashes)
    ]
    return (
        pairs.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__mh_{i}__") for i in range(num_hashes)]).alias(out_col),
        )
    )


def minhash_signatures_portable(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    out_col: str = "minhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Engine-PORTABLE MinHash signatures — the md5-stream twin of
    :func:`minhash_signatures` (same physical shape: explode shingles,
    one groupBy(id) with ``num_hashes`` min-aggregates).

    ONE md5 per shingle yields two independent 48-bit halves (hex chars
    1-12 and 17-28); slot i hashes via the Kirsch-Mitzenmacher
    combination (h1 + i*h2) mod 2^48 — exact int64 arithmetic
    (i*h2 <= 63*2^48 < 2^54), so signatures, band buckets, candidate
    pairs, and dup verdicts reproduce bit-for-bit in ANY engine with
    md5 + hex parsing (DuckDB/Trino/Postgres — the ``rng`` md5-stream /
    ``ops/sketches`` discipline).  That is what a cross-engine dedup
    pipeline needs: signatures built by Spark today can be probed or
    extended by whatever engine ingests tomorrow's crawl.

    The xxhash64 production path stays the default (md5 costs more per
    call; this path amortizes by hashing each shingle ONCE instead of
    ``num_hashes`` times).  Cites: Broder 1997 (MinHash), Kirsch &
    Mitzenmacher 2006 (two-hash simulation)."""
    if not (1 <= num_hashes <= 64):
        raise ValueError("num_hashes must be in [1, 64]")
    pairs = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), shingle_n))
            .alias("__sh__"),
        )
        .select(F.col(id_col), F.md5("__sh__").alias("__hx__"))
    )
    h1 = F.conv(F.substring("__hx__", 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring("__hx__", 17, 12), 16, 10).cast("long")
    m = F.lit(1 << 48)
    aggs = [
        F.min((h1 + F.lit(i) * h2) % m).alias(f"__mh_{i}__")
        for i in range(num_hashes)
    ]
    return (
        pairs.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(
                *[F.col(f"__mh_{i}__") for i in range(num_hashes)]
            ).alias(out_col),
        )
    )


def band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, bucket) rows — one per band per doc; the LSH bucket key
    is a deterministic function of the signature values only, so buckets
    from SEPARATE calls (e.g. a training corpus and a benchmark corpus)
    are join-compatible.  Shared by the within-corpus self-join
    (``lsh_candidate_pairs``) and the cross-corpus decontamination join
    (``ops.decontam.neardup_contamination``)."""
    sig = F.col(sig_col)
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.concat_ws(",", F.transform(
                    F.slice(sig, b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                )),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    return df.select(F.col(id_col), band_hashes.alias("bh")).select(
        F.col(id_col), F.posexplode("bh").alias("band", "bucket")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH over MinHash signatures: docs sharing any band bucket
    become a candidate pair.  Returns distinct (id_a, id_b), id_a < id_b.

    Physical plan: explode to (band, band_hash, id) — #bands rows per doc —
    then a self-equi-join on the bucket key.  The join is shuffle-
    partitioned on (band, band_hash); no cross join ever materializes.
    The bucket table (docs x bands tiny rows) is persisted so the
    signature pipeline upstream of the self-join runs ONCE, not twice —
    at scale the signature computation dominates."""
    from data_integration_est_spark.util import bounded_persist

    buckets = bounded_persist(band_buckets(
        df, id_col=id_col, sig_col=sig_col, bands=bands,
        rows_per_band=rows_per_band,
    ))
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    max_pairs: int | None = 5_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for near-dup pairs.

    With ``candidates`` (e.g. from ``lsh_candidate_pairs``) only those
    pairs are verified — the scale path.  Without, all pairs are compared
    (small N / oracle checking only).

    ``max_pairs`` is the quadratic-blowup refusal (r12; the r11 sf1 run
    hung 20 min on a 16M-pair blocked join under 100% duplication): the
    pair count is pre-counted in one cheap pass — WITHOUT the shingle
    arrays the verify join would carry — and anything above the cap
    raises loudly instead of hanging, mirroring ``ops/decontam``'s
    ``max_bench_grams`` discipline.  This kernel's documented role is
    the small-N exact-verify oracle for the banded-LSH production
    paths; at blowup scale the right answer is "use the LSH path", not
    a quadratic join.  ``max_pairs=None`` disables the guard."""
    from data_integration_est_spark.util import bounded_persist

    if max_pairs is not None:
        if candidates is not None:
            # cache the (id_a, id_b) set through the bounded registry so
            # the guard's count pass MATERIALIZES it for the verify join
            # instead of executing the candidate join twice (the naive
            # pre-count regressed dedup_corpus 2.6x); id pairs only —
            # a few bytes per row at any realistic candidate volume
            candidates = bounded_persist(candidates)
            n_pairs = candidates.count()
        else:
            n_docs = df.count()
            n_pairs = n_docs * (n_docs - 1) // 2
        if n_pairs > max_pairs:
            raise ValueError(
                f"ngram_jaccard_pairs: {n_pairs} candidate pairs > "
                f"max_pairs={max_pairs}; a quadratic verify at this volume "
                "hangs rather than finishes — block harder (smaller "
                "buckets) or use the banded-LSH production path "
                "(lsh_candidate_pairs / minhash+LSH) and verify only its "
                "candidates.  Pass max_pairs=None to force."
            )

    # both sides of the pair join read the shingle table — persist so the
    # tokenize/shingle pass over the corpus runs once
    sh = bounded_persist(spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("sh")
    ))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    if candidates is not None:
        pairs = candidates.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every character k-gram, keep the minimum hash of
    each sliding window of ``window`` consecutive k-grams, distinct.
    Guarantees any shared substring of length >= k + window - 1 yields at
    least one shared fingerprint — the robust partial-overlap primitive
    (exact dedup's md5 fingerprint catches only whole-document dups).

    Physical shape: explode k-gram positions to rows, one per-doc ranked
    window for the mins, one distinct — all relational (a nested
    higher-order-lambda formulation would re-evaluate the hash array per
    window element, going quadratic in doc length).  Like any
    per-document window, a single task sees a whole document's grams —
    fine for web-scale docs (<= ~1 MB), chunk gigantic inputs first."""
    src = spread(df.select(F.col(id_col), F.col(text_col)))
    n = F.greatest(F.length(F.col(text_col)) - k + 1, F.lit(1))
    grams = src.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), n)).alias("pos"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col("pos"),
        (F.length(F.col(text_col)) - k + 1).alias("n_grams"),
        F.xxhash64(F.col(text_col).substr(F.col("pos"), F.lit(k))).alias("h"),
    )
    from pyspark.sql import Window as W

    win = W.partitionBy(id_col).orderBy("pos").rowsBetween(0, window - 1)
    # FULL windows only (pos <= n_grams - window + 1): emitting the partial
    # trailing windows too would be a superset of the SIGMOD-2003 winnowing
    # set and slightly inflate short-doc overlap Jaccard.  Docs too short
    # for one full window keep their single all-grams window.
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .filter(
            F.col("pos")
            <= F.greatest(F.col("n_grams") - window + 1, F.lit(1))
        )
        .select(id_col, "fp")
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """Fingerprint-overlap (Jaccard over winnowed sets) for candidate
    (id_a, id_b) pairs — the verify step for partial-overlap detection.
    One fingerprint table feeds both join sides (persisted)."""
    from data_integration_est_spark.util import bounded_persist

    fps = bounded_persist(winnow_fingerprints(df, id_col, text_col, k, window))
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    inter = (
        candidates.join(a, "id_a").join(b, ["id_b", "fp"])
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_fp").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_fp").alias("n_b"))
    return (
        inter.join(na, "id_a").join(nb, "id_b")
        .withColumn(
            "overlap",
            F.round(F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("overlap") >= threshold)
        .select("id_a", "id_b", "n_common", "overlap")
    )


def simhash64(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash over word tokens.

    Per-bit majority vote of token hashes, computed with ONE explode +
    groupBy(id): 64 conditional sums (codegen'd), then the bits are
    reassembled into a bigint.  Hamming distance between simhashes
    approximates cosine similarity of the token multisets."""
    toks = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim: Column = F.lit(0).cast("long")
    for b in range(63):
        sim = sim + F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    # bit 63 is the sign bit of the bigint
    sim = sim + F.when(F.col("b63") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    out = agg.withColumn(out_col, sim)
    return out.select(id_col, out_col)


def simhash_portable(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "simhash",
    n_bits: int = 48,
) -> DataFrame:
    """Engine-PORTABLE SimHash — the md5-stream twin of
    :func:`simhash64` (same physical shape: one token explode, one
    groupBy(id) with per-bit conditional vote sums, bits reassembled
    into a bigint).

    The per-token hash is the 48-bit md5 prefix
    (``'0x'+hex[0:12]`` — the ``ops/sketches`` discipline), so the
    fingerprints reproduce bit-for-bit in any engine with md5 + hex
    parsing.  48 bits also sidesteps the bigint SIGN-BIT minefield the
    64-bit variant documents (bit 63 of an int64 differs across SQL
    dialects' shift/sign semantics): every mask and the reassembled
    fingerprint stay comfortably positive.

    Hamming distance between fingerprints approximates the cosine
    similarity of the token multisets (Charikar 2002), exactly as in
    the production path; the xxhash64 64-bit form stays the default."""
    if not (8 <= n_bits <= 48):
        raise ValueError("n_bits must be in [8, 48]")
    toks = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("long")
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(n_bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim: Column = F.lit(0).cast("long")
    for b in range(n_bits):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.withColumn(out_col, sim).select(id_col, out_col)


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    max_doc_freq: int = 1,
    hash_lines: bool = True,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Cross-document line-level dedup — the CCNet/RefinedWeb corpus
    cleaning step: a line appearing in more than ``max_doc_freq`` DISTINCT
    documents (boilerplate: nav bars, cookie banners, license headers) is
    removed from EVERY document; remaining lines are reassembled in their
    original order.  Returns (id_col, out_col, n_lines, n_kept).

    Physical shape (all O(lines); line TEXT never crosses a shuffle —
    r16, previously the kept text rode a flag join plus a
    sort_array(collect_list) reassembly groupBy, i.e. the corpus
    shuffled twice): explode (doc, line-key) pairs [narrow: the key is
    a 64-bit hash under ``hash_lines``] -> groupBy line-key with
    countDistinct(doc) -> join the boilerplate keys back to the narrow
    key stream and collect the per-doc BAD-key set (small: only docs
    containing boilerplate, only their boilerplate keys) -> LEFT join
    that set to the original rows by doc id alone and cut the split
    array with a codegen ``filter`` (removal is by line VALUE, so
    membership of each line's key in the doc's bad set is exactly the
    old flag; array order is the original line order).  Docs whose
    every line is boilerplate stay present with empty text.  Blank
    lines are kept verbatim (they carry formatting, and counting them
    as boilerplate would strip every paragraph break).

    ``hash_lines=True`` (the 100 TB default) keys the count and join by
    ``xxhash64(line)`` so shuffle rows stay narrow (16 bytes vs the full
    line text); a 64-bit collision deleting a legitimate line is a
    ~2^-64-per-pair event.  ``hash_lines=False`` keys by the raw line
    string — bit-identical semantics, used by the gate row so a SQL
    oracle can replay it; equality of the two paths is pinned in
    ``tests/test_llm_pipeline_ops.py``.
    """
    def lkey_of(line):
        return F.xxhash64(line) if hash_lines else line

    keys = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), line_sep, -1)).alias("line"),
    ).select(F.col(id_col), F.trim(F.col("line")).alias("__tl__"),
             lkey_of(F.col("line")).alias("lkey"))
    boiler = (
        keys.filter(F.col("__tl__") != "")
        .groupBy("lkey")
        .agg(F.count_distinct(F.col(id_col)).alias("df_"))
        .filter(F.col("df_") > max_doc_freq)
        .select("lkey")
    )
    bad_per_doc = (
        keys.join(boiler, "lkey")
        .groupBy(id_col)
        .agg(F.collect_set("lkey").alias("__bad__"))
    )
    # a NULL text explodes to zero rows, so such docs were absent from
    # the old groupBy output — keep that contract.  Staged selects keep
    # the split / filter arrays single-evaluation (CollapseProject does
    # not inline non-cheap aliases referenced more than once).
    with_arr = (
        df.filter(F.col(text_col).isNotNull())
        .join(bad_per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__bad__"),
            F.split(F.col(text_col), line_sep, -1).alias("__arr__"),
        )
    )
    kept = F.when(F.col("__bad__").isNull(), F.col("__arr__")).otherwise(
        F.filter(
            "__arr__",
            lambda ln: ~F.array_contains("__bad__", lkey_of(ln)),
        )
    )
    with_kept = with_arr.select(
        F.col(id_col), F.col("__arr__"), kept.alias("__kept__")
    )
    return with_kept.select(
        F.col(id_col),
        F.array_join("__kept__", line_sep).alias(out_col),
        F.size("__arr__").cast("long").alias("n_lines"),
        F.size("__kept__").cast("long").alias("n_kept"),
    )


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    exact_first: bool = True,
    assert_full_recall: bool = False,
) -> DataFrame:
    """One-call corpus near-dedup — the composition every pipeline runs:

    1. exact dedup (md5-fingerprint keep-min-id) to collapse verbatim
       copies before the similarity machinery sees them,
    2. MinHash signatures -> banded LSH candidate pairs,
    3. exact n-gram Jaccard verify of candidates at ``threshold``,
    4. connected components over surviving pairs -> keep the minimum-id
       representative of each near-dup cluster.

    Every stage is one of this module's / ``ops.components``'s certified
    primitives (each with its own gate row and tests); this function only
    wires them, so the scale posture is the stages' own: bucketed
    candidate generation, candidate-restricted verify, and a component
    resolution that is a single driver union-find for the (typical)
    sparse verified-pair list, falling back to O(diameter)
    label-propagation rounds.  Returns the surviving rows of ``docs``.

    Plumbing (round-6 trim — this composition launches ~7 Spark stages,
    so per-stage waste compounds): the exact-dedup step keeps surviving
    ROWS via ONE fingerprint-keyed window (row_number = 1 on min id)
    instead of the summary-groupBy + id semi-join (two shuffles), and the
    survivors are PERSISTED — three downstream consumers (signatures,
    Jaccard verify, final anti-join) would otherwise each recompute the
    scan + window.  At 100 TB scale, substitute a parquet checkpoint for
    the persist; the stage structure is unchanged.

    ``assert_full_recall=True`` (r7, certification runs only — NOT the
    100 TB path): additionally computes the GROUND-TRUTH >= threshold
    pair set via a lossless shingle-inverted-index equi-join (a pair
    with Jaccard > 0 must share a shingle, so gram blocking misses
    nothing) and raises AssertionError if the banded-LSH stage missed
    any true pair.  The gate row runs with this on, so its oracle's
    "LSH recall is 1 on this corpus" premise is asserted IN-QUERY
    rather than assumed — if a corpus ever breaks it, the row errors
    loudly instead of silently hash-mismatching (r5/r6 ADVICE item)."""
    from pyspark.sql import Window

    from data_integration_est_spark.ops.components import dedup_keep_representative
    from data_integration_est_spark.ops.text import fingerprint

    work = docs
    if exact_first:
        win = Window.partitionBy("__fp__").orderBy(id_col)
        work = (
            docs.withColumn("__fp__", fingerprint(F.col(text_col)))
            .withColumn("__rn__", F.row_number().over(win))
            .filter(F.col("__rn__") == 1)
            .drop("__fp__", "__rn__")
        )
    from data_integration_est_spark.util import bounded_persist

    work = bounded_persist(work)
    sigs = minhash_signatures(
        work, text_col=text_col, num_hashes=num_hashes,
        shingle_n=shingle_n, id_col=id_col,
    )
    rows_per_band = max(1, num_hashes // bands)
    cand = lsh_candidate_pairs(
        sigs, id_col=id_col, bands=bands, rows_per_band=rows_per_band
    )
    pairs = ngram_jaccard_pairs(
        work, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        threshold=threshold, candidates=cand,
    )
    if assert_full_recall:
        # two consumers read the verified pairs in this branch (the
        # recall anti-join below and the component resolution at the
        # end); persist the small pair list so the signature -> banded
        # candidates -> Jaccard-verify chain runs once, not twice
        from data_integration_est_spark.util import bounded_persist

        pairs = bounded_persist(pairs.select("id_a", "id_b"))
        # count-based ground truth straight off the inverted index:
        # shared-gram counts ARE the intersection sizes (grams distinct
        # per doc), so jaccard = c / (|A| + |B| - c) with no pair-level
        # array ops and no distinct-pair materialization
        inv = work.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), shingle_n))
            ).alias("g"),
        )
        from data_integration_est_spark.util import bounded_persist

        inv = bounded_persist(inv)
        sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
        pair_counts = (
            inv.select(F.col(id_col).alias("id_a"), "g")
            .join(inv.select(F.col(id_col).alias("id_b"), "g"), "g")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        truth = (
            pair_counts
            .join(sizes.select(F.col(id_col).alias("id_a"),
                               F.col("sz").alias("sz_a")), "id_a")
            .join(sizes.select(F.col(id_col).alias("id_b"),
                               F.col("sz").alias("sz_b")), "id_b")
            .filter(
                F.round(
                    F.col("c")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("c")), 6
                ) >= threshold
            )
        )
        missed = (
            truth.select("id_a", "id_b")
            .join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
            .count()
        )
        inv.unpersist()
        if missed:
            raise AssertionError(
                f"dedup_corpus: banded LSH missed {missed} true >= "
                f"{threshold} pair(s) on this corpus — the gate oracle's "
                "recall-1 premise does not hold; raise num_hashes/bands"
            )
    return dedup_keep_representative(
        work, pairs.select("id_a", "id_b"), id_col=id_col,
        left_col="id_a", right_col="id_b",
    )


def duplicated_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 8,
    hash_grams: bool = True,
    out_col: str = "text_dedup",
) -> DataFrame:
    """Exact duplicated-SUBSTRING removal — the ExactSubstr step of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), the third dedup granularity next to whole-document
    (``exact_dedup``/``dedup_corpus``) and line (``line_dedup``): any
    run of ``min_len`` whitespace tokens that occurs MORE THAN ONCE in
    the corpus is cut from every document (the conservative
    remove-all-copies variant); overlapping duplicated windows merge
    into maximal spans first, so a long duplicated passage is removed
    as one span, not per-window.

    Physical shape — everything O(corpus tokens), no suffix array:

    1. per-doc token array -> ALL ``min_len``-token window keys as ONE
       ``transform`` over the array (codegen; no per-window explode of
       the token text),
    2. explode (doc, start, key) -> groupBy key HAVING count > 1 (the
       only corpus-wide shuffle; map-side partial counts),
    3. duplicated starts -> maximal spans per doc via the classic
       gaps-and-islands window (running max of span ends),
    4. spans collect into ONE small (doc, [lo, hi)...]) array row per
       affected doc and LEFT-join the tokenized corpus on doc id alone;
       the cut is a codegen array ``filter`` by position (spans per doc
       are disjoint and in-bounds by construction, so removed-token
       count = sum of span lengths).  Token text never explodes into
       rows and never crosses a shuffle — only doc ids and span bounds
       do (r16: previously every token row range-joined the spans and
       was reassembled via sort_array(collect_list), i.e. the whole
       corpus shuffled twice).  Docs with nothing removed — and docs
       removed ENTIRELY — stay present.

    ``hash_grams=True`` (the 100 TB default) keys step 2 by
    ``xxhash64`` of the window text (16-byte shuffle rows; a 64-bit
    collision erroneously deleting a span is ~2^-64 per pair).
    ``hash_grams=False`` keys by the window text itself — bit-identical
    semantics, used by the gate row so the DuckDB oracle can replay it;
    equality of the two paths is pinned in pytest.

    Returns (id_col, out_col, n_tokens, n_removed).
    """
    if min_len < 2:
        raise ValueError("min_len must be >= 2 tokens")
    L = int(min_len)
    # NULL-text docs are absent from the output — the pre-r16 contract
    # (the posexplode shape dropped them implicitly; the r16 array-cut
    # LEFT join re-admitted them as all-NULL rows — ADVICE r16) and the
    # same rule line_dedup pins explicitly.
    toked = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t__"),
    )
    keyf = "xxhash64(concat_ws(' ', slice(__t__, i + 1, {L})))" if hash_grams \
        else "concat_ws(' ', slice(__t__, i + 1, {L}))"
    grams = toked.filter(F.size("__t__") >= L).select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(__t__) - " + str(L) + "), "
                "i -> " + keyf.format(L=L) + ")"
            )
        ).alias("s", "__k__"),
    )
    from pyspark.sql import Window

    # duplicated starts via ONE window count over the gram stream —
    # the groupBy(key)->join-back form shuffled the (mostly-unique-key,
    # so barely map-side-combinable) gram stream twice (r16; guide
    # §2.4: two operations keyed the same way share one exchange).
    # Skew caveat (ADVICE r16): a window count has no map-side partial
    # aggregation, so a pathologically hot duplicated gram (boilerplate
    # repeated millions of times) funnels all its occurrences into one
    # window partition.  Acceptable here because gram keys are near-
    # unique by construction (L >= 2 token windows) and the row is
    # 16 bytes; if a large-scale run shows a straggler partition,
    # replace with a salted two-level count (count by (key, salt), sum
    # by key) at the price of the second exchange.
    wk = Window.partitionBy("__k__")
    starts = (
        grams.withColumn("__c__", F.count(F.lit(1)).over(wk))
        .filter(F.col("__c__") > 1)
        .select(id_col, "s")
    )

    wprev = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = Window.partitionBy(id_col).orderBy("s")
    spans = (
        starts.withColumn(
            "__brk__",
            (
                F.col("s")
                >= F.coalesce(F.max(F.col("s") + L).over(wprev), F.lit(-1))
            ).cast("int"),
        )
        .withColumn("__isl__", F.sum("__brk__").over(wrun))
        .groupBy(id_col, "__isl__")
        .agg(F.min("s").alias("lo"), (F.max("s") + L).alias("hi"))
        .drop("__isl__")
    )
    spans_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("lo", "hi")).alias("__sp__")
    )
    joined = toked.join(spans_doc, id_col, "left")
    kept = F.when(F.col("__sp__").isNull(), F.col("__t__")).otherwise(
        F.filter(
            "__t__",
            lambda tok, i: ~F.exists(
                "__sp__", lambda s: (i >= s["lo"]) & (i < s["hi"])
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias(out_col),
        F.size("__t__").cast("long").alias("n_tokens"),
        F.coalesce(
            F.aggregate(
                "__sp__",
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["hi"] - s["lo"],
            ),
            F.lit(0).cast("long"),
        ).alias("n_removed"),
    )
