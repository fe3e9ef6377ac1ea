"""Train/benchmark decontamination — n-gram overlap scan.

The standard LLM-pipeline hygiene step (GPT-3 appendix C / PaLM / Llama
recipes): a training document is contaminated when it shares enough word
n-grams with an evaluation benchmark.  The reference repo has no analogue;
this is part of the engine's LLM-data-pipeline extension surface (brief:
training-data operators are first-class).

Scale design:
- Both sides reduce to (key, gram-hash) pairs — grams are compared by
  ``xxhash64``, never by string, so shuffle bytes stay ~16 B/gram at any
  document length.
- Benchmarks are small (MBs — orders of magnitude under the corpus), so
  the benchmark gram set is BROADCAST by default: the scan stays
  shuffle-free on the 100 TB side, one map-side semi/inner join per doc
  gram.  ``broadcast_benchmark=False`` falls back to a shuffle equi-join
  on the hash for adversarially huge benchmark sets.
- Output is per-document sufficient statistics (gram counts, hit counts)
  aggregated in the same pass — no doc×benchmark pair blow-up ever
  materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.util import spread


def _norm_text(text: Column) -> Column:
    """The dedup-family normalization (ops.text.fingerprint): lowercase,
    strip non-alphanumerics, collapse whitespace — so 'The  Cat!' and
    'the cat' share grams."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )


def _gram_keys(
    df: DataFrame, text_col: str, id_col: str, n: int, exact: bool
) -> DataFrame:
    """(id, gram_key) pairs — distinct word n-grams of the normalized
    text.  Scale path keys by ``xxhash64`` (16 B/gram shuffle width);
    ``exact=True`` keys by the gram string itself — the oracle-checkable
    mode, immune to (astronomically rare) hash collisions."""
    # Materialize normalization + tokenization ONCE per row before the
    # gram transform: passing the raw normalize-and-split expression into
    # ``word_shingles`` would inline it into every lambda reference, and
    # the regex pipeline then re-runs per GRAM instead of per doc (~8x
    # slower measured at sf0.1).  Also spread a small-file input across
    # cores (no-op when the scan already has >= parallelism splits).
    base = spread(df).select(
        F.col(id_col), _norm_text(F.col(text_col)).alias("__t__")
    ).select(
        id_col, "__t__", F.split(F.col("__t__"), " ").alias("__toks__")
    )
    k = F.size("__toks__")
    grams = F.when(
        k >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks__"), i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.col("__t__")))
    out = base.select(F.col(id_col), F.explode(grams).alias("__gram__"))
    if exact:
        return out.select(id_col, F.col("__gram__").alias("gram_key"))
    return out.select(id_col, F.xxhash64("__gram__").alias("gram_key"))


def contamination_scan(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 5,
    frac_threshold: float = 0.05,
    broadcast_benchmark: bool = True,
    exact: bool = False,
) -> DataFrame:
    """Per-document contamination stats against a benchmark corpus.

    Returns (id_col, n_grams, n_hits, contamination_frac, contaminated):
    ``n_grams`` = distinct word ``n``-grams in the doc, ``n_hits`` = how
    many also appear anywhere in the benchmark, ``contaminated`` = frac
    >= ``frac_threshold``.  Docs shorter than ``n`` words count their
    whole text as one gram (consistent with ``word_shingles``).
    ``exact=True`` joins on gram strings instead of 64-bit hashes — the
    oracle mode (hash-collision-free); the default hash path is the
    100 TB mode.
    """
    bench_grams = (
        _gram_keys(benchmark, bench_text_col or text_col, id_col, n, exact)
        .select("gram_key")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = _gram_keys(docs, text_col, id_col, n, exact)
    hit = bench_grams.withColumn("__hit__", F.lit(1))
    return (
        doc_grams.join(hit, "gram_key", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit__"), F.lit(0))).alias("n_hits"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("contamination_frac"),
            (F.col("n_hits") / F.col("n_grams") >= frac_threshold).cast("int").alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    frac_threshold: float = 0.05,
) -> DataFrame:
    """Drop contaminated docs: ``docs`` minus those whose benchmark n-gram
    overlap fraction reaches ``frac_threshold`` (left-semi join back onto
    the clean ids, so the full doc rows survive untouched)."""
    clean = contamination_scan(
        docs, benchmark, text_col=text_col, id_col=id_col, n=n,
        frac_threshold=frac_threshold,
    ).filter(F.col("contaminated") == 0).select(id_col)
    return docs.join(clean, id_col, "left_semi")


def neardup_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-duplicate decontamination (r6) — the fuzzy sibling of the
    exact n-gram ``contamination_scan``: a training document is flagged
    when its shingle-set Jaccard against ANY benchmark document reaches
    ``threshold``, even if no long n-gram survives verbatim (light
    paraphrase / whitespace mangling defeats exact-gram scans; this is
    the Llama-3-style fuzzy decontamination layer).

    Physical shape — no corpus x benchmark pair ever materializes:
    MinHash signatures for both sides (same deterministic hash family,
    so buckets are join-compatible), banded LSH bucket keys for both,
    then a bucket EQUI-JOIN of the corpus buckets against the BROADCAST
    benchmark buckets (benchmarks are MBs; the 100 TB side never
    shuffles for the join), and an exact shingle-Jaccard verify of the
    surviving candidates only.  Returns verified
    (id_col, bench_id, jaccard) pairs at >= threshold; compose with an
    anti-join (``decontaminate_neardup``) to drop flagged docs."""
    from data_integration_est_spark.ops.dedup import (
        band_buckets, minhash_signatures, word_shingles)

    rows_per_band = max(1, num_hashes // bands)
    sig_c = minhash_signatures(
        corpus, text_col=text_col, num_hashes=num_hashes,
        shingle_n=shingle_n, id_col=id_col,
    )
    sig_b = minhash_signatures(
        benchmark, text_col=text_col, num_hashes=num_hashes,
        shingle_n=shingle_n, id_col=bench_id_col,
    )
    bk_c = band_buckets(sig_c, id_col=id_col, bands=bands,
                        rows_per_band=rows_per_band)
    bk_b = band_buckets(sig_b, id_col=bench_id_col, bands=bands,
                        rows_per_band=rows_per_band).withColumnRenamed(
        bench_id_col, "__bench_id__"
    )
    cand = (
        bk_c.join(F.broadcast(bk_b), ["band", "bucket"])
        .select(id_col, "__bench_id__")
        .distinct()
    )
    sh_c = spread(corpus.select(id_col, text_col)).select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__sh_c__")
    )
    sh_b = benchmark.select(
        F.col(bench_id_col).alias("__bench_id__"),
        word_shingles(F.col(text_col), shingle_n).alias("__sh_b__"),
    )
    inter = F.size(F.array_intersect("__sh_c__", "__sh_b__")).cast("double")
    union = F.size(F.array_union("__sh_c__", "__sh_b__")).cast("double")
    return (
        cand.join(sh_c, id_col)
        .join(F.broadcast(sh_b), "__bench_id__")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col(id_col), F.col("__bench_id__").alias("bench_id"), "jaccard")
    )


def decontaminate_neardup(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    threshold: float = 0.5,
    **kwargs,
) -> DataFrame:
    """Drop every corpus doc with a verified near-dup benchmark match at
    >= ``threshold`` (anti-join on the flagged id set — id-only
    shuffle)."""
    flagged = neardup_contamination(
        corpus, benchmark, text_col=text_col, id_col=id_col,
        bench_id_col=bench_id_col, threshold=threshold, **kwargs,
    ).select(id_col).distinct()
    return corpus.join(flagged, id_col, "left_anti")


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 5,
    frac_threshold: float = 0.05,
    exact: bool = False,
    max_bench_grams: int = 5_000_000,
) -> DataFrame:
    """MAP-ONLY per-row contamination flags — the STREAMING-compatible
    form of :func:`contamination_scan` (r7): the document's distinct
    grams stay an ARRAY column and score via ``array_intersect``
    against the benchmark's gram set collected into ONE broadcast row,
    so there is no per-doc explode/groupBy and the operator runs on a
    ``readStream`` frame in APPEND mode with zero state (stream-static
    cross join of the 1-row set) — decontamination AT INGEST, before
    contaminated docs ever reach the training sink.

    Same numbers as ``contamination_scan`` (pinned in pytest); adds the
    original columns back (it's a ``withColumn`` chain, not an agg).
    The benchmark gram set must be broadcast-sized — true for real eval
    benchmarks; the ``max_bench_grams`` guard raises rather than
    silently building a multi-GB broadcast."""
    bench_keys = (
        _gram_keys(benchmark, bench_text_col or text_col, id_col, n, exact)
        .select("gram_key")
        .distinct()
    )
    n_grams_bench = bench_keys.count()
    if n_grams_bench > max_bench_grams:
        raise ValueError(
            f"contamination_flags: benchmark has {n_grams_bench} grams > "
            f"max_bench_grams={max_bench_grams}; a set this large should "
            "use the join-based contamination_scan, not a broadcast array"
        )
    bench_row = bench_keys.agg(
        F.collect_list("gram_key").alias("__bench__")
    )
    # per-row flag cost is O(|doc grams| + |probe-set|) of CPU-bound map
    # work; a small-file batch input would otherwise run it all on one
    # core (the r11 sf1 probe measured 369 s single-task vs ~27 s
    # spread).  spread() is a no-op when partitions >= cores, and is
    # skipped on streams (micro-batch splits come from the source).
    src = docs if docs.isStreaming else spread(docs)
    base = src.withColumn("__t__", _norm_text(F.col(text_col))).withColumn(
        "__toks__", F.split(F.col("__t__"), " ")
    )
    k = F.size("__toks__")
    grams = F.when(
        k >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks__"), i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.col("__t__")))
    if not exact:
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    hits = F.size(F.array_intersect(F.col("__grams__"), F.col("__bench__")))
    return (
        base.withColumn("__grams__", grams)
        .crossJoin(F.broadcast(bench_row))
        .withColumn("n_grams", F.size("__grams__"))
        .withColumn("n_hits", hits)
        .withColumn(
            "contamination_frac",
            F.round(F.col("n_hits") / F.col("n_grams"), 6),
        )
        .withColumn(
            "contaminated",
            (F.col("n_hits") / F.col("n_grams") >= frac_threshold).cast("int"),
        )
        .drop("__t__", "__toks__", "__grams__", "__bench__")
    )


def bloom_contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 5,
    frac_threshold: float = 0.05,
    n_bits: int = 1 << 24,
    n_hashes: int = 5,
) -> DataFrame:
    """:func:`contamination_flags` with the benchmark gram set folded
    into a portable Bloom filter (``ops/bloom``) instead of a collected
    gram array — the 100 TB-side fix for the one quantity the exact
    form cannot bound: the broadcast is ALWAYS <= m/32 words (2 MB at
    the default m = 2^24), however many grams the benchmark suite
    grows (the exact form's ``max_bench_grams`` guard simply refuses
    past 5M).  Still MAP-ONLY per document after the 1-row broadcast
    (the word table rides as a map column; each gram checks its k bits
    via ``element_at`` inside a filter lambda — no explode, no state),
    so it runs on a ``readStream`` frame in APPEND mode like the exact
    variant: decontamination at ingest.

    The trade is one-sided: never a false NEGATIVE (every true overlap
    counts), but ~``bloom_fpr(n_grams_bench, n_bits, n_hashes)`` of a
    clean doc's grams false-hit, so ``contamination_frac`` is an UPPER
    bound and ``contaminated`` can only over-flag.  Size m so the FPR
    is far below ``frac_threshold`` (default: 2^24 bits holds 5M grams
    at fpr ~ 0.009 — well under the 0.05 default threshold; at 1M
    grams fpr ~ 2e-5).  Pinned in pytest: flags are a superset of the
    exact variant's, and equal when m is generous."""
    from data_integration_est_spark.ops.bloom import (
        bloom_build, bloom_word_mask,
    )

    bench_keys = (
        _gram_keys(benchmark, bench_text_col or text_col, id_col, n,
                   exact=True)
        .select("gram_key").distinct()
    )
    words = bloom_build(bench_keys, "gram_key", n_bits, n_hashes)
    word_map = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("__bw__")
    )

    # per-row flag cost is O(|doc grams| + |probe-set|) of CPU-bound map
    # work; a small-file batch input would otherwise run it all on one
    # core (the r11 sf1 probe measured 369 s single-task vs ~27 s
    # spread).  spread() is a no-op when partitions >= cores, and is
    # skipped on streams (micro-batch splits come from the source).
    src = docs if docs.isStreaming else spread(docs)
    base = src.withColumn("__t__", _norm_text(F.col(text_col))).withColumn(
        "__toks__", F.split(F.col("__t__"), " ")
    )
    k = F.size("__toks__")
    grams = F.when(
        k >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks__"), i + 1, n)),
            )
        ),
    ).otherwise(F.array(F.col("__t__")))

    # materialize each gram's k (word, mask) probe pairs ONCE (the
    # shared bloom_word_mask kernel) BEFORE the membership scan: an
    # md5-bearing expression referenced inside a HOF lambda re-runs per
    # REFERENCE (the _gram_keys hazard, ~8x measured), so the bit test
    # below touches only materialized ints + the map lookup
    def _wb(g: Column) -> Column:
        w, b = bloom_word_mask(g, n_bits, n_hashes)
        return F.arrays_zip(w.alias("w"), b.alias("b"))

    hits = F.size(
        F.filter(
            F.col("__wb__"),
            lambda pairs: F.forall(
                pairs,
                lambda x: (
                    F.coalesce(
                        F.element_at(F.col("__bw__"), x["w"]),
                        F.lit(0).cast("long"),
                    ).bitwiseAND(x["b"])
                    != 0
                ),
            ),
        )
    )
    return (
        base.withColumn("__grams__", grams)
        .withColumn("__wb__", F.transform(F.col("__grams__"), _wb))
        .crossJoin(F.broadcast(word_map))
        .withColumn("n_grams", F.size("__grams__"))
        .withColumn("n_hits", hits)
        .withColumn(
            "contamination_frac",
            F.round(F.col("n_hits") / F.col("n_grams"), 6),
        )
        .withColumn(
            "contaminated",
            (F.col("n_hits") / F.col("n_grams") >= frac_threshold).cast("int"),
        )
        .drop("__t__", "__toks__", "__grams__", "__wb__", "__bw__")
    )
