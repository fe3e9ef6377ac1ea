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
