"""Repetition-based quality signals — the Gopher/MassiveText filter family.

Complements ``ops.text.quality_score`` (length/punct/stopword shape
signals) with the repetition measures LLM corpus pipelines cut on
(Rae et al. 2021, table A1): duplicate-line fractions and the character
share of the most frequent word 2-gram.  High values mark boilerplate,
navigation chrome, and spam — prime pre-training removal targets.

Scale design: everything is explode → two keyed aggregations (per
(doc, unit) then per doc), so partial map-side combine applies and the
shuffle is keyed by doc id — no windows over the corpus, no UDFs.  The
explode multiplies rows by tokens-per-doc transiently, the same profile
as the TF-IDF and shingle operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.util import spread


def _lines(text: Column) -> Column:
    # literal newlines; documents without newlines are one line
    return F.split(text, r"\n")


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics:

    - ``n_lines``, ``dup_line_frac``: fraction of lines whose content
      appeared earlier in the doc (1 - distinct/total);
    - ``dup_line_char_frac``: fraction of characters sitting in repeated
      line occurrences (each occurrence beyond a line's first counts);
    - ``top_bigram_count`` / ``top_bigram_char_frac``: occurrences of the
      doc's most frequent word 2-gram and the character share it covers
      (count × gram length / doc length).  Ties broken by the
      lexicographically smallest gram for determinism.
    """
    # both passes explode per-token rows out of per-doc rows: spread a
    # small-file scan across cores first (no-op at real input widths)
    docs = spread(docs)
    lines = (
        docs.select(F.col(id_col), F.explode(_lines(F.col(text_col))).alias("line"))
        .groupBy(id_col, "line")
        .agg(F.count(F.lit(1)).alias("c"), F.length("line").alias("len"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_lines"),
            F.count(F.lit(1)).alias("n_distinct_lines"),
            F.sum((F.col("c") - 1) * F.col("len")).alias("dup_chars"),
            F.sum(F.col("c") * F.col("len")).alias("line_chars"),
        )
        .select(
            id_col,
            "n_lines",
            F.round(1.0 - F.col("n_distinct_lines") / F.col("n_lines"), 6).alias(
                "dup_line_frac"
            ),
            F.round(
                F.when(F.col("line_chars") > 0, F.col("dup_chars") / F.col("line_chars"))
                .otherwise(0.0),
                6,
            ).alias("dup_line_char_frac"),
        )
    )

    # materialize the token array before the transform — the lambda would
    # otherwise re-run the split per bigram (see ops/dedup.word_shingles
    # PERF note)
    toked = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("doc_len"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks__"),
    )
    nt = F.size("__toks__")
    bigrams = F.when(
        nt >= 2,
        F.transform(
            F.sequence(F.lit(0), nt - 2),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks__"), i + 1, 2)),
        ),
    ).otherwise(F.array())
    counted = (
        toked.select(
            F.col(id_col),
            "doc_len",
            F.explode_outer(bigrams).alias("gram"),
        )
        .groupBy(id_col, "doc_len", "gram")
        .agg(F.count(F.when(F.col("gram").isNotNull(), 1)).alias("c"))
    )
    # top-1 per doc by (count desc, gram asc — deterministic ties) as a
    # per-doc window: WindowGroupLimit prunes to one row per partition
    # before the final shuffle, same shape as the fuzzy-linkage top-1
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("c").desc(), F.col("gram").asc_nulls_last()
    )
    top = (
        counted.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(
            F.col(id_col),
            F.col("doc_len"),
            F.col("c").alias("top_c"),
            F.col("gram").alias("top_gram"),
        )
        .select(
            id_col,
            F.coalesce(F.col("top_c"), F.lit(0)).alias("top_bigram_count"),
            F.round(
                F.when(
                    (F.col("doc_len") > 0) & F.col("top_gram").isNotNull(),
                    F.col("top_c") * F.length("top_gram") / F.col("doc_len"),
                ).otherwise(0.0),
                6,
            ).alias("top_bigram_char_frac"),
        )
    )
    return lines.join(top, id_col)
