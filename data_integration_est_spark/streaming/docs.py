"""Streaming corpus ingest — the continuous-arrival half of the LLM data
pipeline.

Documents land as parquet files (a crawler / upstream job drops them
into a directory); every micro-batch runs the standard curation chain —
unicode cleaning, PII redaction, quality scoring, filtering — and the
survivors stream on to the training-data sink.  Design rules shared
with ``streaming.events``:

- every transformation is a plain DataFrame function, so the SAME code
  serves batch (parquet scan) and streaming (``readStream``) plans, and
  the batch run is the streaming ORACLE in tests;
- the curation chain is MAP-ONLY (cleaning, redaction, scoring and the
  filter are all column expressions), so it admits ``append`` output
  with zero state — the ideal streaming operator shape: at 100 TB/day
  the pipeline is embarrassingly parallel per micro-batch with
  ``maxFilesPerTrigger`` bounding batch size;
- corpus-level monitoring (per-source acceptance rates) is a separate
  grouped aggregation (``complete`` output on streams) — monitoring
  state is O(sources), not O(docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType(), True),
    StructField("source", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("n_chars", LongType(), True),
    StructField("text", StringType(), True),
])


def read_doc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of document parquet under ``path`` (schema
    probed from the footer, ``DOC_SCHEMA`` fallback for an
    empty-at-start directory)."""
    try:
        probed = spark.read.parquet(path).schema
    except Exception:  # unable to infer schema (empty dir)
        probed = DOC_SCHEMA
    reader = spark.readStream.schema(probed)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def curate_docs(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    max_pii: int = 0,
) -> DataFrame:
    """The per-document curation chain — clean, redact, score, filter:

    1. :func:`ops.text.clean_text` (unicode normalization; adds
       ``text_clean`` + ``n_chars_removed``),
    2. PII count + redaction column exprs (``ops.pii`` primitives — the
       ``pii_scan`` wrapper narrows its output, a curation chain keeps
       every upstream column) on the CLEANED text,
    3. :func:`ops.text.quality_score` on the REDACTED text,
    4. keep rows with ``quality >= min_quality`` and ``n_pii <= max_pii``.

    Pure column expressions end to end — identical plan on batch and
    streaming inputs, no shuffle, no state."""
    scored = _curation_chain(docs, text_col)
    return scored.filter(
        (F.col("quality") >= min_quality) & (F.col("n_pii") <= max_pii)
    )


def _curation_chain(docs: DataFrame, text_col: str = "text") -> DataFrame:
    from data_integration_est_spark.ops.pii import pii_counts, redact_pii
    from data_integration_est_spark.ops.text import clean_text, quality_score

    cleaned = clean_text(docs, text_col=text_col)
    tc = F.col("text_clean")
    counts = pii_counts(tc)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    scanned = cleaned
    for kind, c in counts.items():
        scanned = scanned.withColumn(f"n_{kind}", c)
    scanned = scanned.withColumn("n_pii", total).withColumn(
        "redacted", redact_pii(tc)
    )
    return quality_score(scanned, text_col="redacted")


def ingest_summary(docs: DataFrame, **curate_kwargs) -> DataFrame:
    """Per-source acceptance monitoring: rows in, rows kept, acceptance
    rate, mean quality of the kept docs.  On a stream this is a
    ``complete``-mode aggregation with O(sources) state."""
    scored = _curation_chain(docs)
    min_q = curate_kwargs.get("min_quality", 0.3)
    max_pii = curate_kwargs.get("max_pii", 0)
    keep = (F.col("quality") >= min_q) & (F.col("n_pii") <= max_pii)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(keep.cast("long")).alias("n_kept"),
        F.round(F.avg(keep.cast("double")), 6).alias("accept_rate"),
        F.round(F.avg(F.when(keep, F.col("quality"))), 6).alias("kept_quality"),
    )
