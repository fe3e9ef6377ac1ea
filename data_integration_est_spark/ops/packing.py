"""Sequence packing — concat-and-chunk documents into training windows.

LLM pre-training consumes fixed-length token sequences; the standard
GPT-style recipe concatenates documents (within a stream) and cuts every
``budget`` tokens, so a document may span chunks and a chunk may hold
several documents.  This operator computes, per document, its token span
and chunk assignment in the packed stream, plus per-chunk occupancy — the
bookkeeping a packing writer needs.

Scale design: packing is inherently sequential PER STREAM, so the stream
key (``by`` — typically source or shard) bounds the window: one shuffle
on the key, a RANGE-free cumulative sum per stream, no global ordering
ever materializes.  A single global stream would serialize through one
task — the documented anti-pattern (see SCALE.md); shard first instead.
Chunk ids are made globally unique by prefixing the stream key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    docs: DataFrame,
    tokens_col: str,
    budget: int,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document packing plan: token offsets in the per-``by`` stream
    (documents ordered by ``id_col`` — deterministic), the first/last
    chunk the doc lands in, and how many chunks it spans.

    ``first_chunk``/``last_chunk`` index chunks WITHIN the stream; a doc
    spans ``floor(start/budget) .. floor((end-1)/budget)``.  Zero-token
    docs get their boundary chunk and span 1."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(by)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = F.col(tokens_col).cast("long")
    out = docs.select(
        F.col(id_col), F.col(by), t.alias("n_tokens"),
        F.sum(t).over(w).alias("end_off"),
    ).withColumn("start_off", F.col("end_off") - F.col("n_tokens"))
    first = F.floor(F.col("start_off") / budget)
    last = F.floor(
        F.greatest(F.col("end_off") - 1, F.col("start_off")) / budget
    )
    return out.select(
        id_col, by, "n_tokens", "start_off", "end_off",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks_spanned"),
    )


def chunk_occupancy(
    packed: DataFrame, budget: int, by: str = "source"
) -> DataFrame:
    """Per-stream packing summary from a ``pack_chunks`` plan: total
    tokens, number of ``budget``-token chunks the stream fills
    (ceil-divide; the final partial chunk counts), and the padding wasted
    in that final chunk — the utilization numbers a packing job reports."""
    return (
        packed.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            by, "n_docs", "total_tokens",
            F.ceil(F.col("total_tokens") / budget).alias("n_chunks"),
            (F.ceil(F.col("total_tokens") / budget) * budget
             - F.col("total_tokens")).alias("pad_tokens"),
        )
    )


def pack_bins(
    docs: DataFrame,
    tokens_col: str,
    budget: int,
    by: str = "source",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """No-split greedy (next-fit) bin packing: each document is placed
    WHOLE into the current fixed-capacity bin of its ``by`` stream, or
    opens a new bin when it doesn't fit — the packing used when documents
    must stay contiguous (SFT examples, RAG contexts), as opposed to
    ``pack_chunks``'s concat-and-cut.  A document larger than ``budget``
    gets a bin of its own (never dropped, never split).

    Returns one row per document: (id, by, n_tokens, bin) with ``bin``
    numbered 0.. within the stream, documents visited in ``order_col``
    order (default ``id_col``; pass a length-descending rank column for
    next-fit-decreasing).  ``order_col`` must be unique per stream —
    determinism rule 7.

    Scale: bin state is a running (bin, fill) pair — inherently
    sequential PER STREAM, so the stream key is the parallel unit (shard
    first; a single global stream serializes through one task, the
    documented anti-pattern).  Arrow-batched ``applyInPandas``: one
    shuffle on ``by``, O(stream) memory per task, no driver state."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    order_col = order_col or id_col
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    src_schema = docs.schema
    out_schema = StructType([
        src_schema[id_col],
        src_schema[by],
        StructField("n_tokens", LongType(), True),
        StructField("bin", LongType(), False),
    ])

    cols = list(dict.fromkeys([id_col, by, tokens_col, order_col]))
    narrow = docs.select(*cols)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        toks = pdf[tokens_col].fillna(0).astype("int64").to_numpy()
        bins = [0] * len(toks)
        b, fill = 0, 0
        for i, t in enumerate(toks):
            if fill + t > budget and fill > 0:
                b, fill = b + 1, 0
            bins[i] = b
            fill += t
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            by: pdf[by].to_numpy(),
            "n_tokens": toks,
            "bin": bins,
        })

    return narrow.groupBy(by).applyInPandas(_pack, out_schema)


def bin_stats(packed: DataFrame, budget: int, by: str = "source") -> DataFrame:
    """Packing-efficiency report from a ``pack_bins`` plan: per stream,
    the bin count, token totals, and padding waste (unused capacity in
    non-overflow bins; an oversized single-doc bin wastes nothing).
    Utilization = total_tokens / (total_tokens + pad_tokens)."""
    per_bin = (
        packed.groupBy(by, "bin")
        .agg(F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        per_bin.groupBy(by)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("fill").alias("total_tokens"),
            F.sum(F.greatest(F.lit(budget) - F.col("fill"), F.lit(0))).alias(
                "pad_tokens"
            ),
        )
        .withColumn(
            "utilization",
            F.round(
                F.col("total_tokens")
                / (F.col("total_tokens") + F.col("pad_tokens")),
                6,
            ),
        )
    )


def chunk_documents(
    docs: DataFrame,
    size: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into (overlapping) token-window chunks — the
    RAG/embedding-prep companion to ``pack_chunks``: one row per
    (doc, chunk_idx) with the chunk text and its token span.  ``stride``
    defaults to ``size`` (disjoint windows); ``stride < size`` overlaps
    consecutive chunks (context-preserving retrieval chunking).  The
    final window is the possibly-short tail; empty docs yield one empty
    chunk (their single empty token, span 0-1), so no document silently
    disappears.

    Tokenization is whitespace (split on \\s+), materialized once per
    row before the window transform (the word_shingles PERF rule).
    Map-only: explode multiplies rows, but there is no shuffle at all.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError("stride must be positive")
    toked = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks__"),
    )
    n = F.size("__toks__")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - size) / F.lit(float(stride))).cast("long") + 1,
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            (i * stride).alias("tok_start"),
            F.least(i * stride + size, n).alias("tok_end"),
            F.concat_ws(
                " ", F.slice(F.col("__toks__"), i * stride + 1, size)
            ).alias("chunk_text"),
        ),
    )
    return toked.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.tok_start").alias("tok_start"),
        F.col("c.tok_end").alias("tok_end"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
