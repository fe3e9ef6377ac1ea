"""Distributed BPE (byte-pair-encoding) vocabulary learning + apply.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016; the word-frequency formulation HF ``tokenizers`` uses): merges are
learned from the corpus WORD-FREQUENCY table, not the raw token stream —
at 100 TB the word table is vocabulary-sized (millions of rows), so
every merge iteration is a small aggregation over it while the corpus
itself is scanned exactly once.

Representation: each word's current segmentation is a SPACE-JOINED
symbol string (``"h e l l o"``); a merge (a, b) -> ab is one literal
string replace of ``" a b "`` inside the space-padded representation —
left-to-right non-overlapping, exactly BPE's greedy application order,
and replayable verbatim in any SQL engine (the gate oracle unrolls the
iterations as chained CTEs).

Per merge iteration: ONE pair-count aggregation (adjacent symbol pairs
exploded from the representation, weighted by word count) + a driver-side
argmax with deterministic (count desc, pair asc) tie-break + one
projection applying the replace.  K merges = K passes over the
vocabulary table; the table is persisted and re-checkpointed every
``checkpoint_every`` merges so the projection chain stays shallow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace-split words — the BPE training input.
    One explode + one groupBy; the only pass over the full corpus."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_rep(word: Column) -> Column:
    """Initial symbolization: characters space-joined ("hello" ->
    "h e l l o")."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def _merge_rep(rep: Column, a: str, b: str) -> Column:
    """Apply merge (a, b): literal replace of ' a b ' with ' ab ' inside
    the space-padded representation (greedy left-to-right)."""
    padded = F.concat(F.lit(" "), rep, F.lit(" "))
    merged = F.replace(
        padded, F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
    )
    return F.trim(merged)


def _adjacent_pairs():
    """(left, right) adjacent symbol pairs of the ``rep`` column."""
    return F.arrays_zip(
        F.expr("slice(split(rep, ' '), 1, size(split(rep, ' ')) - 1)"),
        F.expr("slice(split(rep, ' '), 2, size(split(rep, ' ')) - 1)"),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    checkpoint_every: int = 16,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns ``(merges, words)``: merges as [(left, right, pair_count)]
    in learned order, and the final (word, cnt, rep) vocabulary table
    with each word's segmentation under the learned merges.  Ties in
    pair counts break deterministically by (left, right) ascending, so
    the merge list is engine-reproducible (the gate oracle replays it).
    Stops early when no adjacent pair remains (every word fused)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    words = word_frequencies(df, text_col).withColumn(
        "rep", _char_rep(F.col("word"))
    ).persist()
    words.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for k in range(num_merges):
            pairs = (
                words.filter(F.size(F.split(F.col("rep"), " ")) >= 2)
                .select("cnt", F.explode(_adjacent_pairs()).alias("p"))
                .groupBy(
                    F.col("p")["0"].alias("a"), F.col("p")["1"].alias("b")
                )
                .agg(F.sum("cnt").alias("n"))
            )
            top = pairs.orderBy(
                F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
            ).limit(1).collect()
            if not top:
                break
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((a, b, n))
            new_words = words.withColumn("rep", _merge_rep(F.col("rep"), a, b))
            if (k + 1) % checkpoint_every == 0:
                new_words = new_words.localCheckpoint(eager=True)
                try:
                    words.rdd.unpersist(False)
                except Exception:
                    pass
            words = new_words
        return merges, words
    finally:
        pass  # `words` stays cached/checkpointed — it IS the result


def bpe_segment(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per-word character
    symbolization followed by the merges IN ORDER — a pure column-
    expression chain (K literal replaces; zero Python per row), exploded
    back to an array of subword tokens per document."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    segmented = F.transform(
        toks,
        lambda w: F.split(
            _apply_merges_to_word(w, merges), " "
        ),
    )
    return df.withColumn(out_col, F.flatten(segmented))


def _apply_merges_to_word(word: Column, merges: list[tuple]) -> Column:
    rep = F.trim(F.regexp_replace(word, "(.)", "$1 "))
    for m in merges:
        a, b = m[0], m[1]
        rep = F.trim(
            F.replace(
                F.concat(F.lit(" "), rep, F.lit(" ")),
                F.lit(f" {a} {b} "),
                F.lit(f" {a}{b} "),
            )
        )
    return rep
