"""Collocation mining — PMI / NPMI bigram association over a corpus.

The phrase-vocabulary prep step of a tokenizer/embedding pipeline
(Mikolov et al. 2013 word2vec phrases; Bouma 2009 NPMI): a bigram whose
joint probability far exceeds the product of its parts ("new york",
"machine learning") is a collocation worth fusing into one token.

    pmi(v, w)  = ln( p(v,w) / (p(v) p(w)) )
    npmi(v, w) = pmi / (-ln p(v,w))            # normalized to [-1, 1]

with p(v,w) = n_vw / N_pairs over adjacent pairs and p(v), p(w) token
frequencies over the token stream — the standard estimator; the
``min_count`` floor kills the low-count noise that PMI otherwise
amplifies (rare pairs trivially look "associated").

Spark shape: ONE tokenize pass (the ``ops/text`` slice/zip bigram
idiom) exploded into pairs; pair counts are a map-side-combined
groupBy; the unigram marginals DERIVE from the pair table (first/last
token sums + edge corrections would complicate cross-engine parity, so
marginals count the token stream directly — a second explode over the
same scan, fused by Catalyst where possible); the two scalar totals
ride 1-row broadcasts.  ``top_k`` plans as TakeOrderedAndProject.

Cites: reference has no text surface; engine LLM-pipeline extension
(sits beside the n-gram LM quality ladder in ``ops/text``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus collocations: (v, w, n_pair, n_v, n_w, pmi, npmi), pairs
    with ``n_pair >= min_count``, optionally the ``top_k`` by NPMI
    (ties broken by (v, w) for determinism).  Tokenization is the
    engine's whitespace-lowercase convention."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    toks_arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(toks_arr.alias("__t__")).filter(
        (F.size("__t__") >= 1) & (F.element_at("__t__", 1) != "")
    )

    from data_integration_est_spark.util import bounded_persist

    toks = base.select(F.explode("__t__").alias("v"))
    # vocabulary-sized, read THREE times (n_tokens total + the n_v and
    # n_w joins) — persist so the corpus explode+count runs once (r16)
    uni = bounded_persist(
        toks.groupBy("v").agg(F.count(F.lit(1)).alias("n_tok"))
    )
    n_tokens = uni.agg(F.sum("n_tok").cast("double").alias("__T__"))

    zipped = F.arrays_zip(
        F.expr("slice(__t__, 1, size(__t__) - 1)"),
        F.expr("slice(__t__, 2, size(__t__) - 1)"),
    )
    pairs = (
        base.filter(F.size("__t__") >= 2)
        .select(F.explode(zipped).alias("__p__"))
        .select(
            F.col("__p__")["0"].alias("v"), F.col("__p__")["1"].alias("w")
        )
    )
    # pair-vocabulary-sized, read twice (n_pairs total + the main side)
    pc = bounded_persist(
        pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("n_pair"))
    )
    n_pairs = pc.agg(F.sum("n_pair").cast("double").alias("__P__"))

    out = (
        pc.filter(F.col("n_pair") >= min_count)
        .join(uni.withColumnRenamed("n_tok", "n_v"), "v")
        .join(
            uni.withColumnRenamed("n_tok", "n_w")
            .withColumnRenamed("v", "w"),
            "w",
        )
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_tokens))
    )
    p_vw = F.col("n_pair") / F.col("__P__")
    pmi = F.log(
        p_vw / ((F.col("n_v") / F.col("__T__")) * (F.col("n_w") / F.col("__T__")))
    )
    npmi = pmi / (-F.log(p_vw))
    out = out.select(
        "v", "w", "n_pair", "n_v", "n_w",
        F.round(pmi, 6).alias("pmi"),
        F.round(npmi, 6).alias("npmi"),
    )
    if top_k is not None:
        if top_k < 1:
            raise ValueError("top_k must be >= 1")
        out = out.orderBy(F.desc("npmi"), "v", "w").limit(top_k)
    return out
