"""Text analysis operators for document pipelines (SURVEY-extension).

All pure Column expressions (whole-stage codegen; zero Python in the data
path): token counting, character-class ratios, n-gram-free language ID via
stopword hit counting, quality scoring, and content fingerprinting.

Semantics are deliberately SQL-portable: every operator here has an exact
ANSI-SQL equivalent (see ``__spark_entry__.oracle_sql``) so results can be
hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny high-frequency stopword sets; enough to separate languages on
# honest text (deterministic + portable, unlike a model-based LID)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "une", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _class_count(text: Column, pattern: str) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, pattern, ""))


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document stats columns: n_tokens, n_chars_calc,
    punct_ratio, digit_ratio, upper_ratio, avg_token_len."""
    t = F.col(text_col)
    n_chars = F.length(t)
    safe = F.greatest(n_chars.cast("double"), F.lit(1.0))
    n_tok = token_count(t)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_calc", n_chars)
        .withColumn("punct_ratio", _class_count(t, r"[\p{Punct}]") / safe)
        .withColumn("digit_ratio", _class_count(t, r"[0-9]") / safe)
        .withColumn("upper_ratio", _class_count(t, r"[A-Z]") / safe)
        .withColumn(
            "avg_token_len",
            F.length(F.regexp_replace(t, r"\s+", ""))
            / F.greatest(n_tok.cast("double"), F.lit(1.0)),
        )
    )


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of stopword tokens of ``lang`` present (count of token
    occurrences, word-boundary anchored)."""
    words = STOPWORDS[lang]
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    ties and zero-hit documents fall back to 'und'.  Deterministic
    tie-break by language code order (de < en < es < fr)."""
    hits = {lang: stopword_hits(F.col(text_col), lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # reversed so the FIRST language in sorted order wins ties
    for lang in sorted(STOPWORDS, reverse=True):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def quality_score(df: DataFrame, text_col: str = "text", out_col: str = "quality") -> DataFrame:
    """Length/punctuation/repetition quality heuristic in [0, 1]:
    rewards mid-length documents and mostly-alphabetic content."""
    df = add_text_stats(df, text_col)
    len_score = F.least(F.col("n_tokens").cast("double") / F.lit(20.0), F.lit(1.0))
    alpha_score = F.lit(1.0) - F.least(
        (F.col("punct_ratio") + F.col("digit_ratio")) * 4.0, F.lit(1.0)
    )
    return df.withColumn(
        out_col, F.round(F.lit(0.5) * len_score + F.lit(0.5) * alpha_score, 6)
    )


# GPT-2-style pre-tokenization split, minus the `\s+(?!\S)` lookahead
# branch (RE2 — DuckDB's engine — has no lookahead; dropping it only
# changes how trailing whitespace runs group, keeping Spark(Java) and
# DuckDB(RE2) in exact agreement).
BPE_SPLIT_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (contractions, letter runs, digit runs,
    punctuation runs, whitespace) — the token-count basis that tracks
    real subword tokenizers far better than whitespace splitting."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_token_len: int = 2,
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, sklearn's smoothing).

    Scale shape: explode -> (doc, term) count (shuffle 1, map-side
    partial), term document-frequency derived FROM that aggregate (one
    more agg on term — never a distinct over raw tokens), a shuffle join
    on term to attach idf (vocab is large at corpus scale; broadcast
    would not hold), and a per-doc partial top-k window (WindowGroupLimit
    pushes the limit map-side).  The N-docs scalar rides a broadcast
    1-row cross join.  Deterministic output: score rounded to 6 before
    ranking, ties broken by term.
    """
    toks = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_token_len)
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n_docs__"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n_docs__") + F.lit(1.0))
                        / (F.col("df_t") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df_t", "tfidf", "rank")
    )


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the lowercased text with whitespace
    collapsed and non-alphanumerics stripped — stable under trivial
    formatting edits; the exact-dedup key."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " "
    )
    return F.md5(F.trim(norm))


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap quality/perplexity filter (documents
    full of rare junk tokens score low, fluent in-distribution text
    scores high; the KenLM-filter stand-in when only Spark is at hand).
    Returns (id_col, n_tokens, avg_logprob).

    Physical shape: ONE explode -> token-count groupBy (map-side
    partial) -> shuffle join of tokens to their counts (the vocabulary
    is corpus-sized at 100 TB, so no broadcast) -> per-doc aggregation.
    The corpus total rides a 1-row cross join (broadcast).  Every token
    exists in the corpus by construction, so the self-scored LM needs no
    smoothing; score EXTERNAL corpora against these counts with an
    explicit smoothing join instead."""
    from data_integration_est_spark.util import bounded_persist

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    # vocabulary-sized, read by the total AND the scoring join — persist
    # so the corpus explode+count runs once (r16; the ops/text bg
    # discipline applied to the unigram table)
    counts = bounded_persist(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("T"))
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            (F.log(F.col("c").cast("double")) - F.log(F.col("T").cast("double"))).alias(
                "lp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    interpolated bigram LM — one model-quality notch above
    :func:`unigram_logprob_scores` toward the KenLM-style perplexity
    filter: P(w|v) = lam * c(v,w)/c(v) + (1-lam) * c(w)/T (Jelinek-
    Mercer interpolation with the unigram as the backoff, so unseen
    CONTEXT never zeroes a self-scored corpus).  Repetitive/boilerplate
    text scores HIGH, incoherent token soup scores LOW — the useful
    ranking signal is the band in between.  Returns
    (id_col, n_bigrams, avg_logprob2); documents with < 2 tokens carry
    no bigram and are absent.

    Physical shape: bigrams explode from two array slices zipped (no
    Python, no per-row UDF); three keyed count joins (bigram, context,
    unigram — vocabulary-sized, so shuffle joins, NOT broadcast at
    100 TB) + the 1-row total; one per-doc aggregation.  Keep ``lam`` a
    dyadic float (0.75 default) so 1-lam is exact cross-engine.  The
    corpus-scale ``pairs`` projection is read twice (bg build + scoring
    join): r17 persists it (MEMORY_AND_DISK via the bounded registry),
    trading one disk-backed cache of the exploded pairs for the second
    tokenize+explode scan of the corpus — the r16 "honest floor" note
    reversed per the r16 verdict's item 6 (the regex tokenize is the
    expensive half, and the cache spills rather than OOMs at scale)."""
    toks_arr = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks_arr.alias("__toks__")).filter(
        F.size("__toks__") >= 2
    )
    zipped = F.arrays_zip(
        F.expr("slice(__toks__, 1, size(__toks__) - 1)"),
        F.expr("slice(__toks__, 2, size(__toks__) - 1)"),
    )
    from data_integration_est_spark.util import bounded_persist as _bp

    # consumed by the bg count build AND the scoring join — persisted so
    # the tokenize+explode runs once (r17; the bounded registry owns the
    # lazy-return lifecycle)
    pairs = _bp(base.select(
        id_col, F.explode(zipped).alias("__bg__")
    ).select(
        id_col,
        F.col("__bg__")["0"].alias("__v__"),
        F.col("__bg__")["1"].alias("__w__"),
    ))
    # ONE corpus-scale aggregation: the context (cv) and unigram (cw)
    # counts are MARGINALS of the bigram counts, so they derive from the
    # vocabulary-sized bg table instead of re-scanning the corpus (plan
    # audit r6: the naive three-groupBy form scanned the source 4x)
    from data_integration_est_spark.util import bounded_persist

    # vocabulary-sized; read by vc, wc, tot, and the join (bounded
    # registry: the lazy return cannot unpersist, r12)
    bg = bounded_persist(pairs.groupBy("__v__", "__w__").agg(
        F.count(F.lit(1)).alias("__cb__")
    ))
    vc = bg.groupBy("__v__").agg(F.sum("__cb__").alias("__cv__"))
    wc = bg.groupBy("__w__").agg(F.sum("__cb__").alias("__cw__"))
    tot = wc.agg(F.sum("__cw__").cast("double").alias("__T__"))
    lp = (
        pairs.join(bg, ["__v__", "__w__"])
        .join(vc, "__v__")
        .join(wc, "__w__")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.log(
                F.lit(lam) * F.col("__cb__") / F.col("__cv__")
                + F.lit(1.0 - lam) * F.col("__cw__") / F.col("__T__")
            ).alias("__lp__"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp__"), 6).alias("avg_logprob2"),
    )


def clean_text_expr(text: Column) -> Column:
    """Corpus text normalization as a PURE column-expression chain
    (JVM-side regex, zero Python, zero shuffle) — the C4/RefinedWeb-style
    cleanup pass:

    1. drop zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) and soft hyphens,
    2. drop C0/C1 control characters except tab/newline,
    3. normalize unicode spaces (NBSP, en/em/thin/ideographic) to ASCII,
    4. normalize curly quotes, en/em dashes, and the ellipsis to ASCII,
    5. collapse runs of spaces/tabs and trim.

    Newlines are PRESERVED (document structure feeds line-level dedup
    downstream).  Full NFKC folding needs ICU, which neither engine
    exposes as a builtin — this chain is the deterministic, SQL-portable
    subset that covers the overwhelming bulk of web-corpus dirt."""
    t = F.regexp_replace(text, "[\u200b\u200c\u200d\ufeff\u00ad]", "")
    t = F.regexp_replace(
        t, "[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f-\u009f]", ""
    )
    t = F.regexp_replace(
        t,
        "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]",
        " ",
    )
    t = F.regexp_replace(t, "[\u2018\u2019\u201a]", "'")
    t = F.regexp_replace(t, "[\u201c\u201d\u201e]", "\"")
    t = F.regexp_replace(t, "[\u2013\u2014]", "-")
    t = F.regexp_replace(t, "\u2026", "...")
    t = F.regexp_replace(t, "[ \t]{2,}", " ")
    return F.trim(t)


def clean_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Apply :func:`clean_text_expr`; adds ``out_col`` plus
    ``n_chars_removed`` (original minus cleaned length — the per-doc
    dirt measure quality dashboards track)."""
    cleaned = clean_text_expr(F.col(text_col))
    return df.withColumn(out_col, cleaned).withColumn(
        "n_chars_removed", F.length(text_col) - F.length(out_col)
    )


def trigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lams: tuple = (0.5, 0.375, 0.125),
) -> DataFrame:
    """Per-document mean trigram log-probability under the corpus's own
    Jelinek-Mercer-interpolated trigram LM — the top of the engine's LM
    quality ladder (unigram -> bigram -> trigram), the closest cheap
    stand-in for a KenLM perplexity filter that pure SQL-replayable
    counting allows:

        P(w | u, v) = l3 c(u,v,w)/c(u,v) + l2 c(v,w)/c(v) + l1 c(w)/T

    with STANDARD JM counts — trigram counts from the triple table,
    bigram counts from the PAIR table (a document's final bigram counts
    even though it heads no trigram), context/unigram counts as the
    bigram table's marginals (the r6 plan-audit pattern), so every
    denominator is the count the textbook formula names, not a trigram
    marginal.  Defaults (0.5, 0.375, 0.125) are dyadic: exact
    cross-engine.  Returns (id_col, n_trigrams, avg_logprob3);
    documents with < 3 tokens carry no trigram and are absent.

    Physical shape: two corpus-scale explode projections (triples for
    scoring + counts — PERSISTED since r17 so the double read costs one
    tokenize, not two — and pairs for the bigram counts, single-
    consumer), the tg/bg count tables persisted vocabulary-sized, four
    keyed count joins + the 1-row broadcast total, one per-doc
    aggregation."""
    l3, l2, l1 = (float(x) for x in lams)
    if abs(l3 + l2 + l1 - 1.0) > 1e-12 or min(l3, l2, l1) <= 0:
        raise ValueError("lams must be positive and sum to 1")
    toks_arr = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks_arr.alias("__toks__"))
    pairs = (
        base.filter(F.size("__toks__") >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.expr("slice(__toks__, 1, size(__toks__) - 1)"),
                    F.expr("slice(__toks__, 2, size(__toks__) - 1)"),
                )
            ).alias("__bg__"),
        )
        .select(
            id_col,
            F.col("__bg__")["0"].alias("__v__"),
            F.col("__bg__")["1"].alias("__w__"),
        )
    )
    from data_integration_est_spark.util import bounded_persist

    # consumed by the tg count build AND the scoring join — persisted so
    # the triple tokenize+explode runs once (r17, the r16 verdict's item
    # 6: the "honest floor" double-read reversed; MEMORY_AND_DISK spills
    # rather than OOMs at scale)
    triples = bounded_persist(
        base.filter(F.size("__toks__") >= 3)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.expr("slice(__toks__, 1, size(__toks__) - 2)"),
                    F.expr("slice(__toks__, 2, size(__toks__) - 2)"),
                    F.expr("slice(__toks__, 3, size(__toks__) - 2)"),
                )
            ).alias("__tg__"),
        )
        .select(
            id_col,
            F.col("__tg__")["0"].alias("__u__"),
            F.col("__tg__")["1"].alias("__v__"),
            F.col("__tg__")["2"].alias("__w__"),
        )
    )

    # read by the context join, the (v,w) join, vc, wc, tot (bounded
    # registry: the lazy return cannot unpersist, r12)
    bg = bounded_persist(pairs.groupBy("__v__", "__w__").agg(
        F.count(F.lit(1)).alias("__cb__")
    ))
    tg = triples.groupBy("__u__", "__v__", "__w__").agg(
        F.count(F.lit(1)).alias("__ct__")
    )
    vc = bg.groupBy("__v__").agg(F.sum("__cb__").alias("__cv__"))
    wc = bg.groupBy("__w__").agg(F.sum("__cb__").alias("__cw__"))
    tot = wc.agg(F.sum("__cw__").cast("double").alias("__T__"))
    ctx = bg.select(
        F.col("__v__").alias("__u__"),
        F.col("__w__").alias("__v__"),
        F.col("__cb__").alias("__cuv__"),
    )
    lp = (
        triples.join(tg, ["__u__", "__v__", "__w__"])
        .join(ctx, ["__u__", "__v__"])
        .join(bg, ["__v__", "__w__"])
        .join(vc, "__v__")
        .join(wc, "__w__")
        .crossJoin(F.broadcast(tot))
        .select(
            id_col,
            F.log(
                F.lit(l3) * F.col("__ct__") / F.col("__cuv__")
                + F.lit(l2) * F.col("__cb__") / F.col("__cv__")
                + F.lit(l1) * F.col("__cw__") / F.col("__T__")
            ).alias("__lp__"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(F.avg("__lp__"), 6).alias("avg_logprob3"),
    )


def line_language_mix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
) -> DataFrame:
    """Per-LINE language identification rolled up to a per-document
    language-mixture profile — the multilingual-curation signal document
    -level lang ID misses (a page that is half English boilerplate and
    half target-language content): explode lines, run the stopword
    language heuristic per line, and summarize per document as

      (id_col, n_lines, main_lang, n_langs, lang_entropy)

    with ``main_lang`` the modal per-line prediction (ties break by
    language code ascending), ``lang_entropy`` the Shannon entropy (nats)
    of the per-line prediction distribution — 0 = monolingual, ln(k) =
    uniform over k codes.  Blank lines are excluded.

    Physical shape: one explode -> per-line column-expression heuristic
    (no Python) -> ONE (doc, lang) groupBy -> ONE doc groupBy using the
    entropy identity H = ln(n) - sum(c ln c)/n (no second pass for the
    total) and a struct-min for the deterministic mode."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), line_sep, -1)).alias("__line__"),
    ).filter(F.trim(F.col("__line__")) != "")
    lid = language_id(lines, "__line__", "__lp__")
    counts = lid.groupBy(id_col, "__lp__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    c = F.col("__c__").cast("double")
    return counts.groupBy(id_col).agg(
        F.sum("__c__").alias("n_lines"),
        F.min(
            F.struct((-F.col("__c__")).alias("nc"), F.col("__lp__").alias("lp"))
        )["lp"].alias("main_lang"),
        F.count(F.lit(1)).alias("n_langs"),
        F.round(
            F.log(F.sum(c)) - F.sum(c * F.log(c)) / F.sum(c), 6
        ).alias("lang_entropy"),
    )
