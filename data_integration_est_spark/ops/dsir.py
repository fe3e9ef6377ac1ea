"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) as a Spark-native operator chain.

The problem: given a huge RAW corpus and a small TARGET corpus that
looks like the data you actually want (e.g. curated wiki/books), select
the raw examples whose distribution matches the target.  DSIR's recipe:

1. featurize every document into hashed n-gram counts (unigrams +
   bigrams hashed into B buckets — the classic hashing trick);
2. fit bag-of-buckets models on both corpora: p (target), q (raw),
   with add-alpha smoothing;
3. per raw document, the log importance weight is the score under the
   likelihood ratio:  log w = sum_b c_b * (log p_b - log q_b);
4. sample k documents WITHOUT replacement with probability
   proportional to softmax(log w) — the Gumbel top-k trick (Vieira
   2014): add an independent Gumbel(0,1) to each log weight and take
   the k largest keys.

Spark-first shapes, no Python in the hot path:
- featurization is one split + slice/zip (the ``ops/text`` bigram
  idiom) + ONE explode, then a map-side-combined groupBy into
  (doc, bucket, c) — the exploded stream never materializes;
- the bucket log-ratio table has at most B rows (B = 2^12..2^20):
  BROADCAST-joined to the per-doc features, so scoring a 100 TB raw
  corpus is one scan + one per-doc aggregation;
- Gumbel noise is DETERMINISTIC here: u = (hash60(id)+0.5)/2^60 from
  the portable md5 hash (``ops/sketches``), so the same selection
  reproduces in any engine — seeded variation goes through ``salt``;
- top-k by (log w + gumbel) is orderBy + limit, which Catalyst plans
  as TakeOrderedAndProject: per-partition heaps, no global sort.

Cites: reference has no data-selection surface; this extends the
engine's LLM-pipeline layer (quality/domain selection ahead of
tokenization, the importance-resampling notch above the
``ops/quality_model`` classifier cut).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_est_spark.ops.sketches import _HASH_BITS, _hash60


def _feature_array(text: Column) -> Column:
    """Unigram + bigram feature strings from whitespace tokenization —
    lowercased, bigrams joined with a single space.  Pure array ops
    (split, slice, zip_with, concat): one pass, no explode here."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    big = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.filter(F.concat(toks, big), lambda t: t != "")


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Hashed unigram+bigram counts: (id_col..., bucket, c) — or corpus
    marginals (bucket, c) when ``id_col`` is None.  Bucket =
    md5-hash60(feature) mod B, portable across engines.  ONE explode +
    one map-side-combined groupBy."""
    if not (16 <= n_buckets <= (1 << 20)):
        raise ValueError("n_buckets must be in [16, 2^20]")
    keys = [id_col] if id_col else []
    feats = df.select(
        *keys, F.explode(_feature_array(F.col(text_col))).alias("__f__")
    ).select(*keys, (_hash60(F.col("__f__")) % n_buckets).alias("bucket"))
    return feats.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def dsir_bucket_logratio(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    n_buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bucket log(p_target / q_raw) with add-alpha smoothing:
    log((ct+a)/(Tt+aB)) - log((cr+a)/(Tr+aB)).  Inputs are corpus
    marginals (bucket, c); output is at most B rows — broadcast it.
    Buckets absent from BOTH corpora are absent here too; they carry
    the all-smoothing ratio log((Tr+aB)/(Tt+aB)), which scorers apply
    via coalesce (a raw document's buckets always exist in the raw
    marginals, so the default only matters when scoring external
    text)."""
    from pyspark.sql import Window

    t = target_counts.groupBy("bucket").agg(F.sum("c").alias("ct"))
    r = raw_counts.groupBy("bucket").agg(F.sum("c").alias("cr"))
    both = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cr", F.lit(0)).alias("cr"),
    )
    # corpus totals via a whole-frame window over the <= B-row bucket
    # table, NOT a crossJoin(broadcast(agg)) — the broadcast form
    # evaluated the ``both`` lineage (and therefore BOTH corpus
    # featurization passes feeding it) twice, once for the totals and
    # once for the main side (r16; exact: the sums are integer).  A
    # single-partition window over <= 2^20 rows is trivial.  ADVICE
    # r16: the keyless partitionBy() funnels the bucket table onto one
    # task (and logs Spark's "No Partition Defined" warning) — accepted
    # deliberately because n_buckets is bounded by construction (the
    # hashed-feature space, default 4096, <= 2^20 documented); if
    # n_buckets is ever raised past that, collect the two integer
    # totals from the persisted ``both`` instead.
    wall = Window.partitionBy()
    ab = float(alpha) * n_buckets
    return both.select(
        "bucket",
        (
            F.log(
                (F.col("ct") + alpha)
                / (F.sum("ct").over(wall).cast("double") + ab)
            )
            - F.log(
                (F.col("cr") + alpha)
                / (F.sum("cr").over(wall).cast("double") + ab)
            )
        ).alias("log_ratio"),
    )


def dsir_importance_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-document DSIR log importance weight:
    (id_col, n_feats, log_w) with log_w = sum_b c_b * log_ratio_b.
    Raw documents with zero features (empty text) are absent, like any
    n-gram scorer.  The ratio table is broadcast; the per-doc feature
    table is consumed TWICE (raw marginals feeding the ratio build,
    then the scoring join), so it is ``bounded_persist``-ed here — the
    cached (doc, bucket, c) aggregate is orders of magnitude smaller
    than the corpus, while recomputing it would re-tokenize and
    re-md5-hash every unigram+bigram of the raw corpus a second time
    (r16; guide §5 persist-on-reuse)."""
    # loud check, engine convention: a featureless target makes every
    # log ratio the same smoothing constant and the "selection" a
    # uniform Gumbel shuffle — never what the caller meant.  Checked on
    # the RAW text (any non-whitespace text yields >= 1 unigram), so
    # the probe is a limit-1 filter scan that never featurizes or
    # shuffles — the featurization below still runs exactly once.
    if (
        target_df.filter(F.trim(F.col(text_col)) != "").limit(1).count()
        == 0
    ):
        raise ValueError(
            "dsir_importance_weights: target corpus has no features "
            "(empty or all-empty text) — weights would be constant"
        )
    from data_integration_est_spark.util import bounded_persist

    doc_feats = bounded_persist(
        hashed_ngram_features(raw_df, text_col, id_col, n_buckets)
    )
    raw_marg = doc_feats.groupBy("bucket").agg(F.sum("c").alias("c"))
    tgt_marg = hashed_ngram_features(target_df, text_col, None, n_buckets)
    ratio = dsir_bucket_logratio(raw_marg, tgt_marg, n_buckets, alpha)
    return (
        doc_feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("log_ratio")).alias("log_w"),
        )
    )


def gumbel_key(
    logw_col: str | Column, id_col: str | Column, salt: str = ""
) -> Column:
    """log w + Gumbel(0,1) with the Gumbel drawn DETERMINISTICALLY from
    the portable hash of the id (+ optional salt): u in (0,1) open on
    both ends (the +0.5 offset keeps log(-log(u)) finite), g =
    -log(-log(u)).  Ordering by this key descending and keeping k is
    exactly sampling k without replacement proportional to
    softmax(log w) over the independent-Gumbel race."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(idc.cast("string"), F.lit(salt)) if salt else idc
    u = (_hash60(key).cast("double") + 0.5) / float(1 << _HASH_BITS)
    g = -F.log(-F.log(u))
    lw = F.col(logw_col) if isinstance(logw_col, str) else logw_col
    return lw + g


def dsir_resample(
    weights_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "log_w",
    salt: str = "",
    key_col: str = "gumbel_key",
) -> DataFrame:
    """Gumbel top-k selection: the k rows with the largest
    log_w + Gumbel(hash(id)) keys — sampling without replacement
    proportional to softmax(log_w), reproducible across engines.
    Catalyst plans orderBy+limit as TakeOrderedAndProject (per-partition
    top-k heaps then a k-row merge on the driver side of the exchange —
    no full sort, no skew sensitivity)."""
    if k <= 0:
        raise ValueError("k must be positive")
    keyed = weights_df.withColumn(
        key_col, gumbel_key(logw_col, id_col, salt)
    )
    return keyed.orderBy(F.col(key_col).desc(), F.col(id_col)).limit(k)


def dsir_resample_by(
    weights_df: DataFrame,
    k: int,
    group_cols: list[str] | str,
    id_col: str = "doc_id",
    logw_col: str = "log_w",
    salt: str = "",
    key_col: str = "gumbel_key",
) -> DataFrame:
    """Per-group Gumbel top-k: the k largest keys WITHIN each group —
    per-source/per-domain selection quotas (the practical DSIR
    deployment: global selection lets one dominant source eat the
    whole budget).  Same deterministic race as :func:`dsir_resample`,
    restarted independently per group.

    Physical shape: one rank window partitioned by the group, which
    Spark 3.5+ executes as WindowGroupLimit — per-partition top-k
    heaps BEFORE the exchange, so the shuffle carries at most
    k * n_groups * shuffle_parallelism rows, not the corpus."""
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    keyed = weights_df.withColumn(
        key_col, gumbel_key(logw_col, id_col, salt)
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col(key_col).desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )
