"""Temperature-based source mixing — corpus composition reweighting.

LLM pre-training corpora are mixtures of sources with wildly unequal
sizes; sampling sources proportional to ``p_s^alpha`` (``alpha < 1``
up-weights small, high-quality sources; ``alpha = 1`` is natural
frequency) is the standard recipe (multilingual BERT's exponent-smoothed
sampling; Llama/Pile mixture weights).  The reference repo has no
analogue; this extends the engine's LLM-data-pipeline surface.

Scale design: the mixture solve touches only the per-source count table
(#sources rows — driver-tiny), broadcast back as a join; membership is a
deterministic per-row hash-uniform against the source's acceptance rate,
so the sample needs NO shuffle of the corpus at all — one broadcast join
+ filter, fully map-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash — the engine's deterministic uniform; the
# modulus keeps u on a 1e-6 grid so any SQL engine reproduces it exactly.
_HASH_MULT = 2654435761
_HASH_MOD = 1_000_000


def source_mixture(
    docs: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-source mixture table: natural share ``p``, temperature share
    ``q ∝ p^alpha``, and the per-source acceptance ``rate`` that realizes
    ``q`` over an expected ``target_frac`` of the corpus, capped at 1
    (a small source cannot be sampled above its full size; the cap is the
    standard practical compromise — rates are NOT renormalized after
    capping, matching the simple one-pass recipe)."""
    from data_integration_est_spark.util import bounded_persist

    # O(sources) rows, read by the totals AND the main side (and by
    # every caller composing mixture + sample over the same corpus —
    # the semanticHash-keyed registry shares one cache entry): without
    # the persist each evaluation re-ran the corpus groupBy (r16)
    counts = bounded_persist(
        docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_s"))
    )
    tot = counts.agg(
        F.sum("n_s").alias("N"),
        F.sum(F.pow(F.col("n_s"), F.lit(alpha))).alias("Z"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_s",
            F.round(F.col("n_s") / F.col("N"), 6).alias("p"),
            F.round(F.pow(F.col("n_s"), F.lit(alpha)) / F.col("Z"), 6).alias("q"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.pow(F.col("n_s"), F.lit(alpha)) / F.col("Z")
                    * F.lit(target_frac) * F.col("N") / F.col("n_s"),
                ),
                6,
            ).alias("rate"),
        )
    )


_INTEGRAL_TYPES = ("byte", "short", "integer", "long")


def _hash_uniform(id_col: str, fn_name: str, id_type: str):
    """Deterministic hash-uniform u(id) in [0, 1) from an INTEGRAL id.

    The id is reduced mod ``_HASH_MOD`` BEFORE the Knuth multiply so the
    intermediate stays <= 1e6 * 2654435761 ~ 2.7e15, far inside int64 —
    a raw ``id * mult`` overflows (and silently wraps under non-ANSI
    Spark while DuckDB promotes to HUGEINT) for ids >= ~3.47e9, breaking
    the bit-for-bit cross-engine claim at scale.  Mathematically
    identical to the unreduced form: (id*M) mod m == ((id mod m)*M) mod m.
    Float/double ids are refused too: ``%`` on them is floating modulo,
    not the documented integer-exact hash."""
    if id_type not in _INTEGRAL_TYPES:
        raise TypeError(
            f"{fn_name}: id column {id_col!r} has type {id_type!r}; the "
            "deterministic hash-uniform needs an INTEGRAL id (map string "
            "or fractional ids to an integer hash first)"
        )
    reduced = F.col(id_col).cast("long") % F.lit(_HASH_MOD)
    return ((reduced * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)).cast(
        "double"
    ) / float(_HASH_MOD)


def temperature_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Deterministic temperature-weighted corpus sample: keep a row iff
    its hash-uniform ``u(id) < rate(source)``.  Same rows on every run
    and every engine; expected composition follows ``p^alpha``."""
    # a string id would make the multiplicative hash NULL and the
    # filter silently drop EVERY row — refuse loudly instead.  The
    # hash must stay SQL-replicable (cross-engine oracle), so we
    # don't fall back to an engine-specific hash of strings here;
    # callers with string ids should pre-map them to a numeric id
    # (e.g. xxhash64) and accept engine-specific sampling.
    u = _hash_uniform(
        id_col, "temperature_sample", docs.schema[id_col].dataType.typeName()
    )
    mix = source_mixture(docs, source_col, alpha, target_frac).select(
        source_col, "rate"
    )
    return (
        docs.join(F.broadcast(mix), source_col)
        .filter(u < F.col("rate"))
        .drop("rate")
    )


def cap_per_key(
    docs: DataFrame,
    key_col: str = "source",
    n_max: int = 1000,
    order_col: str = "doc_id",
    descending: bool = False,
) -> DataFrame:
    """Cap the number of rows per key — the domain/source-cap step of web
    corpus curation (an over-crawled domain must not dominate the
    mixture; RefinedWeb-style pipelines cap docs per registered domain).
    Keeps the first ``n_max`` rows of each key ordered by ``order_col``
    (deterministic — rank by quality score descending, or by id for a
    stable arbitrary cap); drops the rest.

    Physical shape: ONE shuffle on ``key_col`` feeding a ranked window;
    Spark inserts WindowGroupLimit (partial per-partition top-n) below
    the exchange, so shuffle volume is O(keys x n_max) when partitions
    hold more than n_max rows of a key, not O(rows)."""
    from pyspark.sql import Window

    # order_col must rank uniquely within a key (an id, or a quality
    # score tie-broken into the column beforehand) — row_number over ties
    # would be partition-order-dependent, breaking determinism rule 7.
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(key_col).orderBy(order)
    return (
        docs.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n_max)
        .drop("__rn__")
    )


def hash_split(
    docs: DataFrame,
    fractions: dict,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the corpus-prep split
    that must be STABLE under reprocessing (a doc must never migrate
    between train and eval across pipeline runs, or contamination checks
    are meaningless).  Each row's split comes from the engine's
    hash-uniform of its id against cumulative fraction cuts, so the
    assignment is a pure map (no shuffle, no sampling state) and any
    engine with 64-bit integers reproduces it bit-for-bit.

    ``fractions`` maps split name -> fraction; must sum to 1 (1e-9
    tolerance).  Integral ids only (same contract as temperature_sample —
    map string ids through an integer hash first)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("need at least one split")
    u = _hash_uniform(
        id_col, "hash_split", docs.schema[id_col].dataType.typeName()
    )
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += float(fractions[name])
        cond = u < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return docs.withColumn(out_col, expr)


def keep_top_fraction(
    docs: DataFrame,
    score_col: str,
    frac: float,
    key_cols: list[str] | str | None = None,
    tiebreak_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Keep the top ``frac`` of rows BY SCORE within each key group —
    the per-partition quality cut of FineWeb/DCLM-style curation:
    heuristic or classifier scores are only comparable within a crawl
    dump / source, so the threshold must be a per-group quantile, not a
    global constant.  Keeps ``ceil(frac * n_group)`` rows (every
    non-empty group retains at least one row), ranked by
    (score desc, tiebreak asc) — fully deterministic under ties, so any
    SQL engine replays the exact survivor set.

    Physical shape: ONE shuffle on the key feeding a single window that
    computes rank and group size together; no second pass, no driver
    quantile table.  At 100 TB this is the same cost class as
    ``cap_per_key`` (O(rows) shuffle once; no WindowGroupLimit prune
    here because the cut depends on n_group, unknown until the group
    assembles).  ``key_cols=None`` ranks the WHOLE corpus in one window
    partition — a single-task sort, small-data convenience only; at
    scale always cut per source/dump (which is also the statistically
    right thing), or derive a global threshold from
    ``kernels.quantile.svyquantile`` and filter by it."""
    if not (0.0 < frac <= 1.0):
        raise ValueError("frac must be in (0, 1]")
    keys = (
        [key_cols] if isinstance(key_cols, str)
        else list(key_cols) if key_cols else []
    )
    from pyspark.sql import Window

    score = F.col(score_col).desc() if descending else F.col(score_col).asc()
    w = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).orderBy(score, F.col(tiebreak_col).asc())
    wall = (
        Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        docs.withColumn("__rn__", F.row_number().over(w))
        .withColumn("__n__", F.count(F.lit(1)).over(wall))
        .filter(F.col("__rn__") <= F.ceil(F.col("__n__") * F.lit(float(frac))))
        .drop("__rn__", "__n__")
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
    order_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the training-data
    EMISSION step: pre-training wants documents in a pseudo-random order
    that is STABLE under reprocessing (resumable jobs, reproducible
    runs) and cluster-size-independent, which ``orderBy(rand())`` is
    not.  Every row gets a hash-derived order key
    ``k = ((id mod m) * M + seed * 7919) mod m`` (the engine's Knuth
    mix — integer-exact in any 64-bit engine), its shard
    ``k mod n_shards``, and its position within the shard (ordered by
    (k, id) — fully deterministic under hash ties).

    Physical shape: ONE shuffle on the shard key feeding the position
    window — exactly the repartition a sharded writer needs anyway
    (follow with ``.write.partitionBy(shard)``; the rows arrive already
    ordered).  Changing ``seed`` reshuffles; changing the cluster does
    not."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    id_type = docs.schema[id_col].dataType.typeName()
    if id_type not in _INTEGRAL_TYPES:
        raise TypeError(
            f"shuffle_shards: id column {id_col!r} has type {id_type!r}; "
            "integral ids only (same contract as hash_split)"
        )
    from pyspark.sql import Window

    k = (
        (F.col(id_col).cast("long") % F.lit(_HASH_MOD)) * F.lit(_HASH_MULT)
        + F.lit(int(seed) * 7919)
    ) % F.lit(_HASH_MOD)
    out = docs.withColumn("__k__", k).withColumn(
        shard_col, (F.col("__k__") % F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.col("__k__").asc(), F.col(id_col).asc()
    )
    return out.withColumn(order_col, F.row_number().over(w)).drop("__k__")


def token_budget_mixture(
    docs: DataFrame,
    token_col: str,
    source_col: str = "source",
    alpha: float = 0.5,
    budget_tokens: float | None = None,
) -> DataFrame:
    """Token-budget mixing math — the planning step of assembling a
    pre-training mix (the Llama/Dolma recipe written down): given
    per-source token counts, temperature-smooth the natural shares
    (``q_s ∝ tokens_s^alpha``), allocate ``budget_tokens`` by ``q_s``,
    and report each source's EPOCH factor

        epochs_s = target_s / tokens_s

    — < 1 means subsample at that rate, > 1 means repeat the source
    (the standard small-high-quality-source upsampling); the 1-epoch
    boundary is exactly where ``temperature_sample``'s acceptance-rate
    cap bites.  ``budget_tokens=None`` defaults to the corpus total
    (pure re-mixing).  One aggregation over the corpus; everything else
    is arithmetic on the O(sources) table."""
    from data_integration_est_spark.util import bounded_persist

    # O(sources) rows, read by the totals AND the main side (r16)
    counts = bounded_persist(docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("double")).alias("tokens"),
    ))
    tot = counts.agg(
        F.sum("tokens").alias("T"),
        F.sum(F.pow(F.col("tokens"), F.lit(alpha))).alias("Z"),
    )
    budget = F.lit(float(budget_tokens)) if budget_tokens is not None \
        else F.col("T")
    q = F.pow(F.col("tokens"), F.lit(alpha)) / F.col("Z")
    target = q * budget
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            F.col("tokens").cast("long").alias("tokens"),
            F.round(F.col("tokens") / F.col("T"), 6).alias("p"),
            F.round(q, 6).alias("q"),
            F.round(target, 6).alias("target_tokens"),
            F.round(target / F.col("tokens"), 6).alias("epochs"),
        )
    )
