"""Fellegi–Sunter probabilistic record linkage with EM-estimated
match/unmatch probabilities (Fellegi & Sunter 1969; Winkler 1988 EM).

The reference integrates two samples on EXACT keys (``RegDI2.R:68-101``
joins ``id_var_A = id_var_B``) and the engine already has blocked
edit-distance linkage (``ops/linkage.py``).  This module adds the
standard probabilistic layer used when neither exact keys nor a single
string distance suffices: per-field agreement indicators on candidate
pairs, a latent match/non-match mixture fit by EM, and per-pattern
match weights.

Spark-first decomposition (the textbook algorithm is a driver-side EM
over the TINY pattern table, never over pairs):

  1. ONE ``groupBy`` over candidate pairs on the k binary agreement
     columns → at most 2^k pattern rows with counts.  This is the only
     corpus-scale pass; it shuffles the (≤2^k)-row partial-aggregate
     table, not the pairs.
  2. EM over the pattern-count table on the driver (numpy float64,
     O(n_iter · 2^k · k) — microseconds).  Conditional-independence
     model: P(pattern | M) = Π m_j^γ_j (1-m_j)^(1-γ_j), same for U
     with u_j; mixing weight p.
  3. Per-pattern posterior P(M | pattern) and the composite log2
     match weight; classification joins the ≤2^k-row weight table back
     to the pairs — a broadcast join by construction.

At 100 TB the cost profile is exactly one keyed shuffle of partial
pattern counts plus a broadcast; the EM itself is independent of corpus
size.  Every arithmetic step (agreement products left-to-right in
column order, ratio updates) is replayed verbatim by the unrolled-EM
SQL oracle in ``entry_queries._fs_em_sql``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from data_integration_est_spark.util import local_df


@dataclass(frozen=True)
class FSModel:
    """Fitted Fellegi–Sunter parameters.

    ``m``/``u``: per-field P(agree | match) / P(agree | non-match), in
    ``agree_cols`` order.  ``p``: match prevalence among candidate
    pairs.  ``patterns``: one dict per observed agreement pattern with
    the pattern's indicator values, pair count, posterior match
    probability and log2 match weight.
    """

    agree_cols: tuple
    m: tuple
    u: tuple
    p: float
    patterns: tuple
    n_iter: int

    def weight_table(self, spark) -> DataFrame:
        """The per-pattern weights as a (≤2^k)-row DataFrame, suitable
        for a broadcast join back onto the candidate pairs."""
        rows = [
            tuple(int(g) for g in pat["gamma"])
            + (int(pat["n_pairs"]), float(pat["posterior"]), float(pat["log2_weight"]))
            for pat in self.patterns
        ]
        cols = list(self.agree_cols) + ["n_pairs", "posterior", "log2_weight"]
        return local_df(spark, rows, cols)


def _em_on_counts(
    counts: list,
    k: int,
    n_iter: int,
    init_m: float,
    init_u: float,
    init_p: float,
) -> tuple:
    """EM over (gamma, n) pattern counts.  Pure float64 Python in the
    SAME evaluation order as the SQL oracle: the class-conditional
    likelihood is a left-to-right product over fields, the M-step
    ratios are plain sums over patterns."""
    # Probabilities are clamped to [eps, 1-eps] after every M-step: a
    # degenerate field (never/always agreeing within a class) otherwise
    # drives m/u/p to an exact 0 or 1, which zeroes a pattern's total
    # mass (a + b == 0 -> ZeroDivision) and breaks the log2 match
    # weights downstream (round-9 ADVICE).  eps = 1e-12 is far below
    # any real-data frequency, so non-degenerate fits are unaffected.
    eps = 1e-12
    clamp = lambda v: min(max(v, eps), 1.0 - eps)  # noqa: E731
    m = [clamp(init_m)] * k
    u = [clamp(init_u)] * k
    p = clamp(init_p)
    for _ in range(n_iter):
        sw = swn = 0.0
        sm = [0.0] * k
        su = [0.0] * k
        n_tot = 0.0
        for gamma, n in counts:
            a = p
            b = 1.0 - p
            for j in range(k):
                a *= m[j] if gamma[j] else 1.0 - m[j]
                b *= u[j] if gamma[j] else 1.0 - u[j]
            if a + b <= 0.0:
                raise ValueError(
                    "Fellegi-Sunter EM: pattern "
                    f"{''.join(map(str, gamma))} has zero mass under "
                    "both classes — degenerate initialization or data"
                )
            w = a / (a + b)
            sw += n * w
            swn += n * (1.0 - w)
            n_tot += n
            for j in range(k):
                if gamma[j]:
                    sm[j] += n * w
                    su[j] += n * (1.0 - w)
        if sw <= 0.0 or swn <= 0.0:
            raise ValueError(
                "Fellegi-Sunter EM collapsed: all pair mass assigned "
                "to one class (sw=%r, swn=%r) — the comparison vectors "
                "carry no match/non-match contrast" % (sw, swn)
            )
        m = [clamp(sm[j] / sw) for j in range(k)]
        u = [clamp(su[j] / swn) for j in range(k)]
        p = clamp(sw / n_tot)
    return m, u, p


def fs_em(
    pairs: DataFrame,
    agree_cols: list,
    n_iter: int = 20,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.5,
) -> FSModel:
    """Fit the Fellegi–Sunter mixture on candidate pairs.

    ``pairs`` must carry one 0/1 (int-castable) column per comparison
    field; build them upstream with whatever comparators fit the data
    (exact equality, thresholded ``levenshtein``, phonetic codes — see
    ``ops/linkage.py`` for blocked candidate generation).  Returns the
    fitted :class:`FSModel`.
    """
    if not agree_cols:
        raise ValueError("fs_em needs at least one agreement column")
    k = len(agree_cols)
    rows = (
        pairs.groupBy(*[F.col(c).cast("int").alias(c) for c in agree_cols])
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .collect()
    )
    for r in rows:
        for c in agree_cols:
            if r[c] is None or r[c] not in (0, 1):
                raise ValueError(
                    f"agreement column '{c}' must be 0/1 and non-null; "
                    f"got {r[c]!r}"
                )
    counts = sorted(
        (tuple(int(r[c]) for c in agree_cols), float(r["n_pairs"])) for r in rows
    )
    m, u, p = _em_on_counts(counts, k, n_iter, init_m, init_u, init_p)

    import math

    patterns = []
    for gamma, n in counts:
        a = p
        b = 1.0 - p
        lw = 0.0
        for j in range(k):
            a *= m[j] if gamma[j] else 1.0 - m[j]
            b *= u[j] if gamma[j] else 1.0 - u[j]
            lw += (
                math.log2(m[j] / u[j])
                if gamma[j]
                else math.log2((1.0 - m[j]) / (1.0 - u[j]))
            )
        patterns.append(
            {
                "gamma": gamma,
                "n_pairs": n,
                "posterior": a / (a + b),
                "log2_weight": lw,
            }
        )
    return FSModel(
        agree_cols=tuple(agree_cols),
        m=tuple(m),
        u=tuple(u),
        p=p,
        patterns=tuple(patterns),
        n_iter=n_iter,
    )


def fs_classify(
    pairs: DataFrame,
    model: FSModel,
    upper: float = 0.9,
    lower: float = 0.1,
) -> DataFrame:
    """Attach posterior + decision to each candidate pair: ``'match'``
    above ``upper``, ``'non_match'`` below ``lower``, ``'review'``
    between (the Fellegi–Sunter three-way rule).  The weight table is
    ≤2^k rows — Spark broadcasts it; the pairs never reshuffle."""
    if not lower <= upper:
        raise ValueError(f"need lower <= upper, got {lower} > {upper}")
    spark = pairs.sparkSession
    wt = model.weight_table(spark).withColumn(
        "decision",
        F.when(F.col("posterior") >= upper, F.lit("match"))
        .when(F.col("posterior") <= lower, F.lit("non_match"))
        .otherwise(F.lit("review")),
    ).drop("n_pairs")
    on = [
        pairs[c].cast("int") == wt[c] for c in model.agree_cols
    ]
    joined = pairs.join(F.broadcast(wt), on, "left")
    return joined.select(
        *[pairs[c] for c in pairs.columns],
        wt["posterior"],
        wt["log2_weight"],
        wt["decision"],
    )
