"""Synthetic population generators (SURVEY.md §2.1 S1-S4).

Spark-first re-expression of the reference's Monte Carlo population models:
``spark.range(N)`` + deterministic hash-based random columns (``rng``) +
indicator cuts via ``F.when`` + the sampling kernels of ``sampling``.
Generation is embarrassingly parallel — no shuffle until a sampler needs a
top-n — so a 10^9-row population generates at scan speed.

Determinism contract (SURVEY.md §7.3-2): draws are pure functions of
(id, seed), reproducible across cluster sizes; R's Mersenne streams are NOT
replayed — fixtures freeze populations, not seeds.

Reference models:
  S1 ``generar_poblacion``              (nb code cell 1)
  S2 ``generate_population_stratified`` (nb code cell 3)
  S3 ``generate_population_NMAR``       (nb code cell 8)
  S4 ``generate_population_NMAR_v2``    (nb code cell 19)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_est_spark import rng, sampling


def _base_population(spark: SparkSession, N: int, seed: int) -> DataFrame:
    """Shared S1/S3/S4 base: x ~ N(2,1), correlated e, indicator cuts."""
    df = spark.range(1, N + 1).withColumnRenamed("id", "id")
    x = rng.normal(["id"], seed, "x", mean=2.0, sd=1.0)
    df = df.withColumn("x_i", x)
    rho = 0.5
    v = rng.normal(["id"], seed, "v")
    df = df.withColumn("e_i", F.lit(rho) * F.col("x_i") + F.lit(math.sqrt(1 - rho**2)) * v)
    return (
        df.withColumn("e1_i", F.when(F.col("e_i") <= 1.0, 1).otherwise(0))
        .withColumn("e2_i", F.when(F.col("e_i") > 1.0, 1).otherwise(0))
        .withColumn("x1_i", F.when(F.col("x_i") <= 2.0, 1).otherwise(0))
        .withColumn("x2_i", F.when(F.col("x_i") > 2.0, 1).otherwise(0))
    )


def generar_poblacion(
    spark: SparkSession,
    N: int = 100_000,
    size_a: int = 1_000,
    n_B1: int = 30_000,
    n_B2: int = 20_000,
    seed: int = 1234,
) -> DataFrame:
    """S1 — simulation-1 population: y = 3 + 0.7(x-2) + N(0, sqrt(0.51));
    contaminated tilde_y = 2 + 0.9(y-3) + N(0, 0.5); S_A = SRS(size_a);
    S_B = exact-size draws from the x<=2 / x>2 strata (n_B1, n_B2)."""
    df = _base_population(spark, N, seed)
    eta = rng.normal(["id"], seed, "eta", sd=math.sqrt(0.51))
    df = df.withColumn("y_i", F.lit(3.0) + F.lit(0.7) * (F.col("x_i") - 2.0) + eta)
    df = df.withColumn(
        "tilde_y_i",
        F.lit(2.0) + F.lit(0.9) * (F.col("y_i") - 3.0) + rng.normal(["id"], seed, "tl", sd=0.5),
    )
    df = sampling.srs_exact(df, "id", size_a, seed, out_col="muestra_A", tag="A")
    # S_B: exact-size per-stratum draw over the x1/x2 cut
    df = df.withColumn("__stratum__", F.when(F.col("x_i") <= 2.0, 1).otherwise(2))
    df = sampling.stratified_exact(
        df, "id", "__stratum__", {1: n_B1, 2: n_B2}, seed, out_col="muestra_B", tag="B"
    ).drop("__stratum__")
    return df.select(
        "id", "x_i", "y_i", "tilde_y_i", "e_i", "e1_i", "e2_i", "x1_i", "x2_i",
        "muestra_A", "muestra_B",
    )


def generate_population_stratified(
    spark: SparkSession,
    N: int = 1_000_000,
    n_A_total: int = 2_000,
    n_B_total: int = 500_000,
    seed: int = 123,
) -> DataFrame:
    """S2 — stratified population: x ~ N(10,1), z ~ Bern(0.5), 4 strata from
    (x<=9.5, z); y = 5 + 0.1x + 3z + N(0,1); proportional-allocation
    stratified S_A with weights N_h/n_Ah; Poisson S_B with pi 0.8/0.2 by
    stratum and a rescale-to-target-size retry."""
    df = spark.range(1, N + 1)
    df = df.withColumn("x_i", rng.normal(["id"], seed, "x", mean=10.0, sd=1.0))
    df = df.withColumn("z_i", rng.bernoulli(["id"], seed, 0.5, "z"))
    df = df.withColumn(
        "stratum",
        F.when((F.col("x_i") <= 9.5) & (F.col("z_i") == 0), 1)
        .when((F.col("x_i") <= 9.5) & (F.col("z_i") == 1), 2)
        .when((F.col("x_i") > 9.5) & (F.col("z_i") == 0), 3)
        .otherwise(4),
    )
    df = df.withColumn(
        "y_i",
        F.lit(5.0) + F.lit(0.1) * F.col("x_i") + F.lit(3.0) * F.col("z_i")
        + rng.normal(["id"], seed, "eps"),
    )
    df = df.withColumn(
        "tilde_y_i",
        F.lit(7.5) + F.lit(3.0) * (F.col("y_i") - 7.5)
        + rng.normal(["id"], seed, "e", sd=math.sqrt(0.5)),
    )
    df = df.persist()

    # proportional allocation: per-stratum sizes (4-row collect)
    sizes = {r["stratum"]: r["N_h"] for r in
             df.groupBy("stratum").agg(F.count(F.lit(1)).alias("N_h")).collect()}
    total = sum(sizes.values())
    n_Ah = {s: int(round(N_h / total * n_A_total)) for s, N_h in sizes.items()}

    df = sampling.stratified_exact(df, "id", "stratum", n_Ah, seed, out_col="ind_A", tag="A")
    d_map = F.lit(None).cast("double")
    for s, N_h in sizes.items():
        d_map = F.when(F.col("stratum") == s, F.lit(N_h / max(n_Ah[s], 1))).otherwise(d_map)
    df = df.withColumn("d_i_A", F.when(F.col("ind_A") == 1, d_map).otherwise(F.lit(None)))

    # biased Poisson S_B with rescale-retry (reference redraws once when the
    # realized size misses the target)
    pi_B = F.when(F.col("stratum").isin(1, 2), 0.8).otherwise(0.2)
    df = df.withColumn("__piB__", pi_B)
    df = sampling.bernoulli_sample(df, "id", F.col("__piB__"), seed, out_col="ind_B", tag="B1")
    n_obtained = df.agg(F.sum("ind_B")).collect()[0][0]
    if n_obtained != n_B_total:
        scale = n_B_total / max(n_obtained, 1)
        pi_adj = F.least(F.col("__piB__") * F.lit(scale), F.lit(1.0))
        df = sampling.bernoulli_sample(df, "id", pi_adj, seed, out_col="ind_B", tag="B2")
    out = df.select("id", "x_i", "z_i", "stratum", "y_i", "tilde_y_i", "ind_A", "d_i_A", "ind_B")
    df.unpersist()
    return out


def generate_population_NMAR(
    spark: SparkSession,
    N: int = 100_000,
    size_a: int = 1_000,
    size_muestra_B: int = 50_000,
    gamma: float = 0.25,
    c: float = 3.0,
    seed_base: int = 1234,
    fixed: bool = True,
) -> DataFrame:
    """S3 — NMAR population: S1 base + logistic not-missing-at-random S_B
    selection pi_B(y) = 1/(1+exp(-gamma*(y-c)))."""
    df = _base_population(spark, N, seed_base)
    eta = rng.normal(["id"], seed_base, "eta", sd=math.sqrt(0.51))
    df = df.withColumn("y_i", F.lit(3.0) + F.lit(0.7) * (F.col("x_i") - 2.0) + eta)
    df = df.withColumn(
        "tilde_y_i",
        F.lit(2.0) + F.lit(0.9) * (F.col("y_i") - 3.0)
        + rng.normal(["id"], seed_base, "tl", sd=0.5),
    )
    df = sampling.srs_exact(df, "id", size_a, seed_base, out_col="muestra_A", tag="A")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(gamma) * (F.col("y_i") - F.lit(c))))
    df = df.withColumn("__prob__", prob)
    if fixed:
        # exact-size weighted draw; A-ES keys are scale-invariant so the
        # reference's /max(prob) normalization is a no-op here
        df = sampling.weighted_srs_exact(
            df, "id", size_muestra_B, "__prob__", seed_base, out_col="muestra_B", tag="B"
        )
    else:
        df = sampling.bernoulli_sample(
            df, "id", F.col("__prob__"), seed_base, out_col="muestra_B", tag="B"
        )
    return df.select(
        "id", "x_i", "y_i", "tilde_y_i", "e_i", "e1_i", "e2_i", "x1_i", "x2_i",
        "muestra_A", "muestra_B",
    )


def generate_population_NMAR_v2(
    spark: SparkSession,
    N: int = 100_000,
    size_a: int = 1_000,
    size_muestra_B: int = 50_000,
    gamma: float = 0.25,
    c: float = 3.0,
    seed_base: int = 1234,
    sd_vector: tuple[float, ...] = (0.5, 1.0, 2.0),
    fixed: bool = True,
) -> DataFrame:
    """S4 — NMAR with one outcome column per sigma in ``sd_vector``
    (columns ``y_i_sd_<s>``); S_B selection driven by the FIRST outcome."""
    df = _base_population(spark, N, seed_base)
    y_cols = []
    for sd in sd_vector:
        name = f"y_i_sd_{_fmt_sd(sd)}"
        eta = rng.normal(["id"], seed_base, f"eta{sd}", sd=float(sd))
        df = df.withColumn(name, F.lit(3.0) + F.lit(0.7) * (F.col("x_i") - 2.0) + eta)
        y_cols.append(name)
    df = sampling.srs_exact(df, "id", size_a, seed_base, out_col="muestra_A", tag="A")
    # backtick-quote: reference column names like y_i_sd_0.125 contain dots
    first_y = F.col(f"`{y_cols[0]}`")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(gamma) * (first_y - F.lit(c))))
    df = df.withColumn("__prob__", prob)
    if fixed:
        df = sampling.weighted_srs_exact(
            df, "id", size_muestra_B, "__prob__", seed_base, out_col="muestra_B", tag="B"
        )
    else:
        df = sampling.bernoulli_sample(
            df, "id", F.col("__prob__"), seed_base, out_col="muestra_B", tag="B"
        )
    return df.select(
        "id", "x_i", "e_i", "e1_i", "e2_i", "x1_i", "x2_i",
        *[F.col(f"`{c}`") for c in y_cols], "muestra_A", "muestra_B",
    )


def _fmt_sd(sd: float) -> str:
    """Match R's number formatting in column names: 0.5 -> '0.5', 0 -> '0'."""
    s = f"{sd:g}"
    return s
