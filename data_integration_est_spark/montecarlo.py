"""Monte Carlo study harness — replicate-column vectorization (SURVEY.md
§2.8 O1-O3).

The reference's NMAR study (``nb[23]``) runs ``run_simulation(gamma, sim)``
in an R ``parLapply`` pool over an 11-gamma x 100-sim grid, each cell
regenerating a population and calling ~9 estimators.  Here the whole grid
is ONE DataFrame keyed by (gamma, sim_id, unit id):

- population columns are pure functions of (sim_id, id, seed) — identical
  across gamma values for a given sim, mirroring the reference's
  ``seed_base = sim`` discipline (``nb[23]:14``);
- S_A is an exact-size SRS per sim; S_B is an exact-size unequal-
  probability (NMAR logistic) draw per (gamma, sim) — both as ranked
  windows, one shuffle for the entire grid;
- every estimator runs once over all cells via the grouped kernels
  (``estimators.vectorized``) — stacked driver solves, broadcast joins.

Total shuffle count for a full grid study: ~10, independent of grid size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from data_integration_est_spark import rng, sampling
from data_integration_est_spark.estimators import vectorized as V

Y_TRUE = 3.0  # the S1/S3 population mean (``nb[4]:9``)


def nmar_grid_population(
    spark: SparkSession,
    N: int = 10_000,
    n_sim: int = 10,
    gammas: tuple[float, ...] = (0.0, 0.5, 1.0),
    size_a: int = 500,
    size_b: int = 2_000,
    c: float = 3.0,
    seed: int = 1234,
) -> DataFrame:
    """The expanded (gamma x sim x unit) NMAR population
    (``generate_population_NMAR`` x grid, ``nb[18]:2-51`` + ``nb[23]:1-14``).

    Generation is shuffle-free (range + hash-derived columns); the two
    exact-size draws are each one ranked window over the grid."""
    base = (
        spark.range(n_sim * N)
        .select(
            (F.col("id") / N).cast("long").alias("sim_id"),
            (F.col("id") % N + 1).alias("uid"),
        )
        .withColumn("sim_id", F.col("sim_id") + 1)
    )
    keys = ["sim_id", "uid"]
    x = rng.normal(keys, seed, "x", mean=2.0, sd=1.0)
    base = base.withColumn("x_i", x)
    eta = rng.normal(keys, seed, "eta", sd=math.sqrt(0.51))
    base = base.withColumn("y_i", F.lit(3.0) + F.lit(0.7) * (F.col("x_i") - 2.0) + eta)
    # the contaminated proxy measured in S_B (``nb[2]:13``): scale/location
    # bias + noise — the Scenario-II outcome
    base = base.withColumn(
        "tilde_y_i",
        F.lit(2.0) + F.lit(0.9) * (F.col("y_i") - 3.0)
        + rng.normal(keys, seed, "tl", sd=0.5),
    )
    base = (
        base.withColumn("x1_i", F.when(F.col("x_i") <= 2.0, 1.0).otherwise(0.0))
        .withColumn("x2_i", F.when(F.col("x_i") > 2.0, 1.0).otherwise(0.0))
    )
    # S_A per sim (gamma-invariant), before the gamma expansion
    base = sampling.grouped_exact(
        base, key_cols=keys, group_cols=["sim_id"], n=size_a, seed=seed,
        out_col="muestra_A", tag="A",
    )

    gamma_df = spark.createDataFrame(
        [(float(g),) for g in gammas],
        StructType([StructField("gamma", DoubleType(), False)]),
    )
    grid = base.crossJoin(F.broadcast(gamma_df))
    prob = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-F.col("gamma") * (F.col("y_i") - F.lit(c)))
    )
    grid = grid.withColumn("__prob__", prob)
    # the A-ES keys are seeded by (sim_id, uid) only — the same underlying
    # uniforms across gamma values, as in the reference's per-sim seeding
    grid = sampling.grouped_exact(
        grid, key_cols=keys, group_cols=["gamma", "sim_id"], n=size_b, seed=seed,
        prob_col="__prob__", out_col="muestra_B", tag="B",
    )
    return grid.drop("__prob__")


@dataclass
class MCResult:
    """Per-cell estimates + the bias/SE/RMSE summary (both lazy-free)."""

    estimates: DataFrame  # (gamma, sim_id, estimator, estimate, se)
    summary: DataFrame    # (gamma, estimator, bias_mean, bias_sd, rmse, n_sim)


def run_nmar_study(
    spark: SparkSession,
    N: int = 10_000,
    n_sim: int = 10,
    gammas: tuple[float, ...] = (0.0, 0.5, 1.0),
    size_a: int = 500,
    size_b: int = 2_000,
    seed: int = 1234,
    y_true: float = Y_TRUE,
) -> MCResult:
    """The vectorized analogue of the reference's NMAR grid study
    (``nb[23]:130-159`` + the summary at ``nb[25]``): estimators
    Mean_S_A, Mean_S_B, RegDI_X1, PC_X1_X2, PC_DR, RegDI_DR per cell."""
    pop = nmar_grid_population(
        spark, N=N, n_sim=n_sim, gammas=gammas, size_a=size_a, size_b=size_b,
        seed=seed,
    ).persist()
    g = ["gamma", "sim_id"]
    try:
        results: dict[str, dict[tuple, tuple]] = {
            "Mean_S_A": V.naive_mean_grouped(pop, "y_i", "muestra_A", g),
            "Mean_S_B": V.naive_mean_grouped(pop, "y_i", "muestra_B", g),
            "RegDI_X1": V.regdi_c0_grouped(
                pop, "y_i", "y_i", "muestra_A", "muestra_B", g, aux_vars=["x1_i"]
            ),
            "PC_X1_X2": V.pc_s1_grouped(pop, "y_i", "muestra_B", ["x1_i", "x2_i"], g),
            "PC_DR": V.pc_dr1_grouped(
                pop, "y_i", "y_i", "muestra_A", "muestra_B", ["x1_i", "x2_i"],
                "y_i ~ x_i", g,
            ),
            "RegDI_DR": V.regdi_dr_grouped(
                pop, "y_i", "y_i", "muestra_A", "muestra_B", "y_i ~ x_i", g,
                aux_vars=["x1_i"],
            ),
        }
    finally:
        pop.unpersist()
    return _summarize(spark, results, y_true)


def run_contaminated_study(
    spark: SparkSession,
    N: int = 10_000,
    n_sim: int = 10,
    gammas: tuple[float, ...] = (0.0, 0.5),
    size_a: int = 500,
    size_b: int = 2_000,
    seed: int = 1234,
    y_true: float = Y_TRUE,
) -> MCResult:
    """Scenario II (``nb[4]`` cells 2-5): S_B observes only the
    CONTAMINATED proxy tilde_y = 2 + 0.9(y-3) + noise.  Estimators and
    their estimands (the reference mixes scales here, deliberately):

    - Mean_S_B_tilde — naive proxy mean; biased ~-1 for E[y].
    - RegDI_tilde — correction 0/1 with y_B = tilde (exactly the
      notebook's Scenario-II call, ``nb[5]:48-57``): calibrating to the
      proxy total does NOT bias the calibrated mean of the clean y_A —
      unbiased for E[y] (the golden 0.000 row of cell 4).
    - RegDI_C2 — correction 2 maps y_A onto B's scale via the inverse
      measurement fit (``RegDI2.R:264-266``), i.e. it treats S_B as the
      gold standard: unbiased for the PROXY-scale mean E[tilde] = 2, and
      summarized against that truth.
    - PC_S2 — scenario 2 predicts the clean y from the proxy on the A∩B
      overlap: unbiased for E[y].
    """
    pop = nmar_grid_population(
        spark, N=N, n_sim=n_sim, gammas=gammas, size_a=size_a, size_b=size_b,
        seed=seed,
    ).persist()
    g = ["gamma", "sim_id"]
    try:
        results: dict[str, dict[tuple, tuple]] = {
            "Mean_S_B_tilde": V.naive_mean_grouped(pop, "tilde_y_i", "muestra_B", g),
            "RegDI_tilde": V.regdi_c0_grouped(
                pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B", g
            ),
            "RegDI_C2": V.regdi_c2_grouped(
                pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B", g
            ),
            "PC_S2": V.pc_s2_grouped(
                pop, "y_i", "tilde_y_i", "muestra_A", "muestra_B",
                ["x1_i", "x2_i"], "y_i ~ tilde_y_i", g,
            ),
        }
    finally:
        pop.unpersist()
    tilde_true = 2.0 + 0.9 * (y_true - 3.0)
    return _summarize(
        spark, results, y_true, y_true_by_est={"RegDI_C2": tilde_true}
    )


def _summarize(
    spark,
    results: dict[str, dict[tuple, tuple]],
    y_true: float,
    y_true_by_est: dict[str, float] | None = None,
) -> MCResult:
    """``y_true_by_est`` overrides the truth per estimator — used when an
    estimator targets a different estimand (e.g. the proxy-scale mean)."""
    y_true_by_est = y_true_by_est or {}
    est_schema = StructType([
        StructField("gamma", DoubleType(), False),
        StructField("sim_id", LongType(), False),
        StructField("estimator", StringType(), False),
        StructField("estimate", DoubleType(), True),
        StructField("se", DoubleType(), True),
        StructField("y_true", DoubleType(), False),
    ])
    rows = [
        (float(key[0]), int(key[1]), name, float(est),
         None if se is None else float(se),
         float(y_true_by_est.get(name, y_true)))
        for name, cells in results.items()
        for key, (est, se) in cells.items()
    ]
    estimates = spark.createDataFrame(rows, est_schema)

    # O3: bias = mean(est - y_true), SE = sd(est), RMSE = sqrt(bias^2 + se^2)
    # (``nb[4]:198-228``, ``nb[23]:113-127``)
    summary = (
        estimates.groupBy("gamma", "estimator")
        .agg(
            F.round(F.avg(F.col("estimate") - F.col("y_true")), 6).alias("bias_mean"),
            F.round(F.stddev_samp(F.col("estimate")), 6).alias("bias_sd"),
            F.count(F.lit(1)).alias("n_sim"),
        )
        .withColumn(
            "rmse",
            F.round(F.sqrt(F.col("bias_mean") ** 2 + F.coalesce(F.col("bias_sd"), F.lit(0.0)) ** 2), 6),
        )
        .select("gamma", "estimator", "bias_mean", "bias_sd", "rmse", "n_sim")
    )
    return MCResult(estimates=estimates, summary=summary)
