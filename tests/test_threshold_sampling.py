"""Two-phase threshold stratified sampling — the big-stratum scale path.

The window-ranked ``stratified_exact`` serializes each stratum through
one task; the threshold variant must select the IDENTICAL sample (same
hash keys, same order-statistic cut) while ranking only a sample-sized
candidate set.  Tested at an adversarial split (one stratum holding
~97.5% of rows)."""

from pyspark.sql import functions as F

from data_integration_est_spark import sampling


def test_threshold_equals_window_adversarial_split(spark):
    df = spark.range(1, 200_001).withColumn(
        "stratum", F.when(F.col("id") % 40 == 0, 2).otherwise(1)
    )
    sizes = {1: 1_000, 2: 500}
    a = sampling.stratified_exact(df, "id", "stratum", sizes, 99, out_col="ind")
    b = sampling.stratified_exact_threshold(df, "id", "stratum", sizes, 99, out_col="ind")
    ids_a = {r["id"] for r in a.filter("ind = 1").select("id").collect()}
    ids_b = {r["id"] for r in b.filter("ind = 1").select("id").collect()}
    assert ids_a == ids_b
    counts = {
        r["stratum"]: r["n"]
        for r in b.filter("ind = 1").groupBy("stratum")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == sizes


def test_threshold_candidate_prefilter_is_small(spark):
    """The ranked window's input must be ~n_h(1+eps), not N_h."""
    df = spark.range(1, 100_001).withColumn("stratum", F.lit(1))
    out = sampling.stratified_exact_threshold(
        df, "id", "stratum", {1: 200}, 7, out_col="ind"
    )
    assert out.filter("ind = 1").count() == 200
    # reconstruct the phase-1 candidate count: keys below the threshold
    from data_integration_est_spark import rng

    t = (200 + 8.0 * 200 ** 0.5 + 10.0) / 100_000
    cand = df.withColumn("__k__", rng.uniform(["id"], 7, "strat")).filter(
        F.col("__k__") < t
    )
    n_cand = cand.count()
    assert 200 <= n_cand < 1_000  # sample-sized, not population-sized


def test_threshold_oversized_stratum_falls_back(spark):
    """Requesting nearly the whole stratum keeps correctness (threshold
    saturates at 1.0 or the safety check falls back)."""
    df = spark.range(1, 1_001).withColumn("stratum", F.lit(1))
    a = sampling.stratified_exact(df, "id", "stratum", {1: 990}, 5, out_col="ind")
    b = sampling.stratified_exact_threshold(df, "id", "stratum", {1: 990}, 5, out_col="ind")
    ids_a = {r["id"] for r in a.filter("ind = 1").select("id").collect()}
    ids_b = {r["id"] for r in b.filter("ind = 1").select("id").collect()}
    assert ids_a == ids_b and len(ids_a) == 990
