"""Reshape operators (R1-R4, P9): melt/pivot round-trip, separate, across."""

from pyspark.sql import functions as F

from data_integration_est_spark import reshape as rs


def _wide(spark):
    return spark.createDataFrame(
        [(0.0, 0.1, 0.2), (0.5, 0.3, 0.4)],
        "gamma double, bias_mean_PC double, bias_mean_RegDI double",
    )


def test_melt_then_pivot_roundtrip(spark):
    wide = _wide(spark)
    long = rs.melt(wide, id_vars=["gamma"], var_name="estimator", value_name="bias")
    assert long.count() == 4
    assert set(long.columns) == {"gamma", "estimator", "bias"}
    back = rs.pivot_wider(long, ["gamma"], "estimator", "bias")
    a = sorted(tuple(r) for r in wide.collect())
    b = sorted(
        (r["gamma"], r["bias_mean_PC"], r["bias_mean_RegDI"]) for r in back.collect()
    )
    assert a == b


def test_separate_with_casts(spark):
    long = rs.melt(_wide(spark), id_vars=["gamma"], var_name="key", value_name="v")
    out = rs.separate(
        long, "key", into=["metric", "estimator"], pattern=r"^(bias_mean)_(\w+)$"
    )
    rows = {(r["metric"], r["estimator"]) for r in out.collect()}
    assert rows == {("bias_mean", "PC"), ("bias_mean", "RegDI")}


def test_mutate_across(spark):
    wide = _wide(spark)
    out = rs.mutate_across(
        wide, "bias_mean_", lambda c: F.round(c - 3.0, 6), names="centered_{col}"
    )
    r = out.filter(F.col("gamma") == 0.0).collect()[0]
    assert r["centered_bias_mean_PC"] == -2.9
    assert r["bias_mean_PC"] == 0.1  # originals untouched


def test_bind_rows_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, 9.5)], "id long, b double")
    out = rs.bind_rows([a, b])
    assert out.count() == 2
    assert set(out.columns) == {"id", "a", "b"}
    got = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert got[1] == ("x", None)
    assert got[2] == (None, 9.5)
