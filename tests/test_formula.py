import pytest

from data_integration_est_spark.formula import Formula, FormulaError


def test_parse_basic():
    f = Formula.parse("y_i ~ x1_i + x2_i")
    assert f.response == "y_i"
    assert f.predictors == ("x1_i", "x2_i")
    assert f.intercept


def test_parse_no_intercept():
    f = Formula.parse("~0 + uno + delta_i + delta_yi")
    assert f.response is None
    assert not f.intercept
    assert f.predictors == ("uno", "delta_i", "delta_yi")


def test_parse_rejects_garbage():
    with pytest.raises(FormulaError):
        Formula.parse("no tilde here")
    with pytest.raises(FormulaError):
        Formula.parse("y ~ x1 * x2")  # interactions unsupported


def test_resolution_precedence_A_then_B_then_bare():
    # reference PC.R:20-34: predictor p resolves p_A > p_B > p
    f = Formula.parse("y_i ~ tilde_y_i + z_i + w")
    resolved = f.resolve(["y_i", "tilde_y_i_A", "tilde_y_i_B", "z_i_B", "w"])
    assert resolved.predictors == ("tilde_y_i_A", "z_i_B", "w")
    assert resolved.response == "y_i"


def test_resolution_response_prefers_bare_then_A():
    f = Formula.parse("y_i ~ x")
    r = f.resolve(["y_i_A", "x"])
    assert r.response == "y_i_A"


def test_resolution_missing_raises():
    with pytest.raises(FormulaError):
        Formula.parse("y ~ nope").resolve(["y", "x"])
