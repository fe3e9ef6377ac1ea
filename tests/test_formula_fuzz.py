"""Property-based fuzz of the R-formula mini-parser (pure Python, no
Spark): parse/round-trip invariants and resolution totality."""

from hypothesis import given, settings
from hypothesis import strategies as st

from data_integration_est_spark.formula import Formula, FormulaError

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in ("0", "1")
)


@settings(max_examples=200, deadline=None)
@given(resp=ident, preds=st.lists(ident, min_size=1, max_size=5),
       intercept=st.booleans())
def test_parse_roundtrip(resp, preds, intercept):
    rhs = " + ".join((preds if intercept else ["0"] + preds))
    f = Formula.parse(f"{resp} ~ {rhs}")
    assert f.response == resp
    assert list(f.predictors) == preds
    assert f.intercept == intercept


@settings(max_examples=200, deadline=None)
@given(preds=st.lists(ident, min_size=1, max_size=4, unique=True),
       suffix=st.sampled_from(["", "_A", "_B"]))
def test_resolution_total_or_raises(preds, suffix):
    """Every predictor resolves iff some candidate column exists; the
    resolved name is always one of the three candidates."""
    f = Formula.parse("~ " + " + ".join(preds))
    columns = [p + suffix for p in preds]
    r = f.resolve(columns)
    for orig, res in zip(preds, r.predictors):
        assert res in (f"{orig}_A", f"{orig}_B", orig)
        assert res in columns


@settings(max_examples=100, deadline=None)
@given(p=ident)
def test_resolution_precedence_is_A_first(p):
    f = Formula.parse(f"~ {p}")
    assert f.resolve([f"{p}_A", f"{p}_B", p]).predictors == (f"{p}_A",)
    assert f.resolve([f"{p}_B", p]).predictors == (f"{p}_B",)
    assert f.resolve([p]).predictors == (p,)


@settings(max_examples=100, deadline=None)
@given(garbage=st.text(max_size=20).filter(lambda s: "~" not in s))
def test_no_tilde_always_rejected(garbage):
    try:
        Formula.parse(garbage)
        raise AssertionError("should have raised")
    except FormulaError:
        pass
