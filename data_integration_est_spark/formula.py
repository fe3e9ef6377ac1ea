"""R-style model-formula mini-parser with join-suffix name resolution.

The reference drives both calibration and model fitting through R formula
strings built by ``paste`` (reference ``RegDI2.R:170-178``, ``PC.R:201-213``)
and re-resolves predictor names against the suffixed output of the A/B join
with an ``_A``-then-``_B``-then-bare precedence
(``construir_formula_dinamica``, reference ``PC.R:1-39``).

We accept the same surface — ``"y ~ x1 + x2"``, ``"~0 + uno + delta_i"`` —
and reproduce the resolution precedence exactly (reference ``PC.R:20-34``):
for each predictor ``p``, use ``p_A`` if present in the DataFrame, else
``p_B``, else ``p``, else raise.  Unlike the reference we also resolve the
*response* name (with bare-name-first precedence, since the response is
usually pre-resolved by the caller) — the reference leaves the LHS
unresolved, which is one facet of its documented suffix bug (``nb[10]:55``).

Only additive formulas appear anywhere in the reference (no interactions,
transformations, or factor expansion), so the grammar is:

    formula   := [response] "~" term ("+" term)*
    term      := "0" | "1" | identifier

``0`` suppresses the intercept; ``1`` (or absence of ``0``) includes it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_IDENT = re.compile(r"^[A-Za-z_.][A-Za-z0-9_.]*$")


class FormulaError(ValueError):
    pass


@dataclass(frozen=True)
class Formula:
    """Parsed additive model formula."""

    response: str | None
    predictors: tuple[str, ...]
    intercept: bool = True
    raw: str = field(default="", compare=False)

    @classmethod
    def parse(cls, text: str) -> "Formula":
        if not isinstance(text, str) or "~" not in text:
            raise FormulaError(f"not a valid formula: {text!r}")
        lhs, _, rhs = text.partition("~")
        lhs = lhs.strip()
        response = lhs if lhs else None
        if response is not None and not _IDENT.match(response):
            raise FormulaError(f"invalid response name: {response!r}")
        intercept = True
        predictors: list[str] = []
        terms = [t.strip() for t in rhs.split("+")]
        if not any(terms):
            raise FormulaError(f"formula has an empty right-hand side: {text!r}")
        for term in terms:
            if term == "":
                raise FormulaError(f"empty term in formula: {text!r}")
            if term == "0" or term == "-1":
                intercept = False
            elif term == "1":
                intercept = True
            elif _IDENT.match(term):
                predictors.append(term)
            else:
                raise FormulaError(
                    f"unsupported term {term!r} (only additive terms of plain "
                    f"column names are supported): {text!r}"
                )
        return cls(response=response, predictors=tuple(predictors), intercept=intercept, raw=text)

    def resolve(self, columns: list[str] | tuple[str, ...]) -> "Formula":
        """Re-resolve names against the (possibly suffixed) join output.

        Predictors: ``p_A`` > ``p_B`` > ``p`` (reference ``PC.R:20-34``).
        Response: bare > ``_A`` > ``_B`` (engine fix for ``nb[10]:55``).
        """
        cols = set(columns)

        def resolve_pred(p: str) -> str:
            for cand in (f"{p}_A", f"{p}_B", p):
                if cand in cols:
                    return cand
            raise FormulaError(f"variable {p!r} not found in the data (columns tried: "
                               f"{p}_A, {p}_B, {p})")

        def resolve_resp(r: str) -> str:
            for cand in (r, f"{r}_A", f"{r}_B"):
                if cand in cols:
                    return cand
            raise FormulaError(f"response {r!r} not found in the data")

        return Formula(
            response=resolve_resp(self.response) if self.response is not None else None,
            predictors=tuple(resolve_pred(p) for p in self.predictors),
            intercept=self.intercept,
            raw=self.raw,
        )

    def design_columns(self, intercept_name: str = "__intercept__") -> list[str]:
        """Column names of the design matrix, intercept first (if any)."""
        out = [intercept_name] if self.intercept else []
        out.extend(self.predictors)
        return out
