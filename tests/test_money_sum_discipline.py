"""The decimal-string big-sum discipline, enforced (r12; r11 verdict #8).

The sf1 gate run caught a whole bug class: summing ~1e11-magnitude
doubles (money columns over millions of rows) is ORDER-DEPENDENT below
~1e-5, so the same query returns different 6-dp-rounded totals on
different partitionings — Spark vs DuckDB, or the same engine at a
different parallelism.  The fix (r11, four rows) is to cast to
DECIMAL(38,6) BEFORE the sum (decimal addition is exact and
order-invariant) and emit the exact decimal STRING.

This test greps ``entry_queries.py`` for every ``sum(`` whose argument
touches an unbounded money column and fails when one bypasses the
decimal path — unless it is in the explicit exemption list below, each
entry of which records WHY the double sum is safe.  It would have
caught all four pre-fix rows.
"""

from __future__ import annotations

import os
import re

SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_integration_est_spark", "entry_queries.py",
)

# Money columns whose full-table (or low-cardinality-group) sums exceed
# 1e9 at sf1 and therefore MUST ride DECIMAL(38,6).  l_quantity /
# l_discount are exempt by construction: quantities are small integers
# (exact in doubles to 2^53) and discounts are 0.00-0.10 two-decimal
# values whose sf1 totals stay ~1e5 (error floor ~1e-11, six orders
# below the 6-dp rounding).
MONEY_COLS = ("l_extendedprice", "o_totalprice")

# sum(...) occurrences allowed to stay double, keyed by a snippet that
# must still appear in the file; each records why it cannot diverge.
EXEMPT = {
    # per-ORDER revenue: grouped by l_orderkey, <= 7 lineitems per
    # group, values ~1e5 -> error floor ~1e-11 at any scale
    'F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")':
        "per-orderkey group sums (<= 7 rows each)",
    "sum(l_extendedprice * (1 - l_discount)) AS rev":
        "per-orderkey group sums (<= 7 rows each)",
    # per-CUSTOMER spend: grouped by o_custkey, ~10 orders per group
    "sum(o_totalprice) AS spend":
        "per-custkey group sums (~10 rows each)",
    'F.sum("o_totalprice").alias("spend")':
        "per-custkey group sums (~10 rows each; the Spark twin)",
    # ANOVA moment sums are on the LOG scale: ~12 per row, sf1 totals
    # ~1e7, error floor ~1e-9 — six orders below the 6-dp rounding
    "sum(ln(o_totalprice)) AS s":
        "log-scale moments (~12/row; sf1 total ~1e7)",
    "sum(ln(o_totalprice) * ln(o_totalprice)) AS ss":
        "log-scale second moments (~144/row; sf1 total ~1e8)",
}


def _sum_spans(text: str):
    """Yield (start, argtext) for every [F.]sum( call, with balanced
    parens so nested casts stay inside the argument."""
    for m in re.finditer(r"\bsum\s*\(", text, flags=re.IGNORECASE):
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        yield m.start(), text[m.end():i - 1]


def test_every_big_money_sum_rides_decimal():
    text = open(SRC).read()
    # every exemption must still match the file — a stale exemption is
    # itself a failure (it would silently stop guarding)
    stale = [snip for snip in EXEMPT if snip not in text]
    assert not stale, f"stale exemption snippets (update the list): {stale}"

    offenders = []
    for start, arg in _sum_spans(text):
        if not any(c in arg for c in MONEY_COLS):
            continue
        if "decimal(38,6)" in arg.lower().replace(" ", ""):
            continue
        line_no = text.count("\n", 0, start) + 1
        context = text[max(0, start - 200):start + len(arg) + 20]
        if any(snip in context for snip in EXEMPT):
            continue
        offenders.append((line_no, arg.strip()[:100]))
    assert not offenders, (
        "money-column sums bypassing the DECIMAL(38,6) path (order-"
        "dependent at sf1 row counts — cast BEFORE the sum and emit the "
        f"decimal string, or add a justified exemption): {offenders}"
    )


def test_decimal_rows_emit_strings():
    """The decimal sums must leave the plan as exact STRINGS — a decimal
    re-cast to double reintroduces the rounding the discipline exists to
    avoid.  Checks the canonical rows are still on the full pattern."""
    text = open(SRC).read()
    for pattern in (
        'F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))',
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR)",
        "CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR)",
    ):
        assert pattern in text, f"canonical decimal-path pattern gone: {pattern}"
