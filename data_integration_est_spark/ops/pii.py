"""PII scan + redaction — pre-training corpus hygiene.

Training pipelines scrub personally identifiable information before the
corpus ships (emails, phone numbers, SSN-shaped ids, IP addresses — the
standard regex families; e.g. the C4/RefinedWeb cleanup steps).  The
reference repo has no analogue; part of the engine's LLM-data-pipeline
surface.

Scale design: pure JVM-side ``regexp_count`` / ``regexp_replace`` column
expressions — no UDFs, no shuffles; the scan is a map-only pass that
whole-stage-codegen fuses with the enclosing projection.  The patterns
avoid lookarounds and word-boundary quirks so Java regex (Spark) and RE2
(DuckDB) agree token-for-token — which is what makes the op
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pattern, placeholder — applied in THIS order (email first: an email
# can contain digit runs; ip last so redacted placeholders never
# re-match).  Keep in sync with the SQL oracle in entry_queries.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "[SSN]"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts over ``text`` (column exprs, zero-shuffle)."""
    return {
        kind: F.regexp_count(text, F.lit(pat)) for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Sequentially replace every PII family with its placeholder, in the
    canonical order (so e.g. the digits inside an already-redacted email
    cannot re-match the phone pattern)."""
    out = text
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def pii_scan(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII report: one count column per family, a total, and
    the redacted text.  A corpus-cleaning pipeline keeps ``redacted`` and
    drops (or routes to review) rows with ``n_pii > 0``."""
    counts = pii_counts(F.col(text_col))
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        F.col(id_col),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        total.alias("n_pii"),
        redact_pii(F.col(text_col)).alias("redacted"),
    )
