"""PII detection / redaction kernels for corpus curation.

Training-data pipelines scrub personally identifying strings (emails,
phone numbers, national-ID shapes, IP addresses) before anything else
touches the text, and they keep per-pattern hit counts so curators can
audit what was removed. Both halves are pure Catalyst here —
``regexp_extract_all`` for counts, chained ``regexp_replace`` for the
scrub — the same JVM-side regex kernel as the reference's multimatch
family (reference: files_kraken/blueprints/parsers.py MultimatchExecutor
analog), so the hot path never leaves whole-stage codegen.

Dialect contract: every pattern below is valid and equivalent in BOTH
Java regex (Spark) and RE2 (the DuckDB oracle) — character classes and
bounded quantifiers only; no backrefs, no lookaround, no ``\\b`` (RE2's
is ASCII-only while Java's is Unicode-aware, a silent divergence).
Scrub order is fixed (email → phone → ssn → ipv4) and must match the
oracle's nesting order, since replacement tokens must not be re-matched
by later patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern name → (regex, replacement token); ORDER MATTERS for scrub
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    "ipv4": (r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "[IP]"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    pat, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))


def pii_scrub(col: Column) -> Column:
    """Redact every PII pattern, applied in the canonical order."""
    out = col
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scrub_sql(expr: str) -> str:
    """DuckDB mirror of :func:`pii_scrub` — same patterns, same order,
    global replace ('g' flag; Spark's regexp_replace is always-global).
    """
    out = expr
    for pat, token in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def pii_count_sql(expr: str, kind: str) -> str:
    """DuckDB mirror of :func:`pii_count`."""
    pat, _ = PII_PATTERNS[kind]
    return f"len(regexp_extract_all({expr}, '{pat}'))"
