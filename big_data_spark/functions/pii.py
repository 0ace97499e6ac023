"""PII detection and redaction — the scrub pass a training-data
pipeline runs before any text leaves the lake.

Patterns are deliberately restricted to syntax with IDENTICAL
semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
classes, bounded repetition, non-capturing groups and ``\\b`` word
boundaries — no backreferences, no lookaround. That keeps every scrub
JVM-side (``regexp_replace`` / ``regexp_count``, whole-stage codegen,
no UDF) AND cross-engine checkable.

Redaction order matters and is fixed: email -> phone -> ipv4 ->
id_number. Earlier passes rewrite their matches to ``[KIND]`` tokens,
so later, looser patterns (a bare digit-run) can never re-match text
that was already classified as something more specific.

At 100 TB this is a pure narrow map over the scan — no shuffle, no
Python; counts are computed on the ORIGINAL text (before redaction)
so they report what was found, not what survived.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order is the redaction order (most specific first).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # Long bare digit runs: account numbers, SSN-ish ids. Loosest
    # pattern, so it runs last.
    "id_number": r"\b\d{7,}\b",
}


def pii_counts(col: Column | str, kinds: tuple[str, ...] | None = None) -> dict[str, Column]:
    """One count column per PII kind, measured on the original text."""
    kinds = kinds or tuple(PII_PATTERNS)
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(PII_PATTERNS[kind]))
        for kind in kinds
    }


def pii_redact(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Text with every PII match replaced by its ``[KIND]`` token,
    applied in the fixed specific-to-loose order."""
    kinds = kinds or tuple(PII_PATTERNS)
    out = F.col(col) if isinstance(col, str) else col
    for kind in PII_PATTERNS:  # dict order IS the redaction order
        if kind in kinds:
            out = F.regexp_replace(
                out, PII_PATTERNS[kind], f"[{kind.upper()}]"
            )
    return out


def sql_pii_counts(expr: str, kinds: tuple[str, ...] | None = None) -> dict[str, str]:
    """DuckDB twins of pii_counts (len of regexp_extract_all)."""
    kinds = kinds or tuple(PII_PATTERNS)
    return {
        kind: f"len(regexp_extract_all({expr}, '{PII_PATTERNS[kind]}'))"
        for kind in kinds
    }


def sql_pii_redact(expr: str, kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB twin of pii_redact — the same patterns in the same
    order, with RE2's 'g' flag standing in for Spark's
    replace-all-by-default."""
    kinds = kinds or tuple(PII_PATTERNS)
    out = expr
    for kind in PII_PATTERNS:
        if kind in kinds:
            out = (
                f"regexp_replace({out}, '{PII_PATTERNS[kind]}', "
                f"'[{kind.upper()}]', 'g')"
            )
    return out
