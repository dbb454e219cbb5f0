"""PII detection and redaction — codegen-only curation operators.

The reference's PII stance is hash-anonymization of a known column
(`cloud_function.py:63-66` SHA-1 of the buyer email before load); a
training-data pipeline also needs the FREE-TEXT face: find and remove
PII that appears inside document bodies. These operators are pure
Column expressions (regexp_replace / rlike / regexp_count chains), so
they run in whole-stage codegen at any scale — no UDF, no Python in
the hot path, and the scan prunes to the text column alone.

Pattern dialect: every regex here is deliberately written in the
common subset of Java regex (Spark) and RE2 (DuckDB, the differential
oracle): no lookaround, no backreferences, `\\b` word boundaries and
bounded quantifiers only. Redaction applies patterns in a FIXED order
(email → card → ssn → phone → ipv4) so overlapping matches resolve
identically on any engine that honors leftmost-longest-per-pass
regexp_replace semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (kind, pattern, replacement token) in application order. Order is
#: part of the contract: an SSN-shaped span inside an already-redacted
#: email never re-matches because earlier passes rewrote it.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("card", r"\b\d{4}(?:[ -]\d{4}){3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace every PII span with its ``[KIND]`` token, all five
    pattern families, fixed order — one codegen'd regexp_replace
    chain."""
    out = F.col(col) if isinstance(col, str) else col
    for kind, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def detect_pii_kinds(col: Column | str) -> Column:
    """Comma-joined kinds present in the text, in pattern order —
    a deterministic STRING (not an array) so differential hashing is
    stable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ",",
        *[
            F.when(c.rlike(pat), F.lit(kind))
            for kind, pat in PII_PATTERNS
        ],
    )


def count_pii(col: Column | str) -> Column:
    """Total PII spans across all five families (long). Counts overlap
    the same way redaction consumes them only if patterns were applied
    sequentially; this counts against the ORIGINAL text per family —
    the auditing number (how much PII arrived), not the redaction
    pass count."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0).cast("long")
    for _, pat in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pat)).cast("long")
    return total
