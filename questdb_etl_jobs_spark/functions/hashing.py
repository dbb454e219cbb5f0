"""Hash helpers: PII anonymization and stable row identity.

The reference anonymizes the buyer email with a SHA-1 hex digest so that
per-buyer analytics keep working after anonymization (reference
cloud_function.py:70, rationale README.md:249). ``F.sha1`` over UTF-8
strings is byte-identical to CPython's ``hashlib.sha1(s.encode())
.hexdigest()`` (golden-tested in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def anonymize_sha1(col: Column | str) -> Column:
    """Deterministic PII anonymization: SHA-1 hex of the UTF-8 value."""
    return F.sha1(F.col(col) if isinstance(col, str) else col)


def stable_id(*cols: Column | str) -> Column:
    """Content-derived 256-bit id over the given columns.

    Used for idempotent writes (the reference's trigger is at-least-once,
    reference README.md:103, with no dedup — SURVEY.md §1.4.5): equal
    content hashes to equal ids, so re-delivered batches dedup exactly.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    # NULLs get an explicit sentinel: concat_ws silently skips NULLs, so
    # without it ('a', NULL) and (NULL, 'a') — or rows differing only in
    # which field is NULL — would hash equal and dedup could drop
    # genuinely distinct rows.
    safe = [F.coalesce(p.cast("string"), F.lit("\x00")) for p in parts]
    return F.sha2(F.concat_ws("\x1f", *safe), 256)
