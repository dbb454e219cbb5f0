"""As-of join: each left row ↔ the latest right row at-or-before its time.

QuestDB's signature time-series join over designated-timestamp tables
(enabled by reference sql/create-table.sql:1; time-series surface per
reference README.md:70-71). Spark SQL has no ASOF built-in, so this is a
library operator composed from a union and one ordered window:

    union(tagged left, tagged right)
      → Window.partitionBy(by).orderBy(ts, side)
      → last(right payload struct, ignorenulls=True) carry-forward
      → keep left rows

Cost model: exactly ONE shuffle (hash partition by ``by``) + one sort —
the same cost as a sort-merge join, independent of how far back matches
are. A naive implementation (range join + max-per-key) would shuffle twice
and explode intermediates. At 100 TB: partitions are bounded by key
cardinality; a hot key (one user with billions of events) would serialize
into one task — pass ``bucket="1 hour"`` to partition the window by
(key, coarse time) instead, with a tiny per-bucket summary window carrying
payloads across boundaries (equivalence-tested against the plain path).

Measured at tier (SCALE_DIFF ``dq15_asof``, round 14): 100M events ⋈
10M signups over 1.5M users runs 7.9 s vs 4.0 s for DuckDB's NATIVE
ASOF JOIN (1.99× raw; committed two-tier marginal fit 1.94×) — within
2× of an embedded engine's specialized operator while staying a plain
one-exchange plan; the bucketed hot-key face measured 3.67× on the same
tier, which is why it is opt-in, not default.

The right payload is carried as a single struct so legitimate NULLs inside
right columns survive (ignorenulls must only skip "no right row yet").
Ties: multiple right rows at identical (by, ts) resolve to the one latest
in the sort; keep right (by, ts) unique for deterministic output (DuckDB's
ASOF JOIN — the oracle — has the same caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    how: str = "left",
    bucket: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Join each left row to the latest right row with ``right.on <= left.on``
    (``<`` when ``strict``), matching on the ``by`` key columns.

    Right columns other than ``by`` come back suffixed with ``suffix``.
    ``how`` is ``"left"`` (unmatched left rows keep NULL right columns) or
    ``"inner"`` (unmatched left rows drop).

    ``tolerance`` (QuestDB ``ASOF JOIN ... TOLERANCE '1m'``) bounds how
    stale a match may be: a carried right row with
    ``left.on - right.on > tolerance`` is treated as no match (NULL right
    columns under ``"left"``, dropped under ``"inner"``). Accepts
    ``"30 seconds"``-style specs or QuestDB-style compact ``'30s'`` /
    ``'5m'`` / ``'2h'`` / ``'1d'``. Because the as-of match is the
    *closest* preceding row, nulling it out when beyond tolerance is
    exact — no other row could qualify. The bound is applied as a plain
    codegen predicate after the carry, so the one-shuffle cost model is
    unchanged.

    ``bucket`` (e.g. ``"1 hour"``) enables hot-key mitigation: the window
    partitions by (key, coarse time bucket) so one key's billions of
    events spread across buckets instead of serializing into one task; a
    per-(key, bucket) summary window (tiny — one row per bucket) carries
    the last right payload across bucket boundaries. Same results, two
    extra small shuffles — use when a key's row count can exceed one
    task's memory.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    by = list(by or [])
    if bucket is not None:
        return _asof_join_bucketed(
            left, right, on, by, suffix, strict, how, bucket, tolerance
        )

    payload_cols = [c for c in right.columns if c not in by]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload.alias(_PAYLOAD)).schema[_PAYLOAD].dataType

    # Side ordering at equal ts decides <= vs < : for <= the right row must
    # sort BEFORE the left row (visible to the window); for < after.
    right_side, left_side = (0, 1) if not strict else (1, 0)

    right_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__asof_ts"),
        F.lit(right_side).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    left_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__asof_ts"),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    window = (
        Window.partitionBy(*by)
        .orderBy("__asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = right_tagged.unionByName(left_tagged).withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(window)
    )

    kept = carried.filter(F.col(_SIDE) == left_side)
    if tolerance is not None:
        kept = _apply_tolerance(kept, on, tolerance)
    if how == "inner":
        # The whole payload struct is NULL iff no right row preceded.
        kept = kept.filter(F.col(_PAYLOAD).isNotNull())
    return kept.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[
            F.col(f"{_PAYLOAD}.{c}").alias(
                c + suffix if c in left.columns or c == on else c
            )
            for c in payload_cols
        ],
    )


def splice_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    suffix: str = "_right",
    side_col: str = "side",
) -> DataFrame:
    """QuestDB SPLICE JOIN: the full-outer as-of join (reference QuestDB
    SQL surface beside ASOF/LT; time-series joins per reference
    README.md:70-71).

    Output has one row per input row from BOTH tables; each row carries
    the latest row of the *other* table with ``other.on <= this.on``
    (NULLs when none precedes). Left columns keep their names, right
    columns clash-suffixed with ``suffix``; ``side_col`` is 'L'/'R' for
    the originating table.

    Plan: ONE hash shuffle on ``by`` feeds two sorted window passes
    (Catalyst reuses the single Exchange; the two sorts differ only in
    the tie order of the side tag, so each direction sees equal-``on``
    rows of the other side). No join, no second shuffle — same cost
    model as :func:`asof_join`. Ties within one side at equal
    (by, on) resolve arbitrarily, as in DuckDB's ASOF (keep (by, on)
    unique per side for deterministic output).
    """
    by = list(by or [])
    l_payload_cols = [c for c in left.columns if c not in by]
    r_payload_cols = [c for c in right.columns if c not in by]
    l_struct = F.struct(*[F.col(c) for c in l_payload_cols])
    r_struct = F.struct(*[F.col(c) for c in r_payload_cols])
    l_type = left.select(l_struct.alias("p")).schema["p"].dataType
    r_type = right.select(r_struct.alias("p")).schema["p"].dataType

    left_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.lit("L").alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    right_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.lit("R").alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    union = left_tagged.unionByName(right_tagged)

    # Carry of the RIGHT payload: right rows must sort before left rows
    # at equal ts (so a left row sees an equal-ts right row), and vice
    # versa for the LEFT carry. Same partitioning → one Exchange.
    right_first = F.when(F.col("__side") == "R", 0).otherwise(1)
    left_first = F.when(F.col("__side") == "L", 0).otherwise(1)
    w_r = (
        Window.partitionBy(*by)
        .orderBy("__ts", right_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_l = (
        Window.partitionBy(*by)
        .orderBy("__ts", left_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = union.select(
        *by,
        F.col("__side").alias(side_col),
        F.last("__l", ignorenulls=True).over(w_l).alias("__l"),
        F.last("__r", ignorenulls=True).over(w_r).alias("__r"),
    )
    return carried.select(
        *by,
        side_col,
        *[F.col(f"__l.{c}").alias(c) for c in l_payload_cols],
        *[
            F.col(f"__r.{c}").alias(
                c + suffix if c in l_payload_cols or c in by else c
            )
            for c in r_payload_cols
        ],
    )


_UNIT_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


_UNIT_US_COMPACT = {
    "us": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
    "d": 86_400_000_000,
}


def _interval_us(spec: str) -> int:
    """``"30 seconds"`` or QuestDB-compact ``"30s"/"5m"/"2h"/"1d"``."""
    parts = spec.split()
    if len(parts) == 2:
        return int(parts[0]) * _UNIT_US[parts[1]]
    s = spec.strip()
    for suf in sorted(_UNIT_US_COMPACT, key=len, reverse=True):
        if s.endswith(suf) and s[: -len(suf)].isdigit():
            return int(s[: -len(suf)]) * _UNIT_US_COMPACT[suf]
    raise ValueError(f"unparseable interval spec {spec!r}")


def _apply_tolerance(kept: DataFrame, on: str, tolerance: str) -> DataFrame:
    """NULL the carried payload where the match is older than ``tolerance``.

    Runs on the post-carry rows (left side only), where ``__asof_ts`` is
    the left timestamp and the payload struct holds the matched right
    row including its ``on`` field. Pure Column predicate — no extra
    shuffle, stays in the same codegen stage as the window's project.
    """
    tol_us = _interval_us(tolerance)
    fresh = (
        F.unix_micros(F.col("__asof_ts"))
        - F.unix_micros(F.col(_PAYLOAD)[on])
    ) <= F.lit(tol_us)
    return kept.withColumn(
        _PAYLOAD, F.when(fresh, F.col(_PAYLOAD))
    )


def _asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    suffix: str,
    strict: bool,
    how: str,
    bucket: str,
    tolerance: str | None = None,
) -> DataFrame:
    """Hot-key-safe as-of join: window per (key, time bucket) + a tiny
    per-bucket summary window carrying payloads across bucket boundaries.

    Equivalent to the single-window plan (equivalence-tested); the big
    window state is bounded by rows-per-(key, bucket) instead of
    rows-per-key.
    """
    bucket_us = _interval_us(bucket)
    payload_cols = [c for c in right.columns if c not in by]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload.alias(_PAYLOAD)).schema[_PAYLOAD].dataType
    right_side, left_side = (0, 1) if not strict else (1, 0)

    right_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__asof_ts"),
        F.lit(right_side).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
        ],
    )
    left_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__asof_ts"),
        F.lit(left_side).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    union = right_tagged.unionByName(left_tagged).withColumn(
        "__bkt", F.floor(F.unix_micros("__asof_ts") / F.lit(bucket_us))
    )

    # In-bucket carry: one task per (key, bucket), hot keys parallelized.
    w_in = (
        Window.partitionBy(*by, "__bkt")
        .orderBy("__asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = union.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w_in)
    )

    # Per-bucket summary (ONE row per (key, bucket) present): the last
    # carried payload in the bucket — NULL iff the bucket saw no right row.
    summary = carried.groupBy(*by, "__bkt").agg(
        F.max_by(F.col(_PAYLOAD), F.struct("__asof_ts", _SIDE)).alias("__blast")
    )
    w_prev = (
        Window.partitionBy(*by)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = summary.select(
        *by,
        "__bkt",
        F.last("__blast", ignorenulls=True).over(w_prev).alias("__carry"),
    )

    joined = carried.join(carry_in, on=[*by, "__bkt"], how="left").withColumn(
        _PAYLOAD, F.coalesce(F.col(_PAYLOAD), F.col("__carry"))
    )
    kept = joined.filter(F.col(_SIDE) == left_side)
    if tolerance is not None:
        kept = _apply_tolerance(kept, on, tolerance)
    if how == "inner":
        kept = kept.filter(F.col(_PAYLOAD).isNotNull())
    return kept.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[
            F.col(f"{_PAYLOAD}.{c}").alias(
                c + suffix if c in left.columns or c == on else c
            )
            for c in payload_cols
        ],
    )
