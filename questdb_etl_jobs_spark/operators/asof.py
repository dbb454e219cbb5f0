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
cardinality; a hot key (one user with billions of events) serializes into
one task — pre-bucket by (key, coarse time) if that shape is expected.

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
) -> DataFrame:
    """Join each left row to the latest right row with ``right.on <= left.on``
    (``<`` when ``strict``), matching on the ``by`` key columns.

    Right columns other than ``by`` come back suffixed with ``suffix``.
    ``how`` is ``"left"`` (unmatched left rows keep NULL right columns) or
    ``"inner"`` (unmatched left rows drop).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    by = list(by or [])

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
