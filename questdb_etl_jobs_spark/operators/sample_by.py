"""SAMPLE BY: time-bucketed aggregation over a designated timestamp.

QuestDB's time-bucket aggregation idiom (time-series surface per reference
README.md:70-71; the tutorial's trend chart README.md:369-371 is an hourly
rollup of the loaded table). Maps to a plain groupBy over a truncated
timestamp — partial aggregation (map-side combine) and whole-stage codegen
come from Catalyst; one shuffle keyed by (bucket, keys…).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Buckets accepted as date_trunc units (calendar-aligned, matches the
#: DuckDB oracle's date_trunc semantics).
_TRUNC_UNITS = {
    "year", "quarter", "month", "week", "day", "hour", "minute", "second",
}


def sample_by(
    df: DataFrame,
    ts: str,
    bucket: str,
    aggs: list[Column],
    keys: list[str] | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Aggregate ``df`` into calendar buckets of ``ts``.

    ``bucket`` is a date_trunc unit (``"hour"``) or an arbitrary interval
    like ``"15 minutes"`` (aligned to the epoch via ``window``).
    """
    if bucket in _TRUNC_UNITS:
        bucket_expr = F.date_trunc(bucket, F.col(ts))
    else:
        bucket_expr = F.window(F.col(ts), bucket).getField("start")
    grouped = df.groupBy(bucket_expr.alias(bucket_col), *(keys or []))
    return grouped.agg(*aggs)
