"""Monotonic-counter increase with reset handling (PromQL ``rate`` family).

Operational metrics land as ever-increasing counters that occasionally
reset to zero when the emitting process restarts. The meaningful
quantity is the per-sample INCREASE: ``v - lag(v)`` normally, and ``v``
itself across a reset (the counter restarted from zero, so everything
accumulated since the restart is new). This is the standard
Prometheus/QuestDB-operations semantics for rate computations over a
designated-timestamp metric table (reference README.md:58's interactive
analytics surface).

Pure keyed-window composition — one shuffle on the series key, zero
UDFs, whole-stage codegen; at 100 TB it shapes identically to any lag
window. Resets are detected per adjacent pair, so out-of-order ingest
must be settled first (write through the designated-ts layout or an
ORDER-BY-ts materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_increase(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    out: str = "increase",
    order: list[str] | None = None,
) -> DataFrame:
    """Append ``out``: the non-negative increase of the counter ``value``
    per ``key`` in ``(ts, *order)`` order.

    First sample of a series has NULL increase (no prior observation —
    counting ``v`` itself would over-report a counter that predates the
    scrape window). A drop in value is a reset: the increase is the new
    value. NULL samples yield NULL increase and are skipped as the
    baseline for the next sample (lag ignores nulls), matching gauges
    with missing scrapes.
    """
    # Baseline = last non-null PRIOR sample (skips missing scrapes).
    prev_nn = F.last(F.col(value), ignorenulls=True).over(
        Window.partitionBy(key)
        .orderBy(ts, *(order or []))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    delta = F.col(value) - prev_nn
    inc = (
        F.when(F.col(value).isNull() | prev_nn.isNull(), F.lit(None))
        .when(delta < 0, F.col(value))
        .otherwise(delta)
    )
    return df.withColumn(out, inc)
