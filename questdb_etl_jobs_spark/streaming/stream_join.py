"""Stream-stream joins with watermark-bounded state.

The last Structured Streaming shape in the engine's surface: joining two
UNBOUNDED inputs. Unlike a stream-static join (file_stream tables ⋈
dimension), both sides buffer state; the join is only feasible because
watermarks + a time-range predicate bound how long either side must be
retained (Spark evicts buffered rows once they can no longer match).

Scale posture: state size = input rate × the join window, independent of
stream lifetime. The equality key partitions state across executors like
any shuffle; the time-range predicate is what lets the state store
evict — a stream-stream join WITHOUT a time bound grows state forever
and is a deployment bug, so this module's API makes the tolerance
mandatory.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance: str,
    on: list[str],
    watermark: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys + ``|l.ts − r.ts| ≤ tolerance``.

    The streaming face of operators/interval.interval_join (the batch
    operator bucketizes to an equi-join; streams instead give Spark the
    raw range predicate, which is exactly what its state eviction
    reasons over). Both sides get ``watermark`` on their own event-time
    column — zero lateness matches the reference's strictly-ordered
    hourly feed (reference README.md:373); raise it for out-of-order
    sources and state retention stretches accordingly.

    ``how='inner'`` only: outer stream-stream joins emit NULL matches
    when state expires, which couples row content to trigger timing —
    callers that need it should watermark generously and accept that
    results are only settled past the watermark.
    """
    if how != "inner":
        raise ValueError("interval_stream_join supports how='inner'")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    conds = [lw[c] == rw[c] for c in on]
    conds.append(
        lw[left_ts].between(
            rw[right_ts] - F.expr(f"INTERVAL {tolerance}"),
            rw[right_ts] + F.expr(f"INTERVAL {tolerance}"),
        )
    )
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    joined = lw.join(rw, cond, "inner")
    # De-duplicate the equality keys (both sides carry them).
    return joined.drop(*[rw[c] for c in on])
