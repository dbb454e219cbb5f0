"""Streaming EMA: the sequential recurrence as per-key streaming state.

The streaming twin of :func:`operators.ema.ema` (same recurrence,
``y = alpha*x + (1-alpha)*y``), maintained across micro-batches with
``applyInPandasWithState``: the state is ONE double per key (the last
EMA), so state-store size is bounded by key cardinality no matter how
long the stream runs — the canonical shape for a smoothing operator
over an unbounded metric feed.

Ordering contract: the recurrence is order-dependent, and streaming
state can only roll forward, so input must arrive time-ordered per key
ACROSS micro-batches (each batch is sorted internally; a row older than
the carried state would need rewind). That matches the reference
deployment's strictly-ordered hourly feed (reference README.md:373) and
this engine's file-arrival replay; for out-of-order sources, settle
through the designated-ts layout and run the batch operator.

Python runs once per (key, batch) over Arrow-transferred pandas frames
— the per-row work is a numpy loop, never Spark-row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "ema double, seeded boolean"


def _out_schema(stream: DataFrame, key: str, id_col: str, value: str,
                result_col: str) -> str:
    """Output schema with key/id types taken from the input stream, so a
    string symbol key or int id works the same as in the batch twins
    (operators/ema.py, operators/counter.py are type-generic)."""
    key_t = stream.schema[key].dataType.simpleString()
    id_t = stream.schema[id_col].dataType.simpleString()
    return (
        f"{key} {key_t}, {id_col} {id_t}, ts_us bigint, "
        f"{value} double, {result_col} double"
    )


def ema_stream(
    stream: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    id_col: str,
) -> DataFrame:
    """Per-key streaming EMA rows ``(key, id, ts_us, value, ema)``.

    ``id_col`` uniquely identifies rows (ts tiebreak + join-back key for
    callers that want the full payload). NULL values carry the previous
    EMA forward, as in the batch operator. Output mode: append — one row
    per input row, emitted in the micro-batch that carried it.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    a = float(alpha)
    one_minus = 1.0 - a
    out_schema = _out_schema(stream, key, id_col, value, "ema")

    def update(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            carried, seeded = state.get
            st = float(carried) if seeded else np.nan
        else:
            st = np.nan
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__ts_us", "__id"]).reset_index(drop=True)
        x = batch["__v"].to_numpy(dtype="float64", na_value=np.nan)
        y = np.empty_like(x)
        for i in range(len(x)):
            xi = x[i]
            if np.isnan(xi):
                y[i] = st
                continue
            st = xi if np.isnan(st) else a * xi + one_minus * st
            y[i] = st
        state.update((0.0 if np.isnan(st) else float(st), not np.isnan(st)))
        yield pd.DataFrame(
            {
                key: batch["__k"],
                id_col: batch["__id"],
                "ts_us": batch["__ts_us"],
                value: [None if np.isnan(v) else float(v) for v in x],
                "ema": [None if np.isnan(v) else float(v) for v in y],
            }
        )

    prepared = stream.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_micros(F.col(ts)).alias("__ts_us"),
        F.col(value).cast("double").alias("__v"),
    )
    return prepared.groupBy("__k").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_COUNTER_STATE_SCHEMA = "prev double, seeded boolean"


def counter_increase_stream(
    stream: DataFrame,
    key: str,
    ts: str,
    value: str,
    id_col: str,
) -> DataFrame:
    """Streaming twin of :func:`operators.counter.counter_increase`:
    per-key reset-corrected counter increases with ONE carried baseline
    per key (the last non-null sample). Same ordering contract and
    Python-per-(key, batch) execution shape as :func:`ema_stream`;
    output ``(key, id, ts_us, value, increase)`` in append mode.
    """
    out_schema = _out_schema(stream, key, id_col, value, "increase")

    def update(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            carried, seeded = state.get
            prev = float(carried) if seeded else np.nan
        else:
            prev = np.nan
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__ts_us", "__id"]).reset_index(drop=True)
        x = batch["__v"].to_numpy(dtype="float64", na_value=np.nan)
        inc = np.empty_like(x)
        for i in range(len(x)):
            xi = x[i]
            if np.isnan(xi) or np.isnan(prev):
                inc[i] = np.nan
            elif xi - prev < 0:
                inc[i] = xi  # reset: the counter restarted from zero
            else:
                inc[i] = xi - prev
            if not np.isnan(xi):
                prev = xi
        state.update(
            (0.0 if np.isnan(prev) else float(prev), not np.isnan(prev))
        )
        yield pd.DataFrame(
            {
                key: batch["__k"],
                id_col: batch["__id"],
                "ts_us": batch["__ts_us"],
                value: [None if np.isnan(v) else float(v) for v in x],
                "increase": [None if np.isnan(v) else float(v) for v in inc],
            }
        )

    prepared = stream.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_micros(F.col(ts)).alias("__ts_us"),
        F.col(value).cast("double").alias("__v"),
    )
    return prepared.groupBy("__k").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_COUNTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_CUSUM_STATE_SCHEMA = "s_pos double, s_neg double"


def cusum_stream(
    stream: DataFrame,
    key: str,
    ts: str,
    value: str,
    target: float,
    id_col: str,
    slack: float = 0.0,
) -> DataFrame:
    """Streaming twin of :func:`operators.cusum.cusum`: Page's test with
    TWO doubles of state per key (the positive/negative accumulators).
    Same ordering contract and per-(key, batch) execution shape as
    :func:`ema_stream`; the batch operator's closed form and this
    recurrence are the same real function (proven by q164's
    recursive-CTE oracle), so the twin equals batch output to float
    tolerance. Output ``(key, id, ts_us, value, cusum_pos, cusum_neg)``
    in append mode."""
    t, k_slack = float(target), float(slack)
    key_t = stream.schema[key].dataType.simpleString()
    id_t = stream.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{key} {key_t}, {id_col} {id_t}, ts_us bigint, "
        f"{value} double, cusum_pos double, cusum_neg double"
    )

    def update(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        sp, sn = state.get if state.exists else (0.0, 0.0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["__ts_us", "__id"]).reset_index(drop=True)
        x = batch["__v"].to_numpy(dtype="float64")
        out_p = np.empty_like(x)
        out_n = np.empty_like(x)
        for i in range(len(x)):
            sp = max(0.0, sp + (x[i] - t - k_slack))
            sn = max(0.0, sn + (t - k_slack - x[i]))
            out_p[i] = sp
            out_n[i] = sn
        state.update((float(sp), float(sn)))
        yield pd.DataFrame(
            {
                key: batch["__k"],
                id_col: batch["__id"],
                "ts_us": batch["__ts_us"],
                value: x,
                "cusum_pos": out_p,
                "cusum_neg": out_n,
            }
        )

    prepared = stream.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.unix_micros(F.col(ts)).alias("__ts_us"),
        F.col(value).cast("double").alias("__v"),
    )
    return prepared.groupBy("__k").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
