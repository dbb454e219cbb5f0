"""Custom stateful streaming operators via applyInPandasWithState.

The built-in stateful operators (windowed aggs, dropDuplicates, stream
joins) cover the reference's surface; this module is the escape hatch for
operator semantics Spark lacks — arbitrary per-key state machines over an
unbounded stream, Arrow-batched per micro-batch.

Scale posture: state lives in the state store keyed by the group — size it
by keys, not events; always pair with a watermark-based timeout (or accept
unbounded key cardinality consciously). Python runs once per (key, batch),
not per row — the per-row path stays in pandas vectorized ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema of :func:`running_user_totals`.
RUNNING_TOTALS_SCHEMA = "buyer string, n_purchases bigint, total_spend bigint, last_seen_us bigint"
_STATE_SCHEMA = "n bigint, total bigint, last_us bigint"


def running_user_totals(
    typed_stream: DataFrame,
    key_col: str = "buyer",
    amount_col: str = "price",
    ts_col: str = "purchase_date",
) -> DataFrame:
    """Per-buyer lifetime purchase totals, maintained as streaming state.

    Emits one updated row per key per micro-batch in which the key
    appeared (outputMode update): (buyer, n_purchases, total_spend,
    last_seen_us). State is three scalars per key — bounded by buyer
    cardinality, independent of event volume.
    """
    from pyspark.sql import functions as F

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, last_us = state.get
        else:
            n, total, last_us = 0, 0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += int(pdf["__amount"].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["__ts_us"].max()))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "buyer": [key[0]],
                "n_purchases": [n],
                "total_spend": [total],
                "last_seen_us": [last_us],
            }
        )

    prepared = typed_stream.select(
        F.col(key_col).alias("buyer"),
        F.col(amount_col).cast("long").alias("__amount"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
    )
    return prepared.groupBy("buyer").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
