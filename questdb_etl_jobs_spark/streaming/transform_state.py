"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4.1).

The successor API to applyInPandasWithState (streaming/stateful.py keeps
the older form): a ``StatefulProcessor`` object with named, typed state
variables (value/list/map), optional TTL, and processing/event-time
timers, instead of one opaque state tuple. Both express the same
semantics for the running-totals operator; this module is the
forward-looking form a deployment should prefer — finer-grained state
eviction (per-variable TTL) matters when key cardinality is 10⁹ at
100 TB scale.

Scale posture: state lives in the state store keyed by group (RocksDB
provider on a real cluster — set
``spark.sql.streaming.stateStore.providerClass``); Python sees one
Arrow-batched iterator per (key, micro-batch), so the per-row path
stays vectorized pandas and the operator partitions by the grouping
key like any shuffle.

Sandbox gate — DECISION (round 6, permanent for this environment): the
API's Python↔JVM state protocol is pyspark's generated
``sql/streaming/proto/StateMessage_pb2.py``, which requires the
``google.protobuf`` RUNTIME (descriptor pool, symbol database, wire
serialization) — not just message classes. Vendoring a stub was
evaluated and rejected: generated _pb2 modules bind into protobuf's
descriptor machinery, so a faithful stub is a reimplementation of
protobuf's runtime semantics, a large correctness risk for zero new
capability. The module stays import-clean, the batch-equivalence test
(tests/test_streaming.py::test_transform_with_state_matches_batch)
skips LOUDLY with this rationale, and ``applyInPandasWithState``
(streaming/stateful.py, fully executed in tests) is the supported
stateful-streaming path in this environment; on any real deployment
(protobuf ships with every Spark distribution's Python env) this module
is active and preferred.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

#: Output schema of :func:`running_user_totals_tws`.
TWS_TOTALS_SCHEMA = (
    "buyer string, n_purchases bigint, total_spend bigint, last_seen_us bigint"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-buyer lifetime totals as one ValueState('n, total, last_us').

    Same contract as streaming/stateful.running_user_totals: one updated
    row per key per micro-batch the key appears in (update mode).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n BIGINT, total BIGINT, last_us BIGINT"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total, last_us = self._totals.get()
        else:
            n, total, last_us = 0, 0, 0
        for pdf in rows:
            n += len(pdf)
            total += int(pdf["__amount"].sum())
            if len(pdf):
                last_us = max(last_us, int(pdf["__ts_us"].max()))
        self._totals.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "buyer": [key[0]],
                "n_purchases": [n],
                "total_spend": [total],
                "last_seen_us": [last_us],
            }
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def running_user_totals_tws(
    typed_stream: DataFrame,
    key_col: str = "buyer",
    amount_col: str = "price",
    ts_col: str = "purchase_date",
) -> DataFrame:
    """transformWithStateInPandas twin of stateful.running_user_totals."""
    prepared = typed_stream.select(
        F.col(key_col).alias("buyer"),
        F.col(amount_col).cast("long").alias("__amount"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
    )
    return prepared.groupBy("buyer").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=TWS_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
