"""Streaming KMV distinct count: the k-minimum-values sketch as state.

Streaming twin of :func:`operators.sketch.kmv_distinct`: a live
per-key distinct-cardinality feed whose state is the k smallest
DISTINCT ``xxhash64`` values per key — bounded forever, mergeable, and
(unlike HLL register noise or t-digest centroid drift) fully
DETERMINISTIC: the k smallest of a set do not depend on arrival order
or batch boundaries, so the streaming face is bit-identical to the
batch sketch over the same rows and can be differentially verified
value-for-value, not just bound-gated.

Hashing stays JVM-side (``F.xxhash64`` before the stateful operator);
Python only merges sorted long arrays, ≤k per key per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TWO63 = 2.0**63
_TWO64 = 2.0**64


def kmv_distinct_stream(
    stream: DataFrame,
    key: str,
    value: str,
    k: int = 32,
) -> DataFrame:
    """Emit the current KMV distinct estimate per key after every
    micro-batch.

    Output (append mode): ``(key, n_seen, kth_hash, n_min,
    est_distinct)`` — ``n_seen`` total rows absorbed (monotone, so the
    latest emission per key is identifiable), and the same
    ``kth_hash/n_min/est_distinct`` contract as the batch operator:
    ``n_min < k`` means the estimate IS the exact distinct count.
    """
    key_t = stream.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_t}, n_seen bigint, kth_hash long, n_min int, "
        f"est_distinct double"
    )

    def update(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins, n_seen = state.get
            mins = set(mins)
        else:
            mins, n_seen = set(), 0
        for pdf in pdfs:
            n_seen += len(pdf)
            mins.update(int(h) for h in pdf["__h"])
        frontier = sorted(mins)[:k]
        state.update(([int(h) for h in frontier], int(n_seen)))
        n_min = len(frontier)
        kth = frontier[-1] if frontier else 0
        if n_min < k:
            est = float(n_min)
        else:
            est = (k - 1) / ((float(kth) + _TWO63) / _TWO64)
        yield pd.DataFrame(
            {
                key: [group_key[0]],
                "n_seen": [int(n_seen)],
                "kth_hash": [int(kth)],
                "n_min": [int(n_min)],
                "est_distinct": [est],
            }
        )

    prepared = stream.select(
        F.col(key).alias(key), F.xxhash64(value).alias("__h")
    )
    return prepared.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="mins array<long>, n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
