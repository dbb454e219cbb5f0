"""Streaming t-digest: per-key quantile sketches as streaming state.

The streaming twin of :mod:`operators.tdigest`: each micro-batch's
values are compressed and merged into a carried per-key digest with
``applyInPandasWithState``, and the operator emits one row per (key,
micro-batch) carrying the digest's CURRENT quantile estimates — a live
latency/price percentile feed whose state is ≤ ~2δ centroids per key
forever, no matter how many rows stream through. (Spark's own
``approx_percentile`` cannot do this: Greenwald-Khanna partials are not
mergeable with carried state across micro-batches.)

Unlike the EMA/counter twins there is NO ordering contract: a digest is
order-insensitive up to its accuracy bound, so late or shuffled rows
merge the same way — the right property for an unbounded monitoring
feed. Python runs once per (key, batch); the merge is the same bounded
``_compress`` the batch operator uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from questdb_etl_jobs_spark.operators.tdigest import DEFAULT_DELTA, _compress

_STATE_SCHEMA = "means array<double>, weights array<double>"


def _digest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Mid-centroid interpolation (the batch evaluator's arithmetic, in
    numpy: the streaming face computes estimates inside the state fn)."""
    cum = np.cumsum(weights) - weights / 2.0
    target = q * float(weights.sum())
    return float(np.interp(target, cum, means))


def tdigest_stream(
    stream: DataFrame,
    key: str,
    value: str,
    qs: list[float],
    delta: int = DEFAULT_DELTA,
) -> DataFrame:
    """Per-key streaming quantile estimates.

    Output (append mode): one row per (key, micro-batch) —
    ``(key, n, q_<pct>…)`` where ``n`` is total rows absorbed so far and
    each ``q_<pct>`` estimates that quantile over EVERYTHING seen.
    NULL values are skipped; a batch of only NULLs still emits the
    carried digest's current estimates.
    """
    key_t = stream.schema[key].dataType.simpleString()
    qcols = [f"q_{int(round(q * 100)):02d}" for q in qs]
    out_schema = f"{key} {key_t}, n bigint, " + ", ".join(
        f"{c} double" for c in qcols
    )

    def update(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            means, weights = state.get
            means = np.asarray(means, dtype=np.float64)
            weights = np.asarray(weights, dtype=np.float64)
        else:
            means = np.empty(0)
            weights = np.empty(0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        v = batch["__v"].dropna().to_numpy(dtype=np.float64)
        if len(v):
            means = np.concatenate([means, v])
            weights = np.concatenate([weights, np.ones(len(v))])
            means, weights = _compress(means, weights, delta)
            # Plain Python floats: the state pickler rejects np.float64.
            state.update(
                ([float(x) for x in means], [float(x) for x in weights])
            )
        if not len(means):
            return
        row = {key: [group_key[0]], "n": [int(round(weights.sum()))]}
        for q, c in zip(qs, qcols):
            row[c] = [_digest_quantile(means, weights, q)]
        yield pd.DataFrame(row)

    prepared = stream.select(
        F.col(key).alias("__k"),
        F.col(value).cast("double").alias("__v"),
    ).withColumnRenamed("__k", key)
    return prepared.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
