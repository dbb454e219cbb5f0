"""Streaming heavy hitters: a Misra-Gries sketch as streaming state.

Streaming twin of :mod:`operators.heavyhitters`: a live "top keys so
far" feed over an unbounded stream (trending tokens, hot URLs, loudest
tenants). Two levels, so the stateful task never sees raw data:

1. **Parallel partials** (stateless ``mapInPandas``, every batch): each
   input partition folds its rows into a ≤ ``counters``-slot MG sketch
   — output is sketch-sized no matter the batch size.
2. **Stateful merge** (``applyInPandasWithState`` on one constant
   group): the carried global sketch absorbs the batch's partial
   sketches (MG merge = add weights, then evict by the k-th largest —
   the Agarwal et al. mergeable-summaries construction), and emits the
   current top-k estimates.

The single-group stage is NOT a bottleneck: its input per batch is
``counters × partitions`` summary rows, its state ``counters`` slots —
both independent of stream volume. Emitted weights undercount true
counts by at most ``err`` = the total decrement actually applied across
all sketches (exact bookkeeping: 0 when nothing ever evicted, always ≤
the worst-case ``N/counters``), carried per row so consumers can see
when top-k membership is provably exact (``weight_k − err >
weight_{k+1}`` ⇒ guaranteed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from questdb_etl_jobs_spark.operators.heavyhitters import misra_gries_partials


def heavy_hitters_stream(
    stream: DataFrame,
    col: str,
    k: int,
    counters: int = 256,
) -> DataFrame:
    """Emit the current top-``k`` of ``col`` after every micro-batch.

    Output (append mode): one row per surviving top-k key per batch —
    ``(col, weight, n_total, err, guaranteed)`` where ``weight ≤
    true_count ≤ weight + err`` and ``guaranteed`` states whether the
    whole top-k set is provably exact under that bound."""
    key_t = stream.schema[col].dataType.simpleString()
    partials = misra_gries_partials(
        stream.select(col), col, counters, with_total=True
    )
    out_schema = (
        f"{col} {key_t}, weight long, n_total long, err long, "
        f"guaranteed boolean"
    )

    def merge(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, weights, n_total, d_total = state.get
            slots = dict(zip(keys, weights))
        else:
            slots, n_total, d_total = {}, 0, 0
        for pdf in pdfs:
            # __n carries TRUE partition row counts, __d the partials'
            # applied decrements (exact undercount bound, 0 when no
            # sketch ever evicted) — first row each.
            n_total += int(pdf["__n"].sum())
            d_total += int(pdf["__d"].sum())
            for key, w in zip(pdf[col], pdf["__w"]):
                if w > 0:
                    slots[key] = slots.get(key, 0) + int(w)
        if len(slots) > counters:
            # MG merge eviction: subtract the (counters+1)-th largest
            # weight from everything, drop non-positives.
            cut = sorted(slots.values(), reverse=True)[counters]
            d_total += int(cut)
            slots = {s: w - cut for s, w in slots.items() if w > cut}
        state.update(
            (list(slots.keys()), [int(w) for w in slots.values()],
             int(n_total), int(d_total))
        )
        if not slots:
            return
        err = d_total
        top = sorted(slots.items(), key=lambda kv: (-kv[1], str(kv[0])))
        head, rest = top[:k], top[k:]
        next_w = rest[0][1] if rest else 0
        guaranteed = bool(head[-1][1] - err > next_w)
        yield pd.DataFrame(
            {
                col: [s for s, _ in head],
                "weight": [int(w) for _, w in head],
                "n_total": [int(n_total)] * len(head),
                "err": [int(err)] * len(head),
                "guaranteed": [guaranteed] * len(head),
            }
        )

    grouped = partials.withColumn("__g", F.lit(0)).groupBy("__g")
    return grouped.applyInPandasWithState(
        merge,
        outputStructType=out_schema,
        stateStructType=f"keys array<{key_t}>, weights array<long>, "
                        f"n_total long, d_total long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
