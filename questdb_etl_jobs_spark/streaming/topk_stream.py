"""Streaming exact top-k per group: k rows per key as streaming state.

Streaming twin of :func:`operators.topk.topk_per_key` — a live
"current best-k per group" feed over an unbounded keyed stream (the
leaderboard shape: best-priced orders per customer, highest-quality
documents per domain so far). Two levels, mirroring
:mod:`heavyhitters_stream`, so the stateful stage never sees raw rows:

1. **Parallel pre-prune** (stateless ``mapInPandas``, every batch):
   each input partition keeps only its local top-k rows per key —
   output is ≤ k rows per (key × partition) regardless of batch size,
   the same bound the batch operator's grouped threshold pass
   certifies. Each partition's first row per key also carries that
   partition's TRUE row count for the key (``__n``), so the stateful
   stage can report exact rows-absorbed bookkeeping without ever
   receiving the rows.
2. **Stateful exact merge** (``applyInPandasWithState`` keyed by the
   group): state is the current top-k (two k-bounded arrays — ids and
   values) plus the absorbed-row count; each batch merges its ≤ k·P
   pre-pruned candidates with the carried k and keeps the exact best-k
   under the total order ``(value DESC, order_id ASC)``. Emission
   (append mode) is the group's current top-k after every batch it
   appears in, stamped with ``n_seen`` so consumers (and the replay
   gate) can identify the final emission per key.

Determinism: the total order is strict (``order_id`` unique), values
ride through state verbatim (no arithmetic), and max-k-of-a-set is
associative and commutative — the final state is independent of batch
boundaries and arrival order, so the replay gate checks it VALUE-exact
against a CPython recomputation over the whole fixture.

NULL values: rows with a NULL ``value`` count toward ``n_seen`` but
never enter the leaderboard (stated contract — the batch face's
"fill trailing ranks with nulls when a group has < k non-null rows"
behavior is meaningless for a live leaderboard, and NaN comparisons
would make the merge order-dependent).

State size: exactly ``k`` (id, value) pairs + 2 counters per key —
independent of stream volume, the bounded-state contract every
streaming operator in this package holds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def topk_per_key_stream(
    stream: DataFrame,
    key: str,
    value: str,
    order_id: str,
    k: int,
) -> DataFrame:
    """Emit each group's current exact top-``k`` rows after every
    micro-batch that touches it.

    Output (append mode): ``(key, order_id, value, rn, n_seen)`` — one
    row per kept rank per batch, ``rn`` the 1-based rank under
    ``(value DESC, order_id ASC)``, ``n_seen`` the exact number of raw
    rows absorbed for the key so far."""
    if k < 1:
        raise ValueError("k must be >= 1")
    key_t = stream.schema[key].dataType.simpleString()
    id_t = stream.schema[order_id].dataType.simpleString()
    val_t = stream.schema[value].dataType.simpleString()
    cols = [key, order_id, value]

    prune_schema = (
        f"{key} {key_t}, {order_id} {id_t}, {value} {val_t}, __n long"
    )

    def prune(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            counts = pdf.groupby(key, sort=False)[order_id].size()
            # NULL values never enter the leaderboard (Python/NaN sort
            # order is undefined; the batch face's trailing-null-fill
            # contract is meaningless for a live leaderboard) — but
            # they DO count toward n_seen, so keys whose batch slice is
            # all-null still ship one null-valued carrier row for the
            # bookkeeping; merge() absorbs __n and drops the carrier.
            nn = pdf.dropna(subset=[value])
            out = (
                nn.sort_values([value, order_id], ascending=[False, True])
                .groupby(key, sort=False)
                .head(k)[cols]
                .copy()
            )
            missing = counts.index.difference(pd.unique(out[key]))
            if len(missing):
                carriers = (
                    pdf[pdf[key].isin(missing)]
                    .groupby(key, sort=False)
                    .head(1)[cols]
                    .copy()
                )
                carriers[value] = None
                out = pd.concat([out, carriers], ignore_index=True)
            out[value] = out[value].astype(object).where(
                out[value].notna(), None
            )
            out["__n"] = 0
            firsts = out.groupby(key, sort=False).head(1).index
            out.loc[firsts, "__n"] = (
                out.loc[firsts, key].map(counts).astype("int64")
            )
            yield out

    pruned = stream.select(*cols).mapInPandas(prune, prune_schema)

    out_schema = (
        f"{key} {key_t}, {order_id} {id_t}, {value} {val_t}, "
        f"rn int, n_seen long"
    )
    state_schema = f"n long, ids array<{id_t}>, vals array<{val_t}>"

    def merge(
        group_key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, ids, vals = state.get
            best = list(zip(list(vals), list(ids)))
        else:
            n, best = 0, []
        for pdf in pdfs:
            n += int(pdf["__n"].sum())
            live = pdf[pdf[value].notna()]
            best.extend(zip(live[value].tolist(), live[order_id].tolist()))
        # Exact top-k under (value DESC, order_id ASC): sort by id
        # ascending first, then stable-sort by value descending.
        best.sort(key=lambda t: t[1])
        best.sort(key=lambda t: t[0], reverse=True)
        best = best[:k]
        state.update((n, [i for _v, i in best], [v for v, _i in best]))
        yield pd.DataFrame(
            {
                key: [group_key[0]] * len(best),
                order_id: [i for _v, i in best],
                value: [v for v, _i in best],
                "rn": list(range(1, len(best) + 1)),
                "n_seen": [n] * len(best),
            }
        )

    return pruned.groupBy(key).applyInPandasWithState(
        merge,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
