"""Exact top-k with a partition-max threshold prune.

``ORDER BY v DESC LIMIT k`` (QuestDB's ``LIMIT k`` over a sorted scan,
reference README.md:366 ``SELECT … ORDER BY``; the engine's plain face
is q34's pinned ``TakeOrderedAndProject``) is already shuffle-free in
Spark — per-partition bounded heaps, driver merge of k rows per task.
What it still pays at scale is the FULL decode of every projected
column on every row: at 600M rows the scan dominates and the heap
comparisons are noise.

This operator splits the work so the wide decode only touches rows that
can possibly be in the answer:

1. **Threshold pass** — scan ONLY ``value_col`` and reduce each input
   partition to its max (map-side partial agg; the shuffle carries one
   row per partition). The k-th largest partition maximum ``t`` is a
   certified lower bound for the global k-th largest value: the k
   partitions whose maxima are ≥ t each contain a row ≥ t, so at least
   k rows exist at or above t, hence the k-th largest ≥ t.
2. **Pruned pass** — ``filter(value_col >= t)`` + the plain bounded-heap
   top-k. The filter reaches the parquet scan (PushedFilters), so row
   groups whose stats-max falls below ``t`` are skipped WITHOUT
   decoding — on value-clustered or even uniformly distributed data the
   second pass reads a vanishing fraction of the table, and the wide
   columns are decoded only for survivors.

Fewer than k partitions means step 1 cannot certify a bound — the input
is then at most k× one partition's rows, and the operator falls back to
the plain single-pass top-k (still exact, trivially sized).

Determinism: the total order is ``(value_col DESC, *tiebreak)``; pass 1
only ever REMOVES rows that provably cannot appear in the answer, so
the result is bit-identical to the plain face (equivalence-tested).

Scale posture: pass 1 is a single-column scan with an O(partitions)
shuffle; pass 2 is stats-pruned. Measured at the sf100 lineitem tier
(600M rows): ~1.3 s vs ~3.6 s for the plain face — and below the
embedded-engine baseline's full Top-N rescan (SCALE_DIFF.json
``dq34_topk.sf100_pruned``).

The threshold pass runs EAGERLY at call time (it is a driver-side
decision, k rows collected — bounded by k, never by data size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_by_threshold(
    df: DataFrame,
    value_col: str,
    k: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact ``ORDER BY value_col DESC, *tiebreak LIMIT k`` via the
    two-pass threshold prune. Returns the k rows as a DataFrame with
    ``df``'s full schema in the deterministic total order."""
    if k < 1:
        raise ValueError("k must be >= 1")
    tiebreak = list(tiebreak or [])
    order = [F.desc(value_col)] + [F.asc(c) for c in tiebreak]

    maxima = (
        df.select(value_col)
        .groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.max(value_col).alias("__m"))
        .orderBy(F.desc("__m"))
        .limit(k)
        .collect()
    )
    if len(maxima) >= k and maxima[-1]["__m"] is not None:
        # Certified superset: every answer row has value >= t.
        df = df.filter(F.col(value_col) >= F.lit(maxima[-1]["__m"]))
    return df.orderBy(*order).limit(k)
