"""Exact top-k heavy hitters with a Misra-Gries candidate pass.

Corpus token statistics at 100 TB hit a wall the plain
``groupBy(token).count() + TakeOrdered`` plan doesn't: when distinct
cardinality is enormous (open-vocabulary n-grams, URLs, user ids), the
count shuffle carries one partial row PER DISTINCT KEY even though only
the top k matter. The classic two-phase answer:

1. **Candidate pass** — each input partition summarizes its rows with a
   Misra-Gries sketch of ``counters`` slots (``mapInPandas``: one dict,
   vectorized pandas value_counts feeding it; output ≤ ``counters``
   rows per partition regardless of input size). Summed across
   partitions, MG weights underestimate true counts by at most
   ``N / counters`` total (merged-summary bound, Agarwal et al., "
   Mergeable Summaries", PODS'12) — so every key with true count >
   ``N/counters`` MUST survive as a candidate, and with
   ``counters ≫ k`` the true top-k is contained in the candidate set
   for any realistically skewed distribution (the guarantee is exact
   when the k-th count exceeds ``N/counters``; the returned
   ``guaranteed`` flag states whether it held).
2. **Confirm pass** — exact counts ONLY for candidate keys: the second
   scan's shuffle carries ≤ ``counters × partitions`` distinct keys
   (broadcast semi-join prunes before the aggregation), not the full
   vocabulary.

Both passes are bounded-state and deterministic; ties in the final
ordering break on the key itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(
    df: DataFrame, col: str, counters: int, with_total: bool = False
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``col``: ≤ ``counters``
    rows ``(key, weight)`` per input partition, where ``weight``
    undercounts the partition-local frequency by at most
    ``partition_rows / counters``.

    ``with_total`` appends ``__n`` (the partition's TRUE row count) and
    ``__d`` (the partition's total applied decrement — every eviction
    event subtracts its ``dec`` from EVERY key's possible count, so the
    sum of decs is an exact undercount bound for any key, 0 when the
    sketch never evicted), both on the first output row (0 on the
    rest). A downstream merge recovers total N and a TIGHT error bound
    by summing them — the worst-case ``N/counters`` is ≥ this and
    reports nonzero error even for provably exact sketches (the
    streaming face needs both)."""

    def summarize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        slots: dict = {}
        total = 0
        dec_sum = 0
        for pdf in pdfs:
            total += len(pdf)
            for key, cnt in pdf[col].value_counts().items():
                cnt = int(cnt)
                if key in slots:
                    slots[key] += cnt
                    continue
                slots[key] = cnt
                if len(slots) > counters:
                    # Decrement all by the minimum slot value; evict
                    # zeros (batch form of the one-at-a-time MG step).
                    dec = min(slots.values())
                    dec_sum += dec
                    slots = {
                        s: w - dec for s, w in slots.items() if w > dec
                    }
        keys, weights = list(slots.keys()), list(slots.values())
        if with_total and not slots and total:
            # All slots evicted (uniform weights at the cap) but rows
            # WERE seen: a zero-weight carrier row preserves the count.
            keys, weights = [None], [0]
        out = {col: keys, "__w": weights}
        if with_total:
            pad = [0] * (len(keys) - 1) if keys else []
            out["__n"] = ([total] + pad) if keys else []
            out["__d"] = ([dec_sum] + pad) if keys else []
        yield pd.DataFrame(out)

    schema = f"{df.select(col).schema[col].dataType.simpleString()}"
    out_schema = f"{col} {schema}, __w long"
    if with_total:
        out_schema += ", __n long, __d long"
    return df.select(col).mapInPandas(summarize, schema=out_schema)


def _topk_pass(rows: DataFrame, col: str, k: int, counters: int) -> DataFrame:
    """One candidate+confirm round at a fixed sketch size. Returns
    ``col, cnt, guaranteed`` ordered by ``(cnt desc, col)``; a row's
    ``guaranteed`` is TRUE when its own exact count strictly exceeds the
    merged-MG error bound ``N/counters`` — such a key provably could not
    have been pruned."""
    candidates = (
        misra_gries_partials(rows, col, counters)
        .groupBy(col)
        .agg(F.sum("__w").alias("__lb"))
        .select(col)
    )
    exact = (
        rows.join(F.broadcast(candidates), on=col, how="left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = rows.select(F.count(F.lit(1)).alias("__n"))
    topk = exact.orderBy(F.col("cnt").desc(), F.col(col)).limit(k)
    return topk.crossJoin(F.broadcast(total)).select(
        col,
        "cnt",
        (F.col("cnt") * F.lit(counters) > F.col("__n")).alias("guaranteed"),
    ).orderBy(F.col("cnt").desc(), F.col(col))


def heavy_hitters_topk(
    df: DataFrame,
    col: str,
    k: int,
    counters: int = 1024,
    max_escalations: int = 4,
) -> DataFrame:
    """Exact top-``k`` values of ``col`` by count, auto-escalating the
    sketch until the exactness guarantee holds.

    Runs the MG candidate + exact confirm round; if any returned row has
    ``guaranteed = false`` (its exact count does not clear the
    ``N/counters`` bound, so a true top-k key COULD have been pruned),
    OR the round returned fewer than k rows with distinct values still
    unaccounted for (flat data can evict MG slots, truncating the
    candidate set — a short result must escalate, not pass vacuously),
    the round re-runs with doubled counters, up to ``max_escalations``
    times — callers get the exactness the flag promises without
    hand-tuning ``counters`` to the data's skew. Each escalation doubles
    only the bounded sketch state (``counters`` slots per partition) and
    rescans the input; the guarantee check is a driver-side look at ≤ k
    booleans, not a second shuffle. When fewer than k distinct values
    exist at all, the complete ranking is returned with
    ``guaranteed = true`` (nothing can have been pruned). A distribution
    flat enough to exhaust the escalation budget (k-th count ≤
    N/final_counters) returns the last round's rows with their honest
    ``guaranteed`` flags so the caller sees exactly which rows remain
    unproven.

    Returns ``col, cnt, guaranteed`` ordered by ``(cnt desc, col)``;
    when every row is guaranteed, the result IS the true top-k.
    """
    if k < 1 or counters < k:
        raise ValueError("need counters >= k >= 1")
    if max_escalations < 0:
        raise ValueError("max_escalations must be >= 0")
    rows = df.filter(F.col(col).isNotNull())
    c = counters
    ndv: int | None = None  # computed lazily, only on a short result
    for attempt in range(max_escalations + 1):
        out = _topk_pass(rows, col, k, c)
        collected = out.collect()
        if len(collected) < k:
            # Fewer than k rows means EITHER fewer than k distinct
            # values exist (result is trivially the complete ranking)
            # OR flat data let MG decrements evict candidate slots
            # (result is truncated). ``all(guaranteed)`` is vacuously
            # true on the truncated case, so it must NOT early-break
            # here (round-8 ADVICE): disambiguate with one exact
            # distinct count, then escalate truncated rounds.
            if ndv is None:
                ndv = rows.select(
                    F.count_distinct(F.col(col)).alias("ndv")
                ).first()["ndv"]
            if len(collected) == ndv:
                # Every distinct value survived as a candidate: nothing
                # was pruned, the exact counts ARE the full ranking, so
                # the completeness guarantee holds even where the
                # N/counters magnitude bound does not.
                collected = [
                    type(r)(**{**r.asDict(), "guaranteed": True})
                    for r in collected
                ]
                break
        elif all(r.guaranteed for r in collected):
            break
        if attempt == max_escalations:
            break
        c *= 2
    # Rebuild from the k collected rows: the caller's DataFrame must not
    # silently recompute a pass that was already judged.
    return rows.sparkSession.createDataFrame(collected, schema=out.schema)
