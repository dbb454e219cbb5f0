"""LATEST ON: the most recent row per key by the designated timestamp.

QuestDB idiom over designated-timestamp tables (enabled by reference
sql/create-table.sql:1). Since round 13 the batch face routes through
the grouped threshold prune (:func:`operators.topk.topk_per_key` at
k=1): a narrow ``keys + ts`` scan derives each group's certified max
timestamp (map-side-combined — the exchange carries the group
directory, not the data), the fact table joins that directory back
(size-aware broadcast) and only rows AT the group max reach the window
exchange. The plain ranking window — which shuffles and sorts the FULL
fact table on the key just to keep one row per group — remains as the
fallback for streaming frames (joins inside a streaming plan are
restricted) and as an explicit ``prune=False`` escape hatch; both faces
are equivalence-tested bit-identical.

Scale posture: at the 600M-row tier the plain face exchanges 600M rows
on the key; the pruned face exchanges ~|groups| rows (+ timestamp
ties), with the wide columns decoded only for survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__latest_rn"


def latest_on(
    df: DataFrame,
    ts: str,
    key: list[str],
    tiebreak: list[str] | None = None,
    prune: bool | None = None,
) -> DataFrame:
    """Return the latest row per ``key`` ordered by ``ts``.

    ``tiebreak`` columns (descending) make the result deterministic when
    a key has several rows at the same timestamp.

    ``prune`` selects the physical strategy — the RESULT is identical:

    - ``None`` (default): the grouped threshold prune for batch frames,
      the plain window for streaming frames.
    - ``True`` / ``False``: force the pruned / plain-window face.
    """
    if prune is None:
        prune = not df.isStreaming
    if prune:
        from questdb_etl_jobs_spark.operators.topk import topk_per_key

        return topk_per_key(
            df,
            keys=list(key),
            value_col=ts,
            k=1,
            tiebreak=[(c, "desc") for c in (tiebreak or [])],
        )
    order: list[Column] = [F.col(ts).desc()]
    for c in tiebreak or []:
        order.append(F.col(c).desc())
    window = Window.partitionBy(*key).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(window))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
