"""LATEST ON: the most recent row per key by the designated timestamp.

QuestDB idiom over designated-timestamp tables (enabled by reference
sql/create-table.sql:1). Implemented as a ranking window — one shuffle on
the key, no join. With AQE the partial top-1 per key is effectively
map-side-reduced by the sort spill; for extreme key cardinality this plan
(window) beats groupBy(max)+self-join (two shuffles).
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
) -> DataFrame:
    """Return the latest row per ``key`` ordered by ``ts``.

    ``tiebreak`` columns (descending) make the result deterministic when a
    key has several rows at the same timestamp.
    """
    order: list[Column] = [F.col(ts).desc()]
    for c in tiebreak or []:
        order.append(F.col(c).desc())
    window = Window.partitionBy(*key).orderBy(*order)
    return (
        df.withColumn(_RN, F.row_number().over(window))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
