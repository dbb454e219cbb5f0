"""LATEST ON: the most recent row per key by the designated timestamp.

QuestDB idiom over designated-timestamp tables (enabled by reference
sql/create-table.sql:1). Three physical strategies, one result
(equivalence-tested bit-identical under ties, NULL timestamps, and
all-null groups); the choice is MEASUREMENT-driven, sf100 cells in
SCALE_DIFF.json ``dq33_latest_on`` (100M events, 1.5M keys):

- **"window" (default — batch AND streaming).** The ranking window.
  This is NOT a full-data shuffle on Spark ≥3.5: the ``rn = 1`` filter
  plans a map-side ``WindowGroupLimit``, so each task keeps only its
  local top row per key BEFORE the exchange — the shuffle carries at
  most one row per (input partition × key), the same directory bound
  the threshold prune certifies, without a second scan or a join.
  Measured 3.6–3.9 s at the sf100 tier (1.00× DuckDB's full window) —
  the fastest face at LATEST ON's common high-cardinality shape
  (plan-asserted: the partial WindowGroupLimit sits below the
  exchange).
- **"prune".** :func:`operators.topk.topk_per_key` at k=1 — a narrow
  key+ts scan derives each group's certified max, joined back so only
  rows at the max reach the final window. Pays a second scan and the
  directory join; at 1.5M keys the directory IS the answer key set, so
  the join-back is pure overhead (measured ~7.5 s = ~2× the window).
  Selectable for the small-directory + wide-payload shape where the
  grouped prune family measures its wins (q172: 15k keys over 150M
  rows — the window's local sort of the full fact table is the cost
  the prune deletes there).
- **"agg".** ``groupBy(key).agg(max_by(struct(*row), struct(ts,
  *tiebreak)))`` — one aggregation, no window. Looks optimal, but a
  whole-row struct buffer forces SortAggregate (no mutable/object hash
  path for declarative aggs with struct buffers), so it local-sorts
  everything the window face sorts and then merges struct buffers:
  measured ~6.7 s. Kept selectable and measured so the choice above
  stays honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__latest_rn"
_ROW = "__latest_row"


def latest_on(
    df: DataFrame,
    ts: str,
    key: list[str],
    tiebreak: list[str] | None = None,
    strategy: str | None = None,
) -> DataFrame:
    """Return the latest row per ``key`` ordered by ``ts``.

    ``tiebreak`` columns (descending) make the result deterministic when
    a key has several rows at the same timestamp.

    ``strategy`` selects the physical plan — the RESULT is identical:
    ``None``/``"window"`` (the deployed face; map-side
    WindowGroupLimit bounds the exchange at one row per partition ×
    key), ``"prune"`` (grouped threshold prune: wins at small key
    directories with wide payloads), ``"agg"`` (single max_by
    aggregate; see the module docstring's measured numbers).
    """
    if strategy is None:
        strategy = "window"
    if strategy == "agg":
        if not df.isStreaming:
            # max_by over a (ts, *tiebreak) struct: Spark's struct
            # ordering seats a NULL ts field lowest (null-ts rows lose
            # to any real timestamp, like the window's desc-nulls-last)
            # and compares tiebreak fields on ties — including
            # all-null-ts groups, where the tiebreak alone decides.
            ordk = F.struct(F.col(ts), *[F.col(c) for c in tiebreak or []])
            packed = df.groupBy(*key).agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in df.columns]), ordk
                ).alias(_ROW)
            )
            return packed.select(f"{_ROW}.*")
        strategy = "window"  # streaming: whole-row agg needs update mode
    if strategy == "prune":
        if not df.isStreaming:
            from questdb_etl_jobs_spark.operators.topk import topk_per_key

            return topk_per_key(
                df,
                keys=list(key),
                value_col=ts,
                k=1,
                tiebreak=[(c, "desc") for c in (tiebreak or [])],
            )
        strategy = "window"  # streaming: no self-join inside the plan
    if strategy != "window":
        raise ValueError(
            f"strategy must be 'window', 'prune' or 'agg', got {strategy!r}"
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
