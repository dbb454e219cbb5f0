"""Slowly-changing-dimension (SCD Type 2) build + point-in-time join.

The reference pipeline loads an append-only, time-ordered purchase stream
into a designated-timestamp table (`/root/reference/sql/create-table.sql:1`,
`README.md:70-71`); the canonical warehouse follow-on is deriving a
*versioned dimension* from such a stream (who was in which state, when)
and enriching facts with the state that was current at fact time. QuestDB
expresses the probe side of this as ``ASOF JOIN``; the build side — run-
length collapsing an attribute stream into ``[valid_from, valid_to)``
intervals — is the classic gaps-and-islands construction.

Scale posture (100 TB):

- :func:`scd2_intervals` is two window passes + one aggregation, all
  partitioned by the dimension key — Spark plans ONE exchange on the key
  and reuses it for both windows and the groupBy (same partitioning
  expression), so the build is a single shuffle of the change stream.
- :func:`pit_join` does NOT range-join against the interval table — for
  non-overlapping validity intervals the point-in-time match is exactly
  an as-of join on ``valid_from`` (the latest version starting at or
  before the fact timestamp), so it delegates to
  :func:`~questdb_etl_jobs_spark.operators.asof.asof_join` (one shuffle,
  no explode) and then applies the ``valid_to`` open-interval check as a
  codegen filter. A BETWEEN theta-join would be a cross product per key;
  this is linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.operators.asof import asof_join


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    order: list[str] | None = None,
) -> DataFrame:
    """Collapse an attribute change stream into SCD2 validity intervals.

    Consecutive rows (per ``key``, ordered by ``ts`` then ``order``
    tiebreakers) holding the same ``attr`` value merge into one version
    row. Returns one row per version:

    ``key, attr, version (1-based), valid_from, valid_to, n_rows``

    ``valid_to`` is the next version's ``valid_from`` (half-open
    ``[from, to)`` convention) and NULL for the current version.
    """
    tiebreak = list(order or [])
    w = Window.partitionBy(key).orderBy(ts, *tiebreak)
    # Change flag: 1 when this row's attr differs from the previous row's
    # (NULL-safe so NULL attrs form runs too); first row per key is 1.
    prev = F.lag(attr).over(w)
    prev_seen = F.lag(F.lit(1)).over(w)
    change = F.when(
        prev_seen.isNull() | ~F.col(attr).eqNullSafe(prev), 1
    ).otherwise(0)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = df.select(
        key, attr, ts, *tiebreak, change.alias("__chg")
    ).withColumn("version", F.sum("__chg").over(w_cum))
    per_run = runs.groupBy(key, "version").agg(
        F.first(attr).alias(attr),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w_ver = Window.partitionBy(key).orderBy("version")
    return per_run.withColumn(
        "valid_to", F.lead("valid_from").over(w_ver)
    ).select(key, attr, "version", "valid_from", "valid_to", "n_rows")


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str,
    how: str = "left",
) -> DataFrame:
    """Enrich ``facts`` with the ``dim`` version valid at fact time.

    ``dim`` must be an SCD2 table with ``key, valid_from, valid_to``
    (half-open, NULL ``valid_to`` = current) and non-overlapping intervals
    per key — exactly what :func:`scd2_intervals` emits. Implemented as an
    as-of join on ``valid_from`` plus the ``valid_to`` bound as a filter;
    facts outside every interval get NULL dim columns (``how="left"``)
    or drop (``how="inner"``). Fact columns keep their names; dim payload
    columns arrive unsuffixed unless they clash with a fact column
    (rename before joining if that matters).
    """
    if how not in ("left", "inner"):
        raise ValueError("pit_join supports how='left' or 'inner'")
    # as-of joins share one `on` column name: present the dim keyed by its
    # valid_from under the facts' ts name; the clash-suffix brings it back
    # as `{ts}__vf`, renamed to valid_from below.
    dim_r = dim.withColumnRenamed("valid_from", ts)
    enriched = asof_join(
        facts, dim_r, on=ts, by=[key], suffix="__vf", how="left"
    )
    enriched = enriched.withColumnRenamed(f"{ts}__vf", "valid_from")
    # With contiguous intervals the as-of match is automatically inside
    # its interval; the valid_to bound only bites when the dim has gaps.
    in_interval = F.col("valid_from").isNotNull() & (
        F.col("valid_to").isNull() | (F.col(ts) < F.col("valid_to"))
    )
    dim_cols = [c for c in dim.columns if c != key]
    cleared = enriched.select(
        *[F.col(c) for c in facts.columns],
        *[F.when(in_interval, F.col(c)).alias(c) for c in dim_cols],
    )
    if how == "inner":
        return cleared.filter(F.col("valid_from").isNotNull())
    return cleared
