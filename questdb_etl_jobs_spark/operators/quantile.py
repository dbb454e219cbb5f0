"""Exact distributed quantiles without a global sort.

Part of the QuestDB analytic surface over loaded tables (percentiles on
designated-timestamp tables; reference README.md:58 directs the reader to
interactive SQL over the ingested data). Spark's built-in ``percentile``
is exact but sorts every group's values inside the aggregate buffer;
``approx_percentile`` is bounded-error. This operator gets the EXACT
value with bounded memory per task — the classic two-phase histogram
scheme, expressed END-TO-END as DataFrame plans (nothing but the final
result ever reaches the driver, so group cardinality is unbounded):

1. one aggregate pass: per group ``n, min, max`` (map-side partial agg);
2. one histogram pass: rows join their group's stats (AQE broadcasts the
   stats side when small, shuffles when the group space is huge) and
   bucket into a fixed-width ``B``-bucket histogram — shuffled state is
   O(groups × B), independent of row count;
3. the cumulative walk that locates the bucket(s) holding the target
   order statistics ``k = (n-1)·q`` (floor and ceil) is a prefix-sum
   WINDOW over the histogram (partitioned by group, ordered by bucket) —
   distributed, not a driver loop;
4. one targeted pass: only rows in target buckets (a ``groups × ≤2``-row
   join) are ranked; a final per-group aggregate interpolates.

The refine set per group is ~n/B rows on even data; pathological piles
in one bucket degrade toward a per-group sort of that pile (recursive
re-bucketing would fix it; not needed for the engine's data). Scale
posture: no collect, no per-group literals in the plan (plan size is
O(1) in group count — asserted by tests/test_operators.py's 10⁴-group
case), NULL group keys flow through via null-safe joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantile(
    df: DataFrame,
    value: str,
    group: str,
    q: float = 0.5,
    buckets: int = 4096,
    broadcast_targets: bool = False,
) -> DataFrame:
    """Exact linear-interpolation quantile of ``value`` per ``group``
    (same definition as ANSI ``percentile_cont`` / Spark ``percentile``:
    ``h = (n-1)·q``, interpolate between the ``⌊h⌋``-th and ``⌈h⌉``-th
    order statistics). Returns ``group, n, quantile (double)``.

    NULL values are ignored (SQL aggregate semantics); a group with no
    non-NULL values is dropped. A NULL group KEY is its own group, as in
    ``GROUP BY``.

    ``broadcast_targets`` (r18 optimization, guide §3.1/§2.4): the
    target-bucket table is ≤2 rows PER GROUP, so ``True`` hints the
    refine join broadcast — statically removing the full-data exchange
    the planner's sort-merge default put under the join (every surviving
    row was hash-shuffled on (group, bucket) before the ≤2-per-group
    filter; with the hint, rows stream from the scan straight into the
    join and only the refine set — ~n/buckets rows per group — reaches
    the ranking window's exchange). OPT-IN (r19, round-18 ADVICE): the
    hint bypasses ``autoBroadcastJoinThreshold`` and broadcast relations
    cap at 8 GB / 512M rows, so on a group space the CALLER cannot bound
    it can fail jobs that a shuffle join would run; the operator cannot
    see group cardinality at plan time, so the safe default is False
    (AQE still converts to a broadcast join at runtime when the
    materialized targets side is small). Pass True when the group
    domain is known small — the engine's own call sites do.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    rows = df.filter(F.col(value).isNotNull()).select(group, value)

    stats = rows.groupBy(group).agg(
        F.count(value).alias("__n"),
        F.min(value).alias("__lo"),
        F.max(value).alias("__hi"),
    )

    # Target order statistics per group (expressions over __n, evaluated
    # wherever the stats row is present — never materialized driver-side).
    h = (F.col("__n") - 1) * F.lit(float(q))
    k1 = F.floor(h).cast("long")
    k2 = F.ceil(h).cast("long")

    # Histogram pass: bucket id from the group's own [lo, hi] range. The
    # stats join is null-safe so a NULL group key keeps its rows; frames
    # are aliased because stats derives from rows (self-join lineage).
    gq = f"`{group}`"
    joined = (
        rows.alias("__r")
        .join(
            stats.alias("__s"),
            on=F.col(f"__r.{gq}").eqNullSafe(F.col(f"__s.{gq}")),
            how="inner",
        )
        .select(
            F.col(f"__r.{gq}").alias(group),
            F.col(f"__r.`{value}`").alias(value),
            "__n", "__lo", "__hi",
        )
    )
    span = F.col("__hi") - F.col("__lo")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(buckets - 1),
            F.floor((F.col(value) - F.col("__lo")) / span * buckets).cast(
                "int"
            ),
        )
    )
    bucketed = joined.select(
        group, value, bucket.alias("__b"), "__n", "__lo", "__hi"
    )
    hist = bucketed.groupBy(group, "__b", "__n").agg(
        F.count(F.lit(1)).alias("__c")
    )

    # Distributed cumulative walk: rows-before-bucket is a prefix sum over
    # the group's (sorted) bucket ids; a bucket is a target iff it holds
    # order statistic k1 or k2.
    cum_w = (
        Window.partitionBy(group)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "__before", F.coalesce(F.sum("__c").over(cum_w), F.lit(0))
    )
    holds = lambda k: (F.col("__before") <= k) & (  # noqa: E731
        k < F.col("__before") + F.col("__c")
    )
    targets = cum.filter(holds(k1) | holds(k2)).select(
        group, "__b", "__before"
    )

    # Targeted pass: rank ONLY rows inside target buckets (≤2 buckets per
    # group ever survive the join), then pick the k1/k2 order statistics.
    t = targets.withColumnRenamed(group, "__g").withColumnRenamed(
        "__b", "__tb"
    )
    if broadcast_targets:
        t = F.broadcast(t)
    ranked = (
        bucketed.alias("__x")
        .join(
            t.alias("__t"),
            on=[
                F.col(f"__x.{gq}").eqNullSafe(F.col("__t.__g")),
                F.col("__x.__b") == F.col("__t.__tb"),
            ],
        )
        .drop("__g", "__tb")
        .withColumn(
            "__k",
            F.row_number().over(
                Window.partitionBy(group, "__b").orderBy(value)
            )
            - 1
            + F.col("__before"),
        )
    )
    picked = ranked.filter((F.col("__k") == k1) | (F.col("__k") == k2))

    # Final per-group aggregate: fetch the two order statistics and
    # interpolate. All expressions recompute h/k1/k2 from the carried __n.
    v = F.col(value).cast("double")
    agg = picked.groupBy(group).agg(
        F.max("__n").alias("__n"),
        F.max(F.when(F.col("__k") == k1, v)).alias("__v1"),
        F.max(F.when(F.col("__k") == k2, v)).alias("__v2"),
    )
    interp = F.when(k1 == k2, F.col("__v1")).otherwise(
        F.col("__v1") + (h - k1) * (F.col("__v2") - F.col("__v1"))
    )
    return agg.select(
        group,
        F.col("__n").alias("n"),
        interp.alias("quantile"),
    ).orderBy(group)


def histogram_partials(
    df: DataFrame,
    parts: list[str],
    value: str,
    lo: float,
    hi: float,
    buckets: int = 4096,
) -> DataFrame:
    """Mergeable quantile partials: per-``parts`` fixed-width histogram
    counts over a FIXED global ``[lo, hi]`` domain.

    The quantile face of the per-partition-sketch rollup pattern
    (operators/sketch.py's HLL partials are the distinct-count face):
    materialize one tall ``(parts..., __b, __c)`` histogram per
    partition unit at ingest time, and answer quantiles over any
    partition subset by SUMMING counts — never rescanning raw rows.
    Fixing the domain up front is what makes partials mergeable
    (per-group adaptive ranges, as in :func:`exact_quantile`, cannot be
    combined after the fact); values outside ``[lo, hi]`` clamp into the
    edge buckets, so the domain should cover the data with headroom.
    Size: ``buckets`` longs per partition unit, independent of rows.
    """
    if not hi > lo:
        raise ValueError("hi must exceed lo")
    v = F.col(value)
    width = (hi - lo) / buckets
    b = (
        F.when(v.isNull(), None)
        .when(v <= F.lit(lo), 0)
        .when(v >= F.lit(hi), buckets - 1)
        .otherwise(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"))
    )
    return (
        df.select(*parts, b.alias("__b"))
        .filter(F.col("__b").isNotNull())
        .groupBy(*parts, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def quantile_from_partials(
    partials: DataFrame,
    group: list[str],
    q: float,
    lo: float,
    hi: float,
    buckets: int = 4096,
) -> DataFrame:
    """Approximate quantile per ``group`` from merged histogram partials
    (bucket-midpoint estimate; error ≤ one bucket width by
    construction). Returns ``group..., n, est (double)``.

    Fully distributed: merge = one sum aggregate, the cumulative bucket
    walk is a window over ``(group, bucket)`` rows — the same prefix-sum
    shape :func:`exact_quantile` uses, O(groups × buckets) state total.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    width = (hi - lo) / buckets
    merged = partials.groupBy(*group, "__b").agg(F.sum("__c").alias("__c"))
    w = Window.partitionBy(*group)
    cum_w = (
        Window.partitionBy(*group)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    enriched = merged.withColumn(
        "__n", F.sum("__c").over(w)
    ).withColumn("__before", F.coalesce(F.sum("__c").over(cum_w), F.lit(0)))
    k = F.floor((F.col("__n") - 1) * F.lit(float(q))).cast("long")
    hit = enriched.filter(
        (F.col("__before") <= k)
        & (k < F.col("__before") + F.col("__c"))
    )
    est = F.lit(lo) + (F.col("__b") + F.lit(0.5)) * F.lit(width)
    return hit.select(
        *group,
        F.col("__n").alias("n"),
        est.alias("est"),
    ).orderBy(*group)
