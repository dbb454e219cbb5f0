"""Exact distributed quantiles without a global sort.

Part of the QuestDB analytic surface over loaded tables (percentiles on
designated-timestamp tables; reference README.md:58 directs the reader to
interactive SQL over the ingested data). Spark's built-in ``percentile``
is exact but sorts every group's values inside the aggregate buffer;
``approx_percentile`` is bounded-error. This operator gets the EXACT
value with bounded memory per task — the classic two-phase histogram
scheme:

1. one aggregate pass: per group ``n, min, max`` plus a fixed-width
   histogram of ``B`` buckets (map-side partial agg; the shuffled state
   is O(groups × B), independent of row count);
2. the driver walks each group's cumulative histogram to locate the
   bucket(s) holding the target order statistics ``k = (n-1)·q`` (floor
   and ceil) and how many rows precede them;
3. one targeted pass: only rows in those buckets (a ``groups × ≤2``
   broadcast semi-join) are ranked — everything else never shuffles.

The refine set per group is ~n/B rows on even data; pathological piles
in one bucket degrade toward a per-group sort of that pile (recursive
re-bucketing would fix it; not needed for the engine's data). Driver
state: B-entry arrays per group — a bounded collect, same class as the
centroid/bitmap collects elsewhere in the engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantile(
    df: DataFrame,
    value: str,
    group: str,
    q: float = 0.5,
    buckets: int = 4096,
) -> DataFrame:
    """Exact linear-interpolation quantile of ``value`` per ``group``
    (same definition as ANSI ``percentile_cont`` / Spark ``percentile``:
    ``h = (n-1)·q``, interpolate between the ``⌊h⌋``-th and ``⌈h⌉``-th
    order statistics). Returns ``group, n, q<q> (double)``.

    NULL values are ignored (SQL aggregate semantics); a group with no
    non-NULL values is dropped.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    rows = df.filter(F.col(value).isNotNull())

    stats = rows.groupBy(group).agg(
        F.count(value).alias("__n"),
        F.min(value).alias("__lo"),
        F.max(value).alias("__hi"),
    )
    stat_rows = {r[group]: r for r in stats.collect()}
    if not stat_rows:
        return stats.select(
            F.col(group), F.col("__n").alias("n"), F.lit(None).cast("double")
        ).limit(0)

    # Histogram pass: bucket id from the group's own [lo, hi] range.
    lo_map = F.create_map(
        *[x for g, r in stat_rows.items() for x in (F.lit(g), F.lit(r["__lo"]))]
    )
    hi_map = F.create_map(
        *[x for g, r in stat_rows.items() for x in (F.lit(g), F.lit(r["__hi"]))]
    )
    span = hi_map[F.col(group)] - lo_map[F.col(group)]
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(buckets - 1),
            F.floor(
                (F.col(value) - lo_map[F.col(group)]) / span * buckets
            ).cast("int"),
        )
    )
    hist = (
        rows.select(F.col(group), bucket.alias("__b"))
        .groupBy(group, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    counts: dict[object, dict[int, int]] = {}
    for r in hist:
        counts.setdefault(r[group], {})[r["__b"]] = r["__c"]

    # Driver walk: for each group find the buckets holding ⌊h⌋ and ⌈h⌉
    # and the number of rows before each target bucket.
    targets = []  # (group, bucket, rows_before_bucket, [wanted offsets])
    for g, r in stat_rows.items():
        n = r["__n"]
        h = (n - 1) * q
        wanted = sorted({math.floor(h), math.ceil(h)})
        cum = 0
        per_bucket: dict[int, list[int]] = {}
        bcounts = counts[g]
        for b in sorted(bcounts):
            c = bcounts[b]
            for k in wanted:
                if cum <= k < cum + c:
                    per_bucket.setdefault(b, []).append(k)
            cum += c
        cum = 0
        for b in sorted(bcounts):
            if b in per_bucket:
                targets.append((g, b, cum, per_bucket[b]))
            cum += bcounts[b]

    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(g, b, before) for g, b, before, _ in targets],
        f"{group} {stats.schema[group].dataType.simpleString()}, "
        "__b int, __before long",
    )
    # Targeted pass: rank only rows inside target buckets.
    w = Window.partitionBy(group, "__b").orderBy(value)
    ranked = (
        rows.select(F.col(group), F.col(value), bucket.alias("__b"))
        .join(F.broadcast(tgt), [group, "__b"])
        .withColumn("__k", F.row_number().over(w) - 1 + F.col("__before"))
    )
    wanted_rows = ranked.filter(
        F.col("__k").isin(
            [k for _, _, _, ks in targets for k in ks]
        )
    ).collect()
    order_stats: dict[object, dict[int, float]] = {}
    for r in wanted_rows:
        order_stats.setdefault(r[group], {})[r["__k"]] = r[value]

    out = []
    for g, r in stat_rows.items():
        n = r["__n"]
        h = (n - 1) * q
        k1, k2 = math.floor(h), math.ceil(h)
        v1 = order_stats[g][k1]
        v2 = order_stats[g][k2]
        val = v1 + (h - k1) * (v2 - v1) if k2 != k1 else float(v1)
        out.append((g, n, val))
    return spark.createDataFrame(
        out,
        f"{group} {stats.schema[group].dataType.simpleString()}, "
        "n long, quantile double",
    ).orderBy(group)
