"""Deterministic cardinality sketch: KMV (k minimum values).

``approx_count_distinct`` (HLL++) is the right default at scale, but its
estimate is an engine-internal artifact — no other engine reproduces it,
so its correctness face is rows-only (q27). KMV is the sketch you reach
for when the ESTIMATE itself must be reproducible: the k smallest
xxhash64 values of a set are a pure function of the data, so two engines
(or two runs, or Spark vs a CPython mirror) produce bit-identical
sketches and estimates. Estimator: with u(k-th min) = fraction of the
hash space below the k-th smallest distinct hash, E[distinct] ≈ (k-1)/u
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM'02). Sketches of disjoint shards also merge by k-min union — the
property that makes KMV a distributed-friendly sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^63 / 2^64 as exact double literals — both oracle faces use the same
#: constants so the estimate arithmetic is IEEE-identical.
_TWO63 = 2.0**63
_TWO64 = 2.0**64


def kmv_distinct(
    df: DataFrame, keys: list[str], value_col: str, k: int = 32
) -> DataFrame:
    """Per-``keys`` KMV distinct estimate of ``value_col``.

    Returns (keys…, kth_hash, n_min, est_distinct): the k-th smallest
    distinct xxhash64 (the sketch's frontier — exactly comparable), how
    many minima exist (< k means the group is small and the count is
    exact), and the estimate.

    Plan: distinct (keys, hash) — one shuffle with map-side partial
    dedup — then a row_number window + aggregate on ``keys``. Rows
    stream through the window rank; no per-group array is ever
    materialized, so skewed groups cost time, not memory. (A one-pass
    bounded-state formulation is a pandas UDAF; this relational shape
    keeps the whole sketch in codegen.)
    """
    h = F.xxhash64(value_col).alias("__h")
    hashed = df.select(*[F.col(c) for c in keys], h).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    ranked = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = ranked.groupBy(*keys).agg(
        F.max("__h").alias("kth_hash"),
        F.count(F.lit(1)).cast("int").alias("n_min"),
    )
    u = (F.col("kth_hash").cast("double") + F.lit(_TWO63)) / F.lit(_TWO64)
    return agg.withColumn(
        "est_distinct",
        F.when(F.col("n_min") < k, F.col("n_min").cast("double")).otherwise(
            F.lit(float(k - 1)) / u
        ),
    )
