"""Designated-timestamp table convention.

The reference's table has a *designated timestamp* that physically orders
it and enables time-series queries (reference sql/create-table.sql:1
``timestamp(purchase_date)``; reference README.md:70-71). Spark has no such
notion, so we make it a storage convention — pure library code, no custom
Catalyst rules:

- writer: partition directories by UTC date of the ts column
  (``<col>_pdate=YYYY-MM-DD``) + ``sortWithinPartitions(ts)`` so every
  parquet file is time-ordered and carries tight min/max row-group stats;
- reader: time-range predicates prune partitions statically (Catalyst
  partition pruning on the derived date column) and row groups via parquet
  stats — the scan never touches out-of-range data.

At 100 TB this is the difference between scanning a day and scanning the
table: time filters become directory listings.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_SUFFIX = "_pdate"


def write_designated_ts(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "append",
) -> str:
    """Write ``df`` as a designated-timestamp parquet table at ``path``.

    Returns the partition column name. ``append`` mode mirrors the
    reference's accumulate-hourly-batches model (reference README.md:373).
    """
    pcol = ts_col + PARTITION_SUFFIX
    (
        df.withColumn(pcol, F.to_date(F.col(ts_col)))
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy(pcol)
        .parquet(path)
    )
    return pcol


def read_designated_ts(
    spark: SparkSession,
    path: str,
    ts_col: str,
    start: _dt.datetime | str | None = None,
    end: _dt.datetime | str | None = None,
) -> DataFrame:
    """Read a designated-ts table, pruning partitions for a time range.

    ``start``/``end`` bound ``ts_col`` (half-open ``[start, end)``). The
    equivalent date predicate on the partition column is added so pruning
    is static (visible as ``PartitionFilters`` in the physical plan).
    """
    pcol = ts_col + PARTITION_SUFFIX
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(
            (F.col(ts_col) >= F.lit(start))
            & (F.col(pcol) >= F.to_date(F.lit(start)))
        )
    if end is not None:
        df = df.filter(
            (F.col(ts_col) < F.lit(end)) & (F.col(pcol) <= F.to_date(F.lit(end)))
        )
    return df.drop(pcol)
