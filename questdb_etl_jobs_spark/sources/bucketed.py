"""Bucketed-table storage: pre-shuffled layout for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
the shuffle of both sides on the join key. Bucketing pays that shuffle
ONCE at write time: both tables hash-partitioned into the same number of
buckets on the key, optionally sorted within each bucket. Catalyst then
plans the join with ZERO Exchange nodes — each task zips bucket i of A
with bucket i of B (and with sorted buckets, skips the sort too).

This is the storage analogue of the reference's designated-timestamp
table (reference sql/create-table.sql:1 — physical order as a query
contract); tests/test_plans.py pins the no-Exchange plan shape.

Bucket-count sizing at scale: pick n_buckets so one bucket of the larger
table fits an executor's shuffle memory (~128-256 MB compressed), and
use the SAME count for every table that joins on the key — mismatched
counts fall back to a shuffle of the smaller side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external bucketed table (parquet at ``path``).

    Bucketing requires the table catalog (bucket metadata lives there,
    not in parquet footers) — a plain ``.parquet(path)`` write cannot
    record it.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (bucket-aware)."""
    return spark.table(table)
