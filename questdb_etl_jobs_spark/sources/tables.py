"""Parquet test-table loader and catalog registration.

The driver's tables (TESTDATA.md) are one parquet file each. Reading is
plain ``spark.read.parquet`` — vectorized scan, predicate pushdown and
column pruning come from Catalyst — with one shim: ``events.ts`` is stored
as parquet TIMESTAMP(NANOS), which Spark cannot map; with
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as LongType
(nanos since epoch) and is converted with integer division (``DIV 1000`` —
nanos magnitudes exceed double's 53-bit mantissa, so float division would
corrupt low microseconds). The generated data is µs-precision, so the
conversion is lossless.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark import session as _session
from questdb_etl_jobs_spark.schemas import TEST_TABLE_NAMES

#: (session -> {(sf_dir, name) -> DataFrame}). A loaded table is an
#: immutable logical plan; rebuilding it per query re-reads the parquet
#: footer and re-runs analysis (~50-80 ms of driver latency per table per
#: query — a 4-table join paid ~0.3 s before touching data). Keyed weakly
#: by session so a stopped session's plans are collectable.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes events.ts to TimestampType (µs).

    Memoized per (session, path): callers only ever build new plans on
    top of the returned DataFrame, never mutate it. The memo assumes the
    fixture files are IMMUTABLE for the session's lifetime — the cached
    plan pins the parquet file listing and schema at first load, so a
    caller that rewrites files under ``sf_dir`` in-session (fixture
    regeneration, stress re-synthesis) must call :func:`invalidate_tables`
    first or later reads see stale listings / FileNotFoundException.
    """
    cache = _TABLE_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    _session.configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    cache[key] = df
    return df


def fan_out(df: DataFrame, min_slots_per_split: int = 4) -> DataFrame:
    """Round-robin repartition a grossly under-parallel scan before
    heavy map-side work (guide §2.5: unsplittable input — one small
    file, one gzip member, one parquet row group serializes everything
    downstream of it onto a single core).

    Fires ONLY when the source offers at least ``min_slots_per_split``×
    fewer splits than the cluster has task slots, so at deployment scale
    (inputs of many 100 MB+ multi-row-group files → thousands of splits)
    this is a structural no-op and no data is ever reshuffled; the
    threshold also keeps it scale-adaptive rather than tuned to the
    local core count (the driver's low-core bench re-run derives the
    same decision from ITS defaultParallelism). Callers should project
    to the needed columns first so the fan-out shuffle moves only what
    the downstream compute reads.

    Only correct for order-insensitive consumers (aggregations, joins,
    content-keyed hashing) — the engine's declared queries qualify by
    protocol (every output carries a total ORDER BY; sums route through
    the decimal protocol).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        splits = df.rdd.getNumPartitions()
    except Exception:
        return df
    if splits * min_slots_per_split <= target:
        return df.repartition(target)
    return df


def invalidate_tables(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Drop memoized plans for ``sf_dir`` (or all dirs when None) — call
    before rewriting fixture files a live session already loaded."""
    cache = _TABLE_CACHE.get(spark)
    if not cache:
        return
    if sf_dir is None:
        cache.clear()
    else:
        for key in [k for k in cache if k[0] == sf_dir]:
            del cache[key]


def register_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TEST_TABLE_NAMES
) -> None:
    """Register every test table as a temp view for spark.sql() queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
