"""Materialized SAMPLE BY views: incremental time-bucket aggregates.

QuestDB's materialized views keep a SAMPLE BY query's result maintained
as new rows land, so dashboards read a key-sized table instead of
rescanning history. Same convention here, Spark-first: the stored table
holds MERGEABLE PARTIAL aggregates per ``(bucket, keys...)`` —

    n            exact count
    dsum         DECIMAL(28,4) sum of 4-decimal-rounded values — exact
                 integer arithmetic, so merge order can never change a
                 result (the engine-wide cross-engine sum protocol,
                 queries/_protocol.py)
    vmin / vmax  exact min/max
    first_ts/first_val, last_ts/last_val
                 QuestDB first()/last() state: merging keeps the pair
                 with the smallest/largest ts (min_by/max_by on structs)

— and each refresh merges one micro-batch of partials into the store:
read the touched date partitions, union, re-aggregate, rewrite those
partitions (dynamic partition overwrite, the upsert_designated_ts
pattern). Every partial is algebraic, so

    merge(partials(b1), partials(b2)) == partials(b1 ∪ b2)

EXACTLY — bit-for-bit, not approximately — which q146 proves against a
direct SAMPLE BY over the full history in another engine.

Scale posture: refresh cost is O(batch + touched buckets), never
O(history); the store is O(buckets × keys) regardless of ingested rows;
reads are a projection over the store (finalize = dsum/n etc., pure
codegen). Late data merges like any other batch — partials don't care
about arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.sources.fs import hadoop_path_exists as _view_exists

_PDATE = "__vdate"


def sample_by_partials(
    batch: DataFrame,
    ts: str,
    bucket: str,
    value: str,
    keys: list[str],
) -> DataFrame:
    """One micro-batch's mergeable partial aggregates per
    ``(bucket_ts, keys...)``. ``bucket`` is a date_trunc unit
    ('hour', 'day', ...)."""
    b = F.date_trunc(bucket, F.col(ts)).alias("bucket_ts")
    v = F.col(value)
    return batch.groupBy(b, *keys).agg(
        F.count(v).alias("n"),
        F.sum(F.round(v, 4).cast("decimal(28,4)")).alias("dsum"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.min_by(F.struct(F.col(ts).alias("t"), v.alias("v")), F.col(ts))
        .alias("first"),
        F.max_by(F.struct(F.col(ts).alias("t"), v.alias("v")), F.col(ts))
        .alias("last"),
    )


def _merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    return partials.groupBy("bucket_ts", *keys).agg(
        F.sum("n").alias("n"),
        F.sum("dsum").cast("decimal(28,4)").alias("dsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.min_by(F.col("first"), F.col("first.t")).alias("first"),
        F.max_by(F.col("last"), F.col("last.t")).alias("last"),
    )


def refresh_sample_by_view(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    ts: str,
    bucket: str,
    value: str,
    keys: list[str],
) -> None:
    """Merge one micro-batch into the materialized view at ``path``.

    Only the date partitions the batch touches are read and rewritten
    (static pruning in, dynamic partition overwrite out) — a day of new
    data against years of view history moves day-sized state. The merged
    slice is localCheckpoint-materialized before the overwrite because
    Spark cannot rewrite partitions it is concurrently reading.
    """
    fresh = sample_by_partials(batch, ts, bucket, value, keys).withColumn(
        _PDATE, F.to_date("bucket_ts")
    )
    if not _view_exists(spark, path):
        # First refresh: no view yet. Only a provably-absent path takes
        # this branch — a transient storage/permission error or corrupt
        # footer on an EXISTING view must raise, never silently wipe the
        # view history with one micro-batch's partials.
        fresh.write.partitionBy(_PDATE).mode("overwrite").parquet(path)
        return
    existing = spark.read.parquet(path)
    dates = [r[0] for r in fresh.select(_PDATE).distinct().collect()]
    touched = existing.where(F.col(_PDATE).isin(dates))
    merged = _merge(
        touched.unionByName(fresh), keys
    ).withColumn(_PDATE, F.to_date("bucket_ts"))
    materialized = merged.localCheckpoint(eager=True)
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        materialized.write.partitionBy(_PDATE).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)


def read_sample_by_view(spark: SparkSession, path: str) -> DataFrame:
    """Finalize the stored partials into the SAMPLE BY answer: one
    projection over the key-sized store (no scan of raw history).
    Exposes n, total (exact decimal→double), avg, min, max, first/last
    values — the QuestDB console aggregate set."""
    view = spark.read.parquet(path).drop(_PDATE)
    return view.select(
        "bucket_ts",
        *[c for c in view.columns if c not in (
            "bucket_ts", "n", "dsum", "vmin", "vmax", "first", "last")],
        "n",
        F.col("dsum").cast("double").alias("total"),
        (F.col("dsum").cast("double") / F.col("n")).alias("avg"),
        F.col("vmin").alias("vmin"),
        F.col("vmax").alias("vmax"),
        F.col("first.v").alias("first_val"),
        F.col("last.v").alias("last_val"),
    )


def maintain_sample_by_view(
    stream: DataFrame,
    path: str,
    checkpoint_path: str,
    ts: str,
    bucket: str,
    value: str,
    keys: list[str],
    available_now: bool = True,
):
    """Streaming maintenance of the materialized view: each micro-batch
    refreshes the store via :func:`refresh_sample_by_view` inside
    ``foreachBatch`` — the reference's file-arrival model (hourly GCS
    exports, reference README.md:373) keeping a dashboard view current.

    Exactly-once caveat (same contract as streaming/upsert.py): a batch
    replayed after a crash between the partition overwrite and the
    checkpoint commit would double-merge. Partials are NOT idempotent
    under re-merge (counts/sums add), so deployments that need
    exactly-once across crashes should stage each batch's partials to a
    batch-id-named directory first and merge from there; the engine's
    crash-recovery-tested upsert sink shows the pattern.
    """

    def do_refresh(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            refresh_sample_by_view(
                batch.sparkSession, batch, path, ts, bucket, value, keys
            )

    writer = (
        stream.writeStream.foreachBatch(do_refresh)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
