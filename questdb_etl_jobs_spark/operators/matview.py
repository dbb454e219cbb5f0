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
        # Outer cast pins the stored type: sum(decimal(28,4)) widens to
        # decimal(38,4), and staged batch files must carry the SAME
        # parquet decimal width as _merge's output or a post-compaction
        # read of mixed batch dirs fails on FLBA length.
        F.sum(F.round(v, 4).cast("decimal(28,4)"))
        .cast("decimal(28,4)").alias("dsum"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        # Composite (ts, value) ordering key: ties on ts resolve the
        # same way on every (re)computation — required for the staged
        # exactly-once path's bit-identical replay guarantee.
        F.min_by(
            F.struct(F.col(ts).alias("t"), v.alias("v")),
            F.struct(F.col(ts), v),
        ).alias("first"),
        F.max_by(
            F.struct(F.col(ts).alias("t"), v.alias("v")),
            F.struct(F.col(ts), v),
        ).alias("last"),
    )


def _merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    return partials.groupBy("bucket_ts", *keys).agg(
        F.sum("n").alias("n"),
        F.sum("dsum").cast("decimal(28,4)").alias("dsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.min_by(F.col("first"), F.struct("first.t", "first.v"))
        .alias("first"),
        F.max_by(F.col("last"), F.struct("last.t", "last.v")).alias("last"),
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


def _staged_dir(path: str) -> str:
    return path.rstrip("/") + "__batches"


def refresh_sample_by_view_exactly_once(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    batch_id: int,
    ts: str,
    bucket: str,
    value: str,
    keys: list[str],
) -> None:
    """Exactly-once refresh: stage, then recompute touched partitions
    from staged state only.

    Partials are NOT idempotent under re-merge (counts/sums add), so the
    incremental :func:`refresh_sample_by_view` double-merges a batch the
    checkpoint redelivers after a crash between the partition overwrite
    and the commit. This variant closes every crash window by making the
    view a PURE FUNCTION of the staged batch directories:

    1. **Stage** — the batch's partials land in
       ``<path>__batches/batch_id=<id>/<date>=...`` via directory
       overwrite. A replayed batch rewrites the same directory with the
       same bytes: idempotent.
    2. **Recompute** — every date partition the batch touches is rebuilt
       by merging partials from ALL staged batches for those dates
       (partition-pruned read: only the touched dates' files open) and
       dynamic-partition-overwritten into the view.

    Replay after a crash at ANY point re-runs both steps against
    identical staged state and produces bit-identical partitions —
    there is no read-modify-write of view rows anywhere, so there is
    nothing to double-apply. Cost per refresh is O(batch + staged
    partials for touched dates); staged partials are key-sized per
    (batch, date), so a date's recompute input grows by one small file
    per batch that touched it (hourly batches against day buckets: ≤24
    plus late arrivals) — :func:`compact_staged_batches` folds history
    into one base batch when that tail grows. Mixing this with the
    incremental refresh on one view is undefined: rows that entered the
    view without a staged directory are invisible to recompute.

    Object-store caveat (same as Spark's own dynamic overwrite): the
    final partition swap relies on the committer's rename; on stores
    without atomic rename use a rename-capable committer or HDFS-backed
    view paths.
    """
    fresh = sample_by_partials(batch, ts, bucket, value, keys).withColumn(
        _PDATE, F.to_date("bucket_ts")
    )
    staged = _staged_dir(path)
    fresh.write.partitionBy(_PDATE).mode("overwrite").parquet(
        f"{staged}/batch_id={int(batch_id)}"
    )
    dates = [r[0] for r in fresh.select(_PDATE).distinct().collect()]
    if not dates:
        return
    all_staged = (
        spark.read.option("basePath", staged).parquet(staged)
        .where(F.col(_PDATE).isin(dates))
        .drop("batch_id")
    )
    recomputed = _merge(all_staged, keys).withColumn(
        _PDATE, F.to_date("bucket_ts")
    )
    materialized = recomputed.localCheckpoint(eager=True)
    saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        materialized.write.partitionBy(_PDATE).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)


def compact_staged_batches(
    spark: SparkSession, path: str, base_batch_id: int = -1
) -> None:
    """Fold all staged batch directories into one base batch.

    Merges every staged partial into ``batch_id=<base_batch_id>`` (the
    merge is the associative ``_merge``, so the folded base is
    equivalent to the batches it replaces), writes the base, then
    removes the superseded directories. Run OFFLINE relative to
    refreshes (no concurrent ``foreachBatch``): a refresh that staged a
    new batch between the read and the delete here would lose it.
    Streaming batch ids are non-negative, so the default base id never
    collides with a live batch.
    """
    staged = _staged_dir(path)
    if not _view_exists(spark, staged):
        return
    all_staged = spark.read.option("basePath", staged).parquet(staged)
    old_ids = [
        r[0] for r in all_staged.select("batch_id").distinct().collect()
    ]
    folded = _merge(all_staged.drop("batch_id"), [
        c for c in all_staged.columns
        if c not in ("bucket_ts", "batch_id", _PDATE,
                     "n", "dsum", "vmin", "vmax", "first", "last")
    ]).withColumn(_PDATE, F.to_date("bucket_ts"))
    materialized = folded.localCheckpoint(eager=True)
    materialized.write.partitionBy(_PDATE).mode("overwrite").parquet(
        f"{staged}/batch_id={int(base_batch_id)}"
    )
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(staged).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    for bid in old_ids:
        if int(bid) != int(base_batch_id):
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{staged}/batch_id={int(bid)}"),
                True,
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
    exactly_once: bool = True,
):
    """Streaming maintenance of the materialized view inside
    ``foreachBatch`` — the reference's file-arrival model (hourly GCS
    exports, reference README.md:373) keeping a dashboard view current.

    By default each micro-batch goes through
    :func:`refresh_sample_by_view_exactly_once`, so a batch the
    checkpoint redelivers after a crash merges to bit-identical view
    contents (see that function's staging design; double-apply replay
    proven in tests/test_operators.py and the registered q151). ``exactly_once=False`` selects the
    stage-free incremental :func:`refresh_sample_by_view` — one fewer
    write per batch, at-least-once across crashes (same contract as a
    bare foreachBatch sink).
    """

    def do_refresh(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if exactly_once:
            refresh_sample_by_view_exactly_once(
                batch.sparkSession, batch, path, batch_id,
                ts, bucket, value, keys,
            )
        else:
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
