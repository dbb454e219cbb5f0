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


_COMPACTION_LOG = "_compaction_log.json"


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _committed_batch_dirs(spark: SparkSession, staged: str) -> dict[int, str]:
    """``batch_id -> dir`` for staged batch dirs whose write COMMITTED
    (the ``_SUCCESS`` marker Spark's committer drops at job commit). A
    dir a concurrent writer is mid-writing has no marker yet —
    ``mode("overwrite")`` removes the old dir first — so it is invisible
    to compaction and recompute until its job commits."""
    jvm, fs = _hadoop_fs(spark, staged)
    out: dict[int, str] = {}
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(staged)):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("batch_id=")):
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{staged}/{name}/_SUCCESS")
        ):
            out[int(name.split("=", 1)[1])] = f"{staged}/{name}"
    return out


def _read_compaction_log(spark: SparkSession, staged: str) -> list[dict]:
    """The append-only compaction log: a JSON list of
    ``{"fold_id": int, "superseded": [int, ...]}`` entries. Absent log
    == no completed compaction commits."""
    import json

    jvm, fs = _hadoop_fs(spark, staged)
    p = jvm.org.apache.hadoop.fs.Path(f"{staged}/{_COMPACTION_LOG}")
    if not fs.exists(p):
        return []
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(p), "UTF-8")
    )
    try:
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        reader.close()
    return json.loads("\n".join(lines))


def _write_compaction_log(
    spark: SparkSession, staged: str, entries: list[dict]
) -> None:
    """Replace the log via write-temp + rename (atomic on HDFS and on
    local paths; object stores need a rename-capable committer — the
    same caveat as the view's partition swap)."""
    import json

    jvm, fs = _hadoop_fs(spark, staged)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{staged}/{_COMPACTION_LOG}.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{staged}/{_COMPACTION_LOG}")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(json.dumps(entries).encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"could not commit compaction log at {final}")


def _live_staged_ids(
    committed: dict[int, str], log: list[dict]
) -> list[int]:
    """The batch ids whose dirs are AUTHORITATIVE staged state:
    committed dirs minus (a) ids superseded by a logged fold — their
    content lives in that fold; the dirs linger only if a compactor
    crashed mid-delete — and minus (b) negative-id fold dirs no log
    entry claims — a compactor crashed after the fold's write but
    before the log commit, so the originals (all still present) win."""
    superseded = {b for e in log for b in e["superseded"]}
    claimed = {e["fold_id"] for e in log}
    return [
        bid for bid in committed
        if bid not in superseded and (bid >= 0 or bid in claimed)
    ]


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
    # Resolve the AUTHORITATIVE staged dirs through the compaction log:
    # committed dirs minus logged-superseded ones (their content lives
    # in the logged fold — the dirs linger only when a compactor crashed
    # mid-delete) minus unclaimed fold dirs (a compactor crashed before
    # its log commit — the originals, all present, win). This makes the
    # view a pure function of staged state under ANY interleaving of
    # refreshes with compact_staged_batches, not just offline ones.
    committed = _committed_batch_dirs(spark, staged)
    live = _live_staged_ids(
        committed, _read_compaction_log(spark, staged)
    )
    all_staged = (
        spark.read.option("basePath", staged)
        .parquet(*[committed[b] for b in sorted(live)])
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
    spark: SparkSession,
    path: str,
    _crash_after_fold: bool = False,
    _crash_after_log: bool = False,
) -> None:
    """Fold the staged batch directories into one fresh base batch —
    crash-atomic, and safe to run alongside live refreshes.

    Round-8 ADVICE closed two holes in the old fixed-``batch_id=-1``
    design: a crash between the fold write and the deletes left fold +
    originals both staged (every later recompute double-counted), and
    nothing fenced a refresh landing mid-compaction. The protocol is now
    a write-ahead-logged fold, every step idempotent to re-run:

    1. **Recover** — finish any logged compaction whose superseded dirs
       still exist (the log entry is the commit point: it is written
       only after the fold's job commit, so its fold is complete), and
       delete any UNCLAIMED fold dir (negative id absent from the log:
       a fold whose compaction crashed before the log commit — its
       originals are all still present and remain authoritative).
    2. **Observe** only COMMITTED batch dirs (``_SUCCESS`` marker), so a
       batch a concurrent refresh is mid-staging is neither folded nor
       deleted; it simply joins the next compaction.
    3. **Fold** them with the associative ``_merge`` into a FRESH base
       id (one below every id ever used: -1, then -2, ...), never
       overwriting prior state.
    4. **Commit**: append ``{fold_id, superseded}`` to the staged
       directory's compaction log (write-temp + rename).
    5. **Delete** the superseded dirs.

    Readers (:func:`refresh_sample_by_view_exactly_once`) resolve the
    authoritative dir set through the same log (``_live_staged_ids``),
    so a crash at ANY point — or a recompute interleaving with steps
    3–5 — sees each batch's content exactly once: via its original dir
    until the log commit, via the fold after it. Concurrent REFRESHES
    are safe; run at most one compactor at a time (two concurrent
    compactors could race the shared log). The ``_crash_*`` keywords
    are test hooks that abort after the named step so the crash windows
    stay provable.
    """
    staged = _staged_dir(path)
    if not _view_exists(spark, staged):
        return
    jvm, fs = _hadoop_fs(spark, staged)
    log = _read_compaction_log(spark, staged)
    committed = _committed_batch_dirs(spark, staged)
    superseded_ever = {b for e in log for b in e["superseded"]}
    claimed = {e["fold_id"] for e in log}
    # Step 1a: finish logged deletes.
    for bid in sorted(superseded_ever & set(committed)):
        fs.delete(jvm.org.apache.hadoop.fs.Path(committed.pop(bid)), True)
    # Step 1b: drop unclaimed folds (crash between fold write and log
    # commit; the originals are intact and win).
    for bid in [b for b in committed if b < 0 and b not in claimed]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(committed.pop(bid)), True)
    if len(committed) < 2:
        return  # nothing to fold
    # Steps 2-3: fold the observed committed dirs into a fresh id.
    all_staged = spark.read.option("basePath", staged).parquet(
        *committed.values()
    )
    fold_id = min(min(committed), min(claimed, default=0), 0) - 1
    folded = _merge(all_staged.drop("batch_id"), [
        c for c in all_staged.columns
        if c not in ("bucket_ts", "batch_id", _PDATE,
                     "n", "dsum", "vmin", "vmax", "first", "last")
    ]).withColumn(_PDATE, F.to_date("bucket_ts"))
    materialized = folded.localCheckpoint(eager=True)
    materialized.write.partitionBy(_PDATE).mode("overwrite").parquet(
        f"{staged}/batch_id={fold_id}"
    )
    if _crash_after_fold:
        return
    # Step 4: the commit point.
    _write_compaction_log(
        spark, staged,
        log + [{"fold_id": fold_id, "superseded": sorted(committed)}],
    )
    if _crash_after_log:
        return
    # Step 5: delete superseded dirs.
    for d in committed.values():
        fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)


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
