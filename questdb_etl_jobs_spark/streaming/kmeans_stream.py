"""Streaming (sequential mini-batch) k-means — the clustering family's
streaming twin (batch face: operators/clustering.py, q177).

A curation pipeline that clusters arriving documents can't re-run Lloyd
over the full corpus per micro-batch; the classical online answer
(MacQueen's sequential k-means, batch-granular) assigns each arriving
batch against the CURRENT centroids and moves every centroid to the
running mean of everything assigned to it so far. State is k × dim
cumulative component sums + k counts — sketch-sized, independent of
stream length — and lives driver-side across micro-batches (the same
place the stream's centroids must be broadcast from anyway; foreachBatch
batches run strictly in sequence, so the fold order is the arrival
order by construction) — journaled per absorbed batch into the
checkpoint dir so a killed fit resumes bit-identically instead of
silently refitting the tail (see the journal notes above
:func:`kmeans_stream_fit`).

Per micro-batch cost mirrors one Lloyd iteration over the batch:
assignment is the zero-shuffle codegen projection from
``operators.clustering.assign_clusters`` (centroids ride in as plan
literals), and the component-sum aggregate partial-combines map-side so
the exchange carries at most ``batch_partitions × k × dim`` rows.

Determinism protocol (differential-testable, q179): component sums use
the decimal protocol (``SUM(CAST(ROUND(x, 4) AS DECIMAL(28,4)))`` —
order-independent within a batch; exact Decimal folds across batches),
centroids are one IEEE division each, distance folds run in array
order, ties break to the lowest centroid index. With file arrival
pinned (ascending mtimes, one file per trigger) the whole trajectory
replays bit-identically in sequential CPython.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.operators.clustering import assign_clusters


@dataclass
class StreamKMeansState:
    centroids: list[list[float]]        # current k × dim exact doubles
    sums: list[list[Decimal]]           # cumulative per-component sums
    counts: list[int]                   # cumulative per-cluster counts
    n_batches: int = 0


def init_stream_state(init_centroids: list[list[float]]) -> StreamKMeansState:
    dim = len(init_centroids[0])
    k = len(init_centroids)
    return StreamKMeansState(
        centroids=[list(c) for c in init_centroids],
        sums=[[Decimal(0)] * dim for _ in range(k)],
        counts=[0] * k,
    )


def absorb_batch(
    state: StreamKMeansState,
    batch_df,
    vec_col: str = "embedding",
) -> None:
    """Assign one micro-batch against the current centroids and fold its
    per-cluster component sums into the running state, then move every
    non-empty cluster's centroid to its running mean. Mutates ``state``
    in place (foreachBatch runs batches sequentially — this IS the
    arrival-order fold)."""
    dim = len(state.centroids[0])
    assigned = assign_clusters(batch_df, state.centroids, vec_col=vec_col)
    rows = (
        assigned.select(
            "cluster",
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .groupBy("cluster", "pos")
        .agg(
            F.sum(F.round("val", 4).cast("decimal(28,4)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    k = len(state.centroids)
    batch_counts = [0] * k
    for r in rows:
        c = r["cluster"]
        if c is None:
            # NULL or dim-mismatched vectors assign a NULL cluster
            # (zip_with pads the short side with nulls, the distance
            # fold propagates) yet still posexplode — skip them here,
            # mirroring _update_centroids' excluded-by-contract stance,
            # instead of letting a None index raise mid-fold.
            continue
        if not 0 <= c < k:
            # A negative id would WRAP via Python indexing and silently
            # corrupt the last centroid; fail loudly instead.
            raise ValueError(f"cluster id {c} outside [0, {k})")
        state.sums[c][r["pos"]] += r["s"]
        if r["pos"] == 0:
            batch_counts[c] = r["n"]
    for c, n in enumerate(batch_counts):
        state.counts[c] += n
    for c in range(len(state.centroids)):
        if state.counts[c] > 0:
            state.centroids[c] = [
                float(state.sums[c][p]) / state.counts[c] for p in range(dim)
            ]
    state.n_batches += 1


# ---------------------------------------------------------------------------
# Restart-durable operator state (round-12; VERDICT r11 task #2)
# ---------------------------------------------------------------------------
#
# Spark's file-source checkpoint makes a RESTARTED query skip
# already-processed files — so an in-memory-only fold would silently
# resume from zeroed sums and return centroids fit to the TAIL of the
# stream. The fix is the matview-log pattern (operators/matview.py):
# after every absorbed batch the full operator state — exact Decimal
# sums, counts, bit-exact float-hex centroids, the absorbed batch id —
# is journaled to ``<checkpoint>/_kmeans_state/kmeans_state.<v>.json``
# via temp-file + rename to a FRESH versioned name (atomic on every
# Hadoop FileSystem; a reader sees version v or v+1, never a torn
# file). On start the highest version restores, and a replayed micro-
# batch (Spark re-runs the last uncommitted one after a crash) is
# recognized by ``batch_id <= last absorbed`` and skipped — the fold
# stays exactly-once. State is k × dim decimals: journal writes are
# sketch-sized, never data-sized.

_STATE_DIR = "_kmeans_state"
_STATE_RE = re.compile(r"^kmeans_state\.(\d+)\.json$")

#: Journal versions retained after each commit. Each version is a FULL
#: state snapshot (not a delta), so one surviving file is sufficient to
#: restore; keeping a few guards against a crash mid-delete or an
#: operator inspecting the trajectory tail. Long streams previously
#: left one file per absorbed batch forever (round-12 VERDICT task #3)
#: — now the journal directory is bounded at this count regardless of
#: stream length.
_JOURNAL_RETAIN = 3


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _save_state(
    spark: SparkSession, checkpoint_dir: str, state: StreamKMeansState,
    batch_id: int,
) -> None:
    sdir = f"{checkpoint_dir.rstrip('/')}/{_STATE_DIR}"
    jvm, fs = _hadoop(spark, sdir)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(sdir))
    payload = json.dumps(
        {
            "batch_id": batch_id,
            "n_batches": state.n_batches,
            "counts": state.counts,
            "sums": [[str(d) for d in row] for row in state.sums],
            "centroids_hex": [
                [x.hex() for x in c] for c in state.centroids
            ],
        }
    ).encode()
    final = f"{sdir}/kmeans_state.{state.n_batches}.json"
    tmp = jvm.org.apache.hadoop.fs.Path(final + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()
    if not fs.rename(tmp, jvm.org.apache.hadoop.fs.Path(final)):
        raise IOError(f"could not commit kmeans state journal {final}")
    # Compaction: every snapshot is self-contained, so once version v is
    # committed anything below v − (_JOURNAL_RETAIN − 1) is dead weight.
    # Delete AFTER the rename (the new version is durable first; a crash
    # between rename and delete merely leaves extra files for the next
    # commit to reap). foreachBatch is the single writer and the only
    # reader runs at startup, so no reader can hold an old version here.
    floor = state.n_batches - (_JOURNAL_RETAIN - 1)
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(sdir)):
        m = _STATE_RE.match(st.getPath().getName())
        if m and int(m.group(1)) < floor:
            fs.delete(st.getPath(), False)


def _load_latest_state(
    spark: SparkSession, checkpoint_dir: str
) -> tuple[StreamKMeansState, int] | None:
    """Highest-versioned journaled state and its last absorbed batch id,
    or ``None`` when no journal exists."""
    from questdb_etl_jobs_spark.sources.fs import hadoop_path_exists

    sdir = f"{checkpoint_dir.rstrip('/')}/{_STATE_DIR}"
    if not hadoop_path_exists(spark, sdir):
        return None
    jvm, fs = _hadoop(spark, sdir)
    versions: list[tuple[int, str]] = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(sdir)):
        m = _STATE_RE.match(st.getPath().getName())
        if m:
            versions.append((int(m.group(1)), str(st.getPath())))
    if not versions:
        return None
    _, path = max(versions)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        stream.close()
    doc = json.loads("\n".join(lines))
    state = StreamKMeansState(
        centroids=[
            [float.fromhex(x) for x in c] for c in doc["centroids_hex"]
        ],
        sums=[[Decimal(s) for s in row] for row in doc["sums"]],
        counts=[int(n) for n in doc["counts"]],
        n_batches=int(doc["n_batches"]),
    )
    return state, int(doc["batch_id"])


def kmeans_stream_fit(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    init_centroids: list[list[float]],
    checkpoint_dir: str,
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
    timeout_sec: int = 300,
) -> StreamKMeansState:
    """Replay a directory of vector files (ascending-mtime arrival order,
    ``max_files_per_trigger`` per micro-batch, AvailableNow) through the
    sequential k-means fold and return the final state.

    RESTART-SAFE: operator state is journaled per absorbed batch next to
    Spark's own checkpoint (see the module-level journal notes), so a
    killed fit re-invoked with the same ``checkpoint_dir`` (and the same
    ``init_centroids``) resumes bit-identically — Spark skips the files
    it already processed, the journal restores the sums they
    contributed, and a replayed uncommitted batch is deduplicated by
    batch id. A checkpoint dir that carries Spark progress but NO
    journal (e.g. written by a pre-journal build) raises rather than
    silently fitting the tail of the stream."""
    from questdb_etl_jobs_spark.sources.fs import hadoop_path_exists

    restored = _load_latest_state(spark, checkpoint_dir)
    if restored is None:
        if hadoop_path_exists(
            spark, f"{checkpoint_dir.rstrip('/')}/offsets"
        ):
            raise RuntimeError(
                "kmeans_stream_fit: checkpoint dir "
                f"{checkpoint_dir!r} carries Spark stream progress but "
                "no operator-state journal — resuming would skip the "
                "absorbed files' contributions and fit only the tail. "
                "Use a fresh checkpoint dir to refit from scratch."
            )
        state = init_stream_state(init_centroids)
        last_absorbed = -1
    else:
        state, last_absorbed = restored
        if len(state.centroids) != len(init_centroids) or len(
            state.centroids[0]
        ) != len(init_centroids[0]):
            raise ValueError(
                "kmeans_stream_fit: journaled state shape "
                f"{len(state.centroids)}x{len(state.centroids[0])} does "
                f"not match init_centroids "
                f"{len(init_centroids)}x{len(init_centroids[0])}"
            )

    def on_batch(batch_df, batch_id: int) -> None:
        nonlocal last_absorbed
        if batch_id <= last_absorbed:
            # Spark replays the last uncommitted micro-batch after a
            # crash; its sums are already in the journaled state.
            return
        absorb_batch(state, batch_df, vec_col=vec_col)
        _save_state(spark, checkpoint_dir, state, batch_id)
        last_absorbed = batch_id

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        # Partial state is NOT a fit — fail loudly rather than hand back
        # centroids missing the tail of the stream. (The journal makes
        # the partial fit RESUMABLE with the same checkpoint dir.)
        q.stop()
        raise TimeoutError(
            f"kmeans_stream_fit: replay did not settle within "
            f"{timeout_sec}s ({state.n_batches} micro-batches absorbed)"
        )
    return state
