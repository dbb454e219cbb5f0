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
order by construction).

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
    sequential k-means fold and return the final state."""
    state = init_stream_state(init_centroids)

    def on_batch(batch_df, _batch_id: int) -> None:
        absorb_batch(state, batch_df, vec_col=vec_col)

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
        # centroids missing the tail of the stream.
        q.stop()
        raise TimeoutError(
            f"kmeans_stream_fit: replay did not settle within "
            f"{timeout_sec}s ({state.n_batches} micro-batches absorbed)"
        )
    return state
