"""Distributed Lloyd k-means over an embedding column (EXT clustering).

Topic-aware corpus curation needs cluster structure — assign every
document embedding to a centroid, then mix/cap/sample per cluster (the
same role cluster-balanced sampling plays in large-scale pretraining
pipelines). The reference has no clustering surface; this is the
training-data extension mandated alongside dedup/similarity (SURVEY §2.10).

Spark-first shape (the classic scalable Lloyd layout):

- **Assignment is a pure projection** — the k centroids ride into every
  task as plan literals (k × dim doubles: tiny), each row folds its
  squared-L2 distance to every centroid in array order
  (``zip_with`` + ``aggregate``: whole-stage-codegen, zero Python), and
  the winner is ``array_position(dists, array_min(dists))`` — first
  minimum, so ties break to the lowest centroid id deterministically.
  No shuffle, no UDF.
- **The update step's shuffle is sketch-sized, not data-sized.**
  ``posexplode(vec)`` → ``groupBy(cluster, pos)`` partial-aggregates
  map-side, so the exchange carries at most ``partitions × k × dim``
  rows regardless of input row count — at 100 TB the wire cost is the
  cluster directory, never the corpus.
- **Cross-engine-deterministic arithmetic.** Component sums route
  through the repo's decimal protocol (``SUM(CAST(ROUND(x, 4) AS
  DECIMAL(28,4)))``): order-independent by construction, so the
  distributed sum equals a sequential CPython mirror bit-for-bit and
  the whole fit is differential-testable (q177). The new component is
  one IEEE division ``double(decimal_sum) / count`` computed driver-side
  on the collected k×dim directory.

Empty clusters keep their previous centroid (deterministic, mirrorable).
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class KMeansModel:
    centroids: list[list[float]]  # k × dim exact doubles
    iterations: int


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance folded in array order (deterministic IEEE)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment as a zero-shuffle codegen projection.

    ``cluster_col`` is the 0-based index of the nearest centroid by
    squared L2; ties go to the lowest index (``array_position`` returns
    the FIRST occurrence of the minimum). ``dist_col`` (optional) carries
    the winning squared distance.

    NULL vectors carry a NULL cluster (the distance fold propagates the
    null through ``array_min``/``array_position``) — same excluded-by-
    contract stance as the deterministic samplers: they never join a
    centroid's mean (:func:`_update_centroids` skips the NULL group).
    """
    vec = F.col(vec_col).cast("array<double>")
    dists = F.array(*[_sq_dist(vec, c) for c in centroids])
    out = df.withColumn(
        cluster_col,
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )
    if dist_col is not None:
        out = out.withColumn(dist_col, F.array_min(dists))
    return out


def _update_centroids(
    assigned: DataFrame,
    current: list[list[float]],
    vec_col: str,
    cluster_col: str,
) -> list[list[float]]:
    """One Lloyd update: per-(cluster, position) decimal mean.

    The shuffle after the map-side partial aggregate is bounded by
    ``input_partitions × k × dim`` rows; the collect is the k × dim
    directory only.
    """
    dim = len(current[0])
    sums = (
        assigned.select(
            F.col(cluster_col),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .groupBy(cluster_col, "pos")
        .agg(
            F.sum(F.round("val", 4).cast("decimal(28,4)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, tuple[Decimal, int]]] = {}
    for row in sums:
        if row[cluster_col] is None:  # NULL vectors: excluded by contract
            continue
        by_cluster.setdefault(row[cluster_col], {})[row["pos"]] = (
            row["s"],
            row["n"],
        )
    out: list[list[float]] = []
    for cid, prev in enumerate(current):
        comps = by_cluster.get(cid)
        if not comps:  # empty cluster: keep the previous centroid
            out.append(list(prev))
            continue
        out.append(
            [float(comps[p][0]) / comps[p][1] for p in range(dim)]
        )
    return out


def kmeans_fit(
    df: DataFrame,
    k: int,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> KMeansModel:
    """Deterministic distributed Lloyd fit.

    Init = the vectors of the k lowest ``id_col`` rows (a deterministic,
    oracle-mirrorable seed — k-means++ would need a sequential random
    scan that no differential oracle could replay exactly). Each
    iteration is one assignment projection + one sketch-sized update
    shuffle; the driver holds only the k × dim directory.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    seed_rows = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .filter(F.col(vec_col).isNotNull())  # NULLs excluded by contract
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"k={k} exceeds input row count {len(seed_rows)}")
    centroids = [[float(x) for x in r["v"]] for r in seed_rows]
    for _ in range(iterations):
        assigned = assign_clusters(df, centroids, vec_col=vec_col)
        centroids = _update_centroids(assigned, centroids, vec_col, "cluster")
    return KMeansModel(centroids=centroids, iterations=iterations)


def kmeans_transform(
    df: DataFrame,
    model: KMeansModel,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str | None = "sq_dist",
) -> DataFrame:
    """Final assignment under a fitted model (zero-shuffle projection)."""
    return assign_clusters(
        df, model.centroids, vec_col=vec_col,
        cluster_col=cluster_col, dist_col=dist_col,
    )
