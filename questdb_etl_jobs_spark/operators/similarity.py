"""Similarity search over embedding columns (array<float>).

Two paths, same contract:

- :func:`cosine_topk` — exact brute force. One scan, no shuffle until the
  final top-k (``TakeOrderedAndProject`` — Spark keeps k rows per
  partition, never a global sort). Right answer, O(N·d) work: the baseline
  and the oracle-checkable path.
- :func:`lsh_topk` — sign-random-projection LSH: deterministic seeded
  hyperplanes → bit signature → candidates share a bucket → exact re-rank
  inside buckets only. At 100 TB the probe touches one bucket (a partition-
  pruned slice), not the corpus. Approximate: recall < 1, tunable via
  (n_planes, n_tables).

An IVF variant (coarse k-means centroids as buckets) would slot into the
same re-rank shape; LSH is chosen because it's training-free and purely
expression-based.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.functions.vectors import cosine_similarity, dot


def cosine_topk(
    embeddings: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k rows by cosine similarity to the probe vector.

    Returns (id_col, cosine) ordered by similarity desc, id asc. The probe
    is a plan literal — broadcast to every task for free.
    """
    probe_col = F.array(*[F.lit(float(x)) for x in probe])
    scored = embeddings.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), probe_col).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def all_pairs_above(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ threshold).

    Quadratic — intended for bounded slices or as the verify stage behind
    LSH candidates; the join is a broadcast nested loop when one side is
    small."""
    a = embeddings.select(
        F.col(id_col).alias(f"{id_col}_a"), F.col(vec_col).alias("__va")
    )
    b = embeddings.select(
        F.col(id_col).alias(f"{id_col}_b"), F.col(vec_col).alias("__vb")
    )
    pairs = a.join(b, F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
    return pairs.select(
        f"{id_col}_a",
        f"{id_col}_b",
        cosine_similarity(F.col("__va"), F.col("__vb")).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def add_lsh_signature(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    sig_col: str = "lsh_sig",
) -> DataFrame:
    """Append a sign-random-projection signature (string of 0/1 bits).

    Deterministic: hyperplanes derive from ``seed`` only, so signatures are
    stable across runs/clusters — bucketing and storage partitioning on the
    signature stay consistent (write-time partitionBy(sig) makes probe
    lookups partition-pruned scans).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(w) for w in plane])) >= 0, "1")
        .otherwise("0")
        for plane in planes
    ]
    return embeddings.withColumn(sig_col, F.concat(*bits))


def write_lsh_bucketed(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 7,
    vec_col: str = "embedding",
    sig_col: str = "lsh_sig",
    mode: str = "overwrite",
) -> None:
    """Persist embeddings partitioned by LSH signature.

    This is what makes :func:`lsh_topk_bucketed` a partition-pruned scan at
    100 TB: each signature becomes a storage partition
    (``.../lsh_sig=0110.../part-*.parquet``), so a probe reads ONE
    directory out of 2^n_planes instead of filtering the corpus. Signatures
    are deterministic in (dim, n_planes, seed) — writer and probe agree as
    long as they share the parameters.
    """
    signed = add_lsh_signature(
        embeddings, dim, n_planes, seed, vec_col=vec_col, sig_col=sig_col
    )
    signed.write.partitionBy(sig_col).mode(mode).parquet(path)


def probe_signature(probe: list[float], n_planes: int = 12, seed: int = 7) -> str:
    """The LSH bucket a probe vector falls in (same hyperplanes as the
    writer)."""
    planes = _hyperplanes(len(probe), n_planes, seed)
    return "".join(
        "1" if sum(w * x for w, x in zip(plane, probe)) >= 0 else "0"
        for plane in planes
    )


def lsh_topk_bucketed(
    spark,
    path: str,
    probe: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over a :func:`write_lsh_bucketed` table.

    The ``lsh_sig == <bucket>`` filter is a partition filter — Catalyst
    prunes to the single matching directory (assert `PartitionFilters` in
    the scan node), so probe cost is O(bucket), not O(corpus).
    """
    bucket_sig = probe_signature(probe, n_planes, seed)
    bucket = spark.read.parquet(path).filter(F.col("lsh_sig") == bucket_sig)
    return cosine_topk(bucket, probe, k, id_col=id_col, vec_col=vec_col)


def lsh_topk(
    embeddings: DataFrame,
    probe: list[float],
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact re-rank restricted to the probe's LSH bucket.

    Same output schema as :func:`cosine_topk`. Recall improves with fewer
    planes (bigger buckets) or multiple tables (union of seeds).
    """
    dim = dim if dim is not None else len(probe)
    planes = _hyperplanes(dim, n_planes, seed)
    probe_bits = "".join(
        "1" if sum(w * x for w, x in zip(plane, probe)) >= 0 else "0"
        for plane in planes
    )
    signed = add_lsh_signature(embeddings, dim, n_planes, seed, vec_col=vec_col)
    bucket = signed.filter(F.col("lsh_sig") == probe_bits)
    return cosine_topk(bucket, probe, k, id_col=id_col, vec_col=vec_col)
