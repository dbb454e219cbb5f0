"""Deterministic sampling for training-data curation.

``df.sample()`` / ``TABLESAMPLE`` draw from a partition-order-dependent
RNG stream — reruns and engine changes shift the sample, which poisons
dataset reproducibility. Curation pipelines want CONTENT-keyed sampling:
a row is in or out as a pure function of its key, stable across engines,
partitionings, and reruns (the same property exact_dedup relies on for
winner selection).

The hash is Knuth's multiplicative scheme ``(key * 2654435761) mod 2^k``
on BIGINT — pure codegen'd arithmetic, no UDF, expressible identically in
any ANSI SQL engine (the differential oracle runs the same expression).
Keys up to ~3.4e9 stay within int64 before the mod; for wider key spaces
pre-fold the key (e.g. ``pmod(key, 2^31)``) or swap in xxhash64 when
cross-engine reproducibility isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth's 2^32 / phi multiplier.
_KNUTH = 2654435761

#: Hash buckets per key (sampling resolution: 1/10000).
RESOLUTION = 10_000


def sample_bucket(key: Column | str, salt: int = 0) -> Column:
    """Deterministic bucket in [0, RESOLUTION) from an integer key.

    ``salt`` decorrelates independent samples over the same key space
    (train/validation splits, repeated experiments).
    """
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod((k + F.lit(salt)) * F.lit(_KNUTH), F.lit(RESOLUTION))

def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided purely by ``key``."""
    return df.filter(sample_bucket(key, salt) < int(fraction * RESOLUTION))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (downsample dominant sources,
    keep rare ones whole — the standard corpus-mixing move).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    get ``default``. One codegen'd CASE over the stratum column — no
    shuffle, no RNG, pushdown-friendly.
    """
    threshold = F.lit(int(default * RESOLUTION))
    for value, frac in fractions.items():
        threshold = (
            F.when(F.col(strata_col) == value, int(frac * RESOLUTION))
            .otherwise(threshold)
        )
    return df.filter(sample_bucket(key, salt) < threshold)


def token_budget_take(
    df: DataFrame,
    key: str,
    strata_col: str,
    weight_col: str,
    budget: int,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum budgeted take: keep the deterministic-hash-ordered
    prefix of each stratum whose cumulative ``weight_col`` stays within
    ``budget`` (mixture targets expressed in tokens, not fractions).

    Exact-prefix semantics need a per-stratum cumulative window — one
    shuffle on ``strata_col``, and each stratum's running sum serializes
    into a single task. Fine when strata are bounded (languages,
    sources); for corpus-sized strata use
    :func:`token_budget_take_scalable`, which trades exact-prefix for a
    bucket-granular cutoff and never materializes a stratum-wide window.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(strata_col)
        .orderBy(sample_bucket(key, salt).asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum", F.sum(weight_col).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def token_budget_take_scalable(
    df: DataFrame,
    key: str,
    strata_col: str,
    weight_col: str,
    budget: int,
    salt: int = 0,
) -> DataFrame:
    """Bucket-granular budgeted take that survives corpus-sized strata.

    Two passes, no stratum-wide window:

    1. aggregate ``weight_col`` per (stratum, hash bucket) — at most
       RESOLUTION rows per stratum regardless of input size, partial-
       aggregated map-side;
    2. a cumulative window over that TINY aggregate finds each stratum's
       cutoff bucket (the last whose running total fits the budget),
       which broadcasts back as a semi-join filter
       ``bucket <= cutoff(stratum)``.

    The kept set is a deterministic function of content, reproducible
    across engines and reruns; the budget is met at bucket granularity
    (~1/RESOLUTION of the stratum's weight, e.g. 0.01%), which is the
    right trade at 100 TB — the alternative serializes a trillion-row
    running sum through one task.
    """
    from pyspark.sql.window import Window

    bucket = sample_bucket(key, salt).alias("__bucket")
    hist = df.select(
        F.col(strata_col).alias("__stratum"),
        bucket,
        F.col(weight_col).alias("__w"),
    ).groupBy("__stratum", "__bucket").agg(F.sum("__w").alias("__bw"))
    cum_w = (
        Window.partitionBy("__stratum")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cutoffs = (
        hist.withColumn("__cum", F.sum("__bw").over(cum_w))
        .filter(F.col("__cum") <= budget)
        .groupBy("__stratum")
        .agg(F.max("__bucket").alias("__cutoff"))
    )
    return (
        df.join(
            F.broadcast(cutoffs),
            (F.col(strata_col) == F.col("__stratum"))
            & (sample_bucket(key, salt) <= F.col("__cutoff")),
            "inner",
        )
        .drop("__stratum", "__cutoff")
    )


def fixed_size_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (eval sets, human
    review batches — places where "about 1%" is the wrong contract).

    Priority sampling: rank rows inside each stratum by the content-
    keyed hash (ties by key) and keep the first k. Reproducible across
    engines/reruns like the other samplers; adding NEW rows to a stratum
    can displace old members (k is fixed — that's the contract), but
    never reorders survivors relative to each other.

    NULL ``key`` rows are EXCLUDED from the draw (module-wide sampler
    contract — a content-keyed draw is undefined for a null key). Until
    round 11 this face accidentally let null-key rows occupy sample
    slots ahead of every hashed row (ASC-nulls-first ordering); that
    was never a contract, no oracle covers it, and the explicit filter
    replaces it with a stated rule.

    Scale posture: routed through the grouped threshold prune
    (operators/topk.topk_per_key on the negated bucket), so the stratum
    exchange carries only rows at or below each stratum's certified
    k-th-smallest-partition-min bucket — not the corpus. Bit-identical
    to the plain ``row_number() <= k`` window over the same (non-null-
    key) rows — the prune is answer-preserving by construction.
    """
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    pruned = topk_per_key(
        df.filter(F.col(key).isNotNull()).withColumn(
            "__negbucket", -sample_bucket(key, salt)
        ),
        [strata_col],
        "__negbucket",
        k,
        tiebreak=[key],
    )
    return pruned.drop("__negbucket")


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES),
    deterministic: row priority ``-ln(u) / w`` with ``u`` drawn from the
    content-keyed hash, keep the ``k`` smallest priorities. Inclusion
    probability is proportional to weight (the exponential-race scheme),
    and the draw is a pure function of (key, salt) — reproducible across
    engines, partitionings and reruns, like every sampler in this module.

    Plan shape: priority is codegen'd arithmetic on the scan, and the
    global top-k is TakeOrdered (per-partition heaps + driver merge of k
    rows) — no global sort, no shuffle of non-survivors. At 100 TB this
    is a map-side pass over the corpus emitting k rows per partition.

    NULL ``key`` rows are EXCLUDED from the draw (module-wide sampler
    contract): a null key hashes to a null priority, which Spark's ASC
    ordering would seat ahead of every real draw while the SQL oracle's
    NULLS-LAST default would not — the explicit filter replaces that
    engine-dependent accident with a stated rule.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (sample_bucket(key, salt) + F.lit(1)).cast("double") / F.lit(
        float(RESOLUTION)
    )
    priority = -F.log(u) / w.cast("double")
    return (
        df.filter(F.col(key).isNotNull())
        .withColumn("__pri", priority)
        .orderBy(F.col("__pri").asc(), F.col(key).asc())
        .limit(k)
        .drop("__pri")
    )


def weighted_sample_per_key(
    df: DataFrame,
    strata: list[str],
    key: str,
    weight: Column | str,
    k: int,
    salt: int = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-stratum weighted sampling without replacement — the grouped
    face of :func:`weighted_sample_topk`: an independent
    Efraimidis–Spirakis exponential race inside every ``strata`` cell
    (sample the k best-weighted documents per domain/language, not per
    corpus). Same determinism contract: priority ``-ln(u) / w`` with
    ``u`` from the content-keyed hash, so the draw is a pure function of
    (key, salt) and reproducible across engines, partitionings, reruns.

    Plan shape: priority is codegen'd arithmetic on the scan, and the
    per-stratum k-smallest runs through the grouped threshold prune
    (operators/topk.topk_per_key on the negated priority) — the stratum
    exchange carries only certified-plausible rows, never the corpus.
    IEEE negation is exact, so ordering by ``-priority DESC`` is
    bit-identical to ``priority ASC``.

    NULL ``key`` rows are EXCLUDED from the draw (module-wide sampler
    contract, stated filter — same rule as :func:`weighted_sample_topk`
    and :func:`fixed_size_sample`).
    """
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    w = F.col(weight) if isinstance(weight, str) else weight
    u = (sample_bucket(key, salt) + F.lit(1)).cast("double") / F.lit(
        float(RESOLUTION)
    )
    pruned = topk_per_key(
        df.filter(F.col(key).isNotNull()).withColumn(
            "__negpri", F.log(u) / w.cast("double")
        ),
        strata,
        "__negpri",
        k,
        tiebreak=[key],
        rank_col=rank_col,
    )
    return pruned.drop("__negpri")
