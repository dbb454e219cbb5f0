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
