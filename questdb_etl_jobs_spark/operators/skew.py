"""Skew mitigation: salted joins for hot keys.

AQE's skew-join handling (on by default, session.py) splits oversized
SORT-MERGE partitions at runtime and is the first line of defense — reach
for salting only when AQE can't help: a shuffled join where one key's rows
exceed a single task's memory even after AQE splits (splits help the
probe side but every split still carries the full build side of that
key), or engines/paths where AQE is unavailable.

Mechanics: the big side gets a uniform random salt in [0, n_salt); the
small side is exploded n_salt× so every (key, salt) bucket finds its
match. One hot key's rows spread over n_salt tasks at the cost of
replicating the small side's matching rows n_salt times.

Aggregation skew needs none of this: hash aggregation's partial (map-side
combine) phase already collapses hot keys before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key rows of
    ``big`` spread across ``n_salt`` shuffle buckets.

    Result equals ``big.join(small, on, how)`` for how in
    {inner, left}; the salt columns never escape.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_salted = big.withColumn(_SALT, (F.rand(seed) * n_salt).cast("int"))
    small_salted = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = big_salted.join(small_salted, on=[*on, _SALT], how=how)
    return joined.drop(_SALT)
