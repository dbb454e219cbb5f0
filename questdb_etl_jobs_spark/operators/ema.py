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
- ``applyInPandas`` over the key partitions (this module): one shuffle
  on the key, Arrow-batched transfer, and the recurrence runs
  vectorized-per-group in C-backed pandas. State is one double per
  group; per-group work is O(rows); series length is unbounded.

Scale posture: identical shuffle shape to any keyed window (exchange on
``key``); skewed keys behave like any hot window partition. The UDF is
grouped-map Pandas (Arrow), never row-at-a-time Python.
"""

from __future__ import annotations

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
    ``ignore_nulls`` semantics).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    from pyspark.sql.types import DoubleType, StructField, StructType

    sort_cols = [ts, *(order or [])]
    out_schema = StructType(
        list(df.schema.fields) + [StructField("ema", DoubleType())]
    )
    a = float(alpha)
    one_minus = 1.0 - a

    def per_key(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value].to_numpy(dtype="float64", na_value=np.nan)
        y = np.empty_like(x)
        state = np.nan
        for i in range(len(x)):
            xi = x[i]
            if np.isnan(xi):
                y[i] = state  # NULL: carry previous EMA (NULL before any x)
                continue
            state = xi if np.isnan(state) else a * xi + one_minus * state
            y[i] = state
        s = pd.Series(y, dtype="float64").astype("Float64")
        s[np.isnan(y)] = pd.NA
        pdf["ema"] = s
        return pdf

    return df.groupBy(key).applyInPandas(per_key, schema=out_schema)
