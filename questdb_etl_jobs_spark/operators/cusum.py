"""CUSUM drift detection: the sequential recurrence as pure codegen.

The classic one-sided CUSUM monitor (Page's test, public SPC
literature): ``S_i = max(0, S_{i-1} + (x_i - target - slack))`` flags
sustained drift when S crosses a threshold. It LOOKS like an inherently
sequential recurrence (the EMA needed a pandas UDF for exactly this
shape) — but the max-with-zero reset has a closed form the EMA lacks:

    S_i  =  P_i − min(0, P_1, …, P_i),   P = prefix sum of the deltas

(induction: ``max(0, P_{i−1} − m_{i−1} + d_i) = P_i − min(P_i,
m_{i−1})``). Prefix sum and running min are both ONE window frame over
the same keyed ordering, so the whole monitor is whole-stage codegen on
a single exchange — no Python anywhere, unlike every textbook
implementation of the loop. The negative side mirrors with max/negated
deltas. That closed form is also what makes the operator
oracle-friendly: both engines evaluate the identical sequential float
additions (a window prefix sum fixes the summation order), so results
match bit-for-bit modulo the usual 4-decimal gate.

At 100 TB: one shuffle keyed by the monitored entity; state is zero
(it's a batch window op); the streaming twin would carry (P, min)
per key — two doubles — but batch-over-designated-ts is the deployment
shape for backtesting alert rules, which is what this module serves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum(
    df: DataFrame,
    value: str,
    ts: str,
    keys: list[str],
    target: float,
    slack: float = 0.0,
    threshold: float | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Append ``cusum_pos`` / ``cusum_neg`` (and ``drift_up`` /
    ``drift_down`` when ``threshold`` is given) per key in ts order.

    ``cusum_pos`` accumulates excess above ``target + slack`` and resets
    at 0; ``cusum_neg`` accumulates shortfall below ``target − slack``.
    ``tiebreak`` keeps the order (hence the float summation order)
    deterministic when timestamps repeat — pass the table's unique id.
    """
    order = [F.col(ts), *[F.col(c) for c in (tiebreak or [])]]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d_pos = F.col(value) - F.lit(target) - F.lit(slack)
    d_neg = F.lit(target) - F.lit(slack) - F.col(value)
    # Two window passes over ONE ordering: prefix sums first (windows
    # cannot nest), then running min of the materialized prefix — the
    # optimizer plans both frames on a single exchange+sort.
    staged = df.withColumn("__p_pos", F.sum(d_pos).over(w)).withColumn(
        "__p_neg", F.sum(d_neg).over(w)
    )
    s_pos = F.col("__p_pos") - F.least(
        F.lit(0.0), F.min("__p_pos").over(w)
    )
    s_neg = F.col("__p_neg") - F.least(
        F.lit(0.0), F.min("__p_neg").over(w)
    )
    out = (
        staged.withColumn("cusum_pos", s_pos)
        .withColumn("cusum_neg", s_neg)
        .drop("__p_pos", "__p_neg")
    )
    if threshold is not None:
        out = out.withColumn(
            "drift_up", F.col("cusum_pos") > F.lit(threshold)
        ).withColumn("drift_down", F.col("cusum_neg") > F.lit(threshold))
    return out
