"""Physical-plan inspection helpers (used by tests to pin plan shape).

Correctness tests prove the values; these prove the *plan* — that a filter
reached the scan, a small dimension broadcast, a top-k avoided a global
sort. At 100 TB the plan shape is the performance contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Return the physical plan as a string (same text as .explain())."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    """Assert every needle appears in the physical plan."""
    plan = plan_string(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan missing {missing}; got:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    """Assert no needle appears in the physical plan."""
    plan = plan_string(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}; got:\n{plan}")
