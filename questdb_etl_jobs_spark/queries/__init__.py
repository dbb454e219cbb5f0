"""Declared correctness-query registry (SURVEY.md §2.11).

Every implemented operator is exercised by at least one named query with
two faces:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine path (DataFrame
  API / library operators);
- ``oracle`` — an equivalent DuckDB SQL string the driver runs against the
  same parquet tables; ``None`` marks genuinely non-SQL-expressible
  operators, which get a weaker rows-only check.

Output protocol (both faces): total ORDER BY over a unique key; floats
rounded to 4 (sums routed through DECIMAL(28,4) of pre-rounded terms so
double accumulation order can't shift the 4th decimal); timestamps at µs
precision; arrays joined to strings. Column names are aliased identically
on both sides — the driver's comparator hashes columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | Callable[[], str] | None
    covers: str = ""  # SURVEY.md §2 operator ids this query exercises


REGISTRY: dict[str, QuerySpec] = {}


def dq(name: str, oracle: str | Callable[[], str] | None, covers: str = ""):
    """Register a declared query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, covers)
        return fn

    return wrap


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _load()
    out: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        out[name] = spec.oracle() if callable(spec.oracle) else spec.oracle
    return out


def _load() -> None:
    """Import all query modules (idempotent) so REGISTRY is complete."""
    from questdb_etl_jobs_spark.queries import (  # noqa: F401
        reference_etl,
        relational,
        windows,
        llm,
        streaming_q,
        training,
    )
