"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All three functions delegate to the engine's declared-query registry
(questdb_etl_jobs_spark/queries/__init__.py): every implemented operator
from SURVEY.md §2 is exercised by at least one registered query with a
DuckDB oracle — since round 6 EVERY registered query is oracle-paired
(approx sketches gate on exact-count + accuracy-bound rows, q27/q117/
q120 pattern), so there are zero rows-only checks left.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The engine package lives beside this file; make it importable no matter
# what working directory the driver loads this module from.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the q10 star join
    (lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation) → revenue)."""
    from questdb_etl_jobs_spark.queries import spark_queries

    return spark_queries()["q10_join_revenue_by_nation"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    from questdb_etl_jobs_spark.queries import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet tables. Every ``queries()`` key is present — the registry
    enforces oracle pairing structurally (queries/__init__.dq)."""
    from questdb_etl_jobs_spark.queries import oracle_queries

    return oracle_queries()
