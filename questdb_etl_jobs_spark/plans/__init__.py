"""Table-layout conventions and physical-plan inspection helpers."""

from questdb_etl_jobs_spark.plans.designated import (
    write_designated_ts,
    read_designated_ts,
)
from questdb_etl_jobs_spark.plans.inspect import plan_string, assert_in_plan

__all__ = [
    "write_designated_ts",
    "read_designated_ts",
    "plan_string",
    "assert_in_plan",
]
