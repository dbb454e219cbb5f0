"""Library operators: compositions of DataFrame primitives.

Everything here is pure plan construction — no custom Catalyst rules, no
driver-side loops. Each operator documents its shuffle behavior and its
100 TB posture.
"""

from questdb_etl_jobs_spark.operators.asof import asof_join
from questdb_etl_jobs_spark.operators.interval import interval_join
from questdb_etl_jobs_spark.operators.latest import latest_on
from questdb_etl_jobs_spark.operators.sample_by import sample_by

__all__ = ["asof_join", "interval_join", "latest_on", "sample_by"]
