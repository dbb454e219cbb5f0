"""Console for the QuestDB dialect front-end.

The reference tutorial ends at a QuestDB web console running SQL over the
loaded table (`reference README.md:58,363-366`). This is that console's
CLI twin against the Spark engine:

    python -m questdb_etl_jobs_spark.sql "SELECT * FROM events LIMIT 5"
    python -m questdb_etl_jobs_spark.sql \\
        "SELECT ts, first(value) open, last(value) close FROM events \\
         WHERE ts IN '2024-01-10' SAMPLE BY 1h" --sf-dir /root/testdata/sf0.01

Registers the test tables (TESTDATA.md) as views with their designated
timestamps (events.ts, orders.o_orderdate, lineitem.l_shipdate) and
prints the result. Dialect constructs lower onto library operators;
standard SQL passes through to spark.sql.
"""

from __future__ import annotations

import argparse
import os
import sys

#: table -> designated timestamp column (QuestDB keeps this in metadata).
DESIGNATED = {
    "events": "ts",
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m questdb_etl_jobs_spark.sql",
        description="Run a QuestDB-dialect SQL string on the Spark engine.",
    )
    parser.add_argument("sql", help="the query string (QuestDB dialect or standard SQL)")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="test-table directory to register as views",
    )
    parser.add_argument("--rows", type=int, default=20, help="max rows to print")
    args = parser.parse_args(argv)

    from questdb_etl_jobs_spark.session import get_spark
    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.sql import questdb_sql

    spark = get_spark(app_name="questdb-sql-console")
    from questdb_etl_jobs_spark.schemas import TEST_TABLE_NAMES

    for name in TEST_TABLE_NAMES:
        try:
            load_table(spark, args.sf_dir, name).createOrReplaceTempView(name)
        except Exception:  # noqa: BLE001 — missing table file: skip the view
            continue
    out = questdb_sql(spark, args.sql, designated=DESIGNATED)
    out.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
