"""Sources and sinks: parquet test tables, reference-format CSV, JDBC."""

from questdb_etl_jobs_spark.sources.tables import load_table, register_tables
from questdb_etl_jobs_spark.sources.csv_source import read_purchases_csv

__all__ = ["load_table", "register_tables", "read_purchases_csv"]
