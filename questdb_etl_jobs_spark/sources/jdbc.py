"""JDBC sink for QuestDB's PostgreSQL wire protocol.

The reference loads rows one INSERT-round-trip at a time over PG wire
port 8812 (reference cloud_function.py:81-95,127-129; DSN in reference
README.md:107). The Spark-native replacement is the batched, partition-
parallel JDBC writer: N executors × batchsize-row inserts instead of one
row per network round trip.

No QuestDB (nor a Postgres JDBC driver) is present in the test
environment, but Spark's own distribution ships Apache Derby (its Hive
metastore backend), so the writer IS executed end-to-end in tests
against ``jdbc:derby:memory:`` — same ``df.write.format("jdbc")`` code
path, batched partition-parallel appends, write → read-back → value
equality (tests/test_sinks.py). Only the PG-wire dialect specifics
remain untested here; the fully-verified network sink is the ILP twin
(sources/ilp.py) — QuestDB's documented high-throughput ingest path,
plain text over TCP, golden-tested against a loopback socket server.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter

DEFAULT_URL = "jdbc:postgresql://localhost:8812/qdb"


def jdbc_options(
    table: str,
    url: str = DEFAULT_URL,
    user: str = "admin",
    password: str = "quest",
    batchsize: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """JDBC writer options for a QuestDB table (pure — unit-testable
    without a JVM or database). ``driver`` defaults to the PG-wire
    driver QuestDB speaks; tests swap in Derby's embedded driver
    (shipped inside Spark's own distribution for the Hive metastore) to
    execute the writer end-to-end with zero extra dependencies."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": driver,
        "batchsize": str(batchsize),
        "isolationLevel": "NONE",
    }


def jdbc_writer(
    df: DataFrame,
    table: str,
    num_partitions: int | None = None,
    **options,
) -> DataFrameWriter:
    """Build an append-mode JDBC writer for a QuestDB table.

    ``batchsize`` rows per INSERT batch replaces the reference's 1-row
    round trips; ``num_partitions`` caps concurrent connections (QuestDB
    ingests in parallel but a 1000-executor cluster must not open 1000
    sockets — coalesce first).
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    return df.write.format("jdbc").options(**jdbc_options(table, **options)).mode(
        "append"
    )


def write_purchases(df: DataFrame, **kwargs) -> None:
    """Append typed purchase rows to the QuestDB ``purchases`` table
    (reference sql/create-table.sql:1)."""
    jdbc_writer(df, "purchases", **kwargs).save()
