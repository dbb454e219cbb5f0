"""Streaming LATEST ON: a continuously maintained latest-row-per-key view.

The streaming face of QuestDB's LATEST ON idiom (reference
sql/create-table.sql:1 designates the timestamp; the batch operator is
operators/latest.py): as events stream in, keep an up-to-date "current
value per key" table.

Design — upsert log, not table rewrite:

- Each micro-batch is reduced to ITS latest row per key (a batch-local
  window over the handful of in-flight rows) and APPENDED to an upsert
  log. Per-batch work is O(batch), never O(table) — rewriting the full
  view per batch would be quadratic over the stream's life and is the
  classic 100 TB streaming anti-pattern.
- Readers resolve the view with the same batch operator over the log:
  ``latest_on(log)`` — one shuffle over the log.
- ``compact_latest`` periodically rewrites the log to one row per key
  (idempotent; run it when read cost outweighs rewrite cost). This is
  the standard CDC/upsert-log + compaction trade: cheap writes, reads
  pay log depth until compaction.

State never lives in the driver or the state store — key cardinality
can exceed memory; the log is just parquet. For bounded-key cases where
state-store residency is fine, see streaming/stateful.py for the
applyInPandasWithState alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from questdb_etl_jobs_spark.operators.latest import latest_on


def maintain_latest_on(
    stream: DataFrame,
    log_path: str,
    checkpoint_path: str,
    ts: str,
    key: list[str],
    tiebreak: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the upsert log for a latest-per-key view of ``stream``."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            latest_on(batch, ts, key, tiebreak).write.mode("append").parquet(
                log_path
            )

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_latest(
    spark: SparkSession,
    log_path: str,
    ts: str,
    key: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Resolve the current latest-per-key view from the upsert log."""
    return latest_on(spark.read.parquet(log_path), ts, key, tiebreak)


def compact_latest(
    spark: SparkSession,
    log_path: str,
    ts: str,
    key: list[str],
    tiebreak: list[str] | None = None,
) -> None:
    """Rewrite the log to one row per key (read cost back to O(keys)).

    Resolve → write to a side directory → swap. The swap is two renames
    (atomic enough for single-writer maintenance jobs; coordinate with a
    table format's commit protocol when concurrent readers need stronger
    guarantees).
    """
    import shutil

    resolved = read_latest(spark, log_path, ts, key, tiebreak)
    tmp = log_path.rstrip("/") + ".__compact__"
    resolved.write.mode("overwrite").parquet(tmp)
    old = log_path.rstrip("/") + ".__old__"
    shutil.move(log_path, old)
    shutil.move(tmp, log_path)
    shutil.rmtree(old, ignore_errors=True)
