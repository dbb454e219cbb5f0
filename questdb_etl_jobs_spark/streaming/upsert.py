"""Idempotent streaming ingest: foreachBatch → deduplicating upsert.

The reference's delivery model is files arriving on object storage
(reference README.md:102-103, hourly exports README.md:373). Object
stores redeliver: the same export can fire the trigger twice, or a
backfill can replay a day. The stateful-dedup path
(streaming/file_stream.py) drops redelivered ROWS while the watermark
covers them; this sink makes the TABLE itself idempotent instead —
every micro-batch merges via ``upsert_designated_ts`` (QuestDB
DEDUP UPSERT KEYS semantics), so a redelivered batch replaces rows with
their identical selves and the table never grows duplicates, with no
state-store retention window to outlive.

Scale shape per micro-batch: one merge shuffle + a rewrite of ONLY the
date partitions the batch touches — a replayed hour moves an hour of
data against a 100 TB table. Micro-batches must be time-bounded (they
are, under file-arrival triggers) or the partition-overwrite set grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from questdb_etl_jobs_spark.plans.designated import (
    enforce_ttl,
    list_partitions,
    upsert_designated_ts,
)


def maintain_upsert_table(
    stream: DataFrame,
    table_path: str,
    checkpoint_path: str,
    ts: str,
    keys: list[str],
    available_now: bool = True,
    ttl_days: int | None = None,
) -> StreamingQuery:
    """Continuously merge ``stream`` into a designated-ts table at
    ``table_path`` with dedup-upsert semantics on ``(ts, keys)``.

    ``ttl_days`` is QuestDB's evaluate-on-ingest ``SET TTL`` wired into
    the streaming path: after each micro-batch's merge commits,
    partitions older than ``ttl_days`` before the table's newest
    partition are dropped (directory deletes off the partition listing,
    no scan — see :func:`plans.designated.enforce_ttl`). Enforcement is
    idempotent and post-commit, so a replayed batch re-drops nothing
    and a crash between merge and enforcement self-heals on the next
    batch; the retention horizon advances continuously with ingest,
    QuestDB's lifecycle semantics rather than one-shot DDL."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        upsert_designated_ts(spark, batch, table_path, ts, keys)
        if ttl_days is not None:
            existing = list_partitions(spark, table_path, ts)
            if existing:
                enforce_ttl(spark, table_path, ts, ttl_days, existing[-1])

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
