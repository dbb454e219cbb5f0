"""The reference ETL pipeline, Spark-first.

Reproduces the dataflow of the reference's Cloud Function
(reference cloud_function.py:98-129) as a declarative plan:

    event gates → CSV scan → anonymize/cast → split good/quarantine
    → designated-ts table append (and/or JDBC append)

Semantic invariants preserved (SURVEY.md §1.4):

1. deterministic anonymization: ``buyer = sha1(email)`` hex — same email,
   same digest, per-buyer analytics survive (reference cloud_function.py:70);
2. per-record fault isolation: malformed rows are quarantined, never fatal
   (intent of reference cloud_function.py:91-95; the reference actually
   crashes on a wrong-arity row at the unpack in cloud_function.py:67 —
   we fix the bug, keep the intent);
3. input gating before any work (reference cloud_function.py:103-115);
4. typed, validated rows only reach the table (reference
   sql/create-table.sql:1).

All transforms are built-in JVM expressions (sha1, try_cast,
try_to_timestamp) — no Python in the row path, so the batch is
whole-stage-codegen'd end to end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.schemas import PURCHASE_TS_PATTERN
from questdb_etl_jobs_spark.sources.csv_source import read_purchases_csv
from questdb_etl_jobs_spark.plans.designated import write_designated_ts

#: Required keys of the storage event envelope (reference cloud_function.py:36).
REQUIRED_EVENT_KEYS = ("bucket", "contentType", "name", "size")


def is_event_valid(event: dict) -> bool:
    """Gate 1 — event shape: all required keys present
    (reference cloud_function.py:29-38)."""
    return all(key in event for key in REQUIRED_EVENT_KEYS)


def is_object_valid(event: dict) -> bool:
    """Gate 2 — object content: non-empty and CSV content type
    (reference cloud_function.py:41-50)."""
    try:
        size = int(event["size"])
    except (KeyError, TypeError, ValueError):
        return False
    return size > 0 and event.get("contentType") == "text/csv"


def gate_files_df(df: DataFrame) -> DataFrame:
    """DataFrame-side object gates (SURVEY §2.2 P1/P2 distributed variant).

    The driver-side dict gates (:func:`is_event_valid`/:func:`is_object_valid`)
    mirror the reference's per-event Cloud Function check; when many files
    land in one batch the same predicates belong IN the plan, on the file
    source's ``_metadata`` columns (csv_source.read_purchases_csv
    ``with_file_metadata=True``): non-empty object + CSV name. Catalyst
    evaluates them per file, so invalid objects never produce rows
    downstream.
    """
    return df.filter(
        (F.col("_source_size") > 0) & F.col("_source_file").endswith(".csv")
    )


def anonymize_and_cast(raw: DataFrame) -> DataFrame:
    """Transform raw (all-string) rows to the typed purchases shape.

    The PII column is dropped and replaced by its SHA-1 hex digest
    (reference cloud_function.py:62-78); positional casts per reference
    cloud_function.py:74-76; timestamp pattern per cloud_function.py:88.
    ``try_``-variants yield NULL (not an error) on bad input so invalid
    values route to quarantine under ANSI mode.
    """
    return raw.select(
        F.sha1(F.col("email")).alias("buyer"),
        F.col("item_id").try_cast("int").alias("item_id"),
        F.col("quantity").try_cast("int").alias("quantity"),
        F.col("price").try_cast("int").alias("price"),
        F.try_to_timestamp(
            F.col("purchase_date"), F.lit(PURCHASE_TS_PATTERN)
        ).alias("purchase_date"),
        F.col("_corrupt_record"),
    )


def _bad_condition():
    """A row quarantines if the CSV line failed to parse or any required
    field failed validation/cast (reference sql/create-table.sql:1)."""
    return (
        F.col("_corrupt_record").isNotNull()
        | F.col("buyer").isNull()
        | F.col("item_id").isNull()
        | F.col("quantity").isNull()
        | F.col("price").isNull()
        | F.col("purchase_date").isNull()
    )


def split_quarantine(typed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (good, quarantined) — per-record fault isolation."""
    bad_cond = _bad_condition()
    good = typed.filter(~bad_cond).drop("_corrupt_record")
    bad = typed.filter(bad_cond)
    return good, bad


@dataclass
class BatchResult:
    rows_loaded: int
    rows_quarantined: int


def run_batch(
    spark: SparkSession,
    event: dict,
    csv_path: str | None = None,
    table_path: str | None = None,
    quarantine_path: str | None = None,
) -> BatchResult | None:
    """One pipeline invocation, mirroring entrypoint()
    (reference cloud_function.py:98-129).

    Returns None when the gates reject the event (the reference's early
    return, cloud_function.py:105-115); otherwise loads good rows into the
    designated-ts table and quarantines bad rows, returning counts.

    Consistency caveat: the returned counts come from the Observation on
    the table-write scan, while quarantined rows are written by a second,
    independent scan of the source CSV — if the file mutates between the
    two scans, the written quarantine rows can disagree with the returned
    count. Source objects are immutable in the reference's bucket model
    (GCS finalize events), so this is a documented non-goal, not a race
    we defend against.
    """
    if not is_event_valid(event) or not is_object_valid(event):
        return None
    path = csv_path if csv_path is not None else event["name"]
    raw = read_purchases_csv(spark, path)
    typed = anonymize_and_cast(raw)
    _good, bad = split_quarantine(typed)

    # Single-pass happy path: the table write carries an Observation
    # computing both counts while it streams — the source is scanned
    # exactly once and nothing is cached (persisting a full batch is a
    # non-plan at 100 TB batch sizes; observe costs two counters per
    # task). The quarantine pass re-derives the bad slice from the
    # source ONLY when the observation says bad rows exist — the rare
    # path pays the second scan, the clean path never does.
    from pyspark.sql import Observation

    obs = Observation()
    observed = typed.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(_bad_condition().cast("long")).alias("n_bad"),
    )
    good_observed = observed.filter(~_bad_condition()).drop("_corrupt_record")
    if table_path is not None:
        write_designated_ts(good_observed, table_path, "purchase_date")
        metrics = obs.get
    else:
        # No table sink: the count action itself drives the observation.
        n = good_observed.count()
        metrics = obs.get
        assert metrics["n_total"] - (metrics["n_bad"] or 0) == n
    n_bad = int(metrics["n_bad"] or 0)
    n_good = int(metrics["n_total"]) - n_bad
    if quarantine_path is not None and n_bad:
        bad.write.mode("append").json(quarantine_path)
    return BatchResult(rows_loaded=n_good, rows_quarantined=n_bad)
