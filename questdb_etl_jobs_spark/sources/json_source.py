"""JSON-lines source/sink with the same fault-isolation stance as the
CSV source: explicit schema (never inference — at 100 TB an inference
pass is a full extra scan), PERMISSIVE parse with a ``_corrupt_record``
side channel so malformed lines quarantine instead of failing the batch
(the distributed version of the reference's per-record try/except,
reference cloud_function.py:91-95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Scan JSON-lines with an enforced schema + corrupt-record column.

    The returned frame has ``schema``'s fields plus ``_corrupt_record``
    (NULL for clean rows, the raw line for rows that failed to parse or
    type-check) — split it exactly like the CSV quarantine path.

    Caveat (Spark ≥2.3): a query that references ONLY the corrupt column
    of a raw JSON scan is disallowed — ``persist()`` the parsed frame
    before counting/inspecting the quarantine branch alone (the batch
    pipeline's persist-around-split does this anyway).
    """
    # fresh StructType: .add() mutates the caller's schema in place
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """JSON-lines sink (one object per line, splittable at scale)."""
    df.write.mode(mode).json(path)
