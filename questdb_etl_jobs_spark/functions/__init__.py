"""Scalar/array helper expressions — all JVM-side built-in compositions.

Nothing in this package is a Python UDF: every helper returns a Column
built from ``pyspark.sql.functions``, so the hot path stays inside
whole-stage codegen.
"""

from questdb_etl_jobs_spark.functions.hashing import anonymize_sha1, stable_id
from questdb_etl_jobs_spark.functions.vectors import (
    dot,
    squared_norm,
    norm,
    cosine_similarity,
)
from questdb_etl_jobs_spark.functions.text import (
    whitespace_tokens,
    token_count,
    regex_token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    min_shingle_fingerprint,
)

__all__ = [
    "anonymize_sha1",
    "stable_id",
    "dot",
    "squared_norm",
    "norm",
    "cosine_similarity",
    "whitespace_tokens",
    "token_count",
    "regex_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "min_shingle_fingerprint",
]
