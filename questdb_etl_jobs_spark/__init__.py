"""questdb_etl_jobs_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the public reference repo ``gabor-boros/questdb-etl-jobs``
(a GCS→transform→QuestDB serverless ETL pipeline plus the time-series SQL
surface of the QuestDB table it loads), extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
and designed for 100 TB scale.

Layout
------
- ``session``    SparkSession builder / configurator (AQE, UTC, parquet-ns shim)
- ``schemas``    explicit StructTypes (validation-not-inference at boundaries)
- ``sources``    CSV/parquet/JDBC/file-stream sources and sinks
- ``pipeline``   the reference-faithful ETL job (validate → anonymize → load)
- ``operators``  as-of join, interval join, latest-on, sample-by, dedup,
                 similarity search, text analysis, multimodal plumbing
- ``functions``  scalar/array helpers (hashing, vector math, text metrics)
- ``plans``      designated-timestamp table conventions + plan inspection
- ``streaming``  Structured Streaming mode of the pipeline (watermarks,
                 stateful dedup, quarantine sink)
- ``queries``    the declared correctness-query registry (SURVEY.md §2.11):
                 every operator is exercised by a named query with a DuckDB
                 oracle used by the driver's differential check

Everything here derives from public knowledge only: the PySpark API and the
reference repo's observable behavior (cited file:line in docstrings).
"""

__version__ = "0.1.0"
