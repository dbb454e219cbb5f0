"""SparkSession construction and configuration.

Two entry points:

- :func:`get_spark` builds a session with the engine's posture (AQE on,
  UTC timezone, sized shuffle partitions).
- :func:`configure` applies the runtime-settable subset to an *existing*
  session — needed because the verification driver passes us its own
  ``SparkSession``; all confs here are SQL confs that take effect at
  runtime.

Scale posture (100 TB): AQE handles runtime coalescing, skew-join
splitting, and broadcast demotion/promotion; shuffle-partition count is a
starting hint only. Nothing here is local-mode-specific except the
defaults used by tests/bench.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to any session (ours or the driver's).
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp semantics across engines (oracle = DuckDB,
    # which is timezone-naive); the reference's timestamps are naive ISO-8601
    # (reference cloud_function.py:88).
    "spark.sql.session.timeZone": "UTC",
    # The driver's test tables store events.ts as parquet TIMESTAMP(NANOS),
    # which Spark does not map to a Catalyst type; read it as LongType
    # (nanos since epoch) and convert losslessly — the data is µs-precision
    # (verified: max sub-µs component is 0). See sources/tables.py.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet TIMESTAMP(isAdjustedToUTC=false) would otherwise surface as
    # TIMESTAMP_NTZ, which half the timestamp builtins (unix_micros,
    # window, …) reject. With the session pinned to UTC above, reading it
    # as TimestampType is value-identical and keeps one timestamp type
    # throughout the engine and the DuckDB oracle comparison.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Adaptive execution: runtime re-plan (partition coalescing, skew-join
    # handling, SMJ→BHJ conversion) — the 100 TB posture.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Prefer shuffled-hash over sort-merge when one side is much smaller /
    # local-map-sized: skips sorting BOTH sides of every fact-fact equi-join.
    # Measured on this workload: dq10 (lineitem⋈orders at 60M⋈15M) 13.0s →
    # 9.6s, as-of join 0.67s → 0.47s, nothing slower. Caveat at 100 TB:
    # the SHJ build-side HashedRelation is in-memory (NOT spillable), so a
    # skewed build partition that AQE's stats miss can OOM a task; Spark
    # only picks SHJ when one side is below the per-partition threshold,
    # and joins where neither side qualifies still get SMJ.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Arrow for any toPandas()/pandas-UDF boundary (vectorized transfer),
    # and for Python UDTF row exchange (functions/udtfs.py).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
}


#: Sessions already configured — every conf.set is a py4j round trip
#: (~10 of them ≈ 30-80 ms), and load_table calls configure() on every
#: table load, so an un-memoized configure() taxes each query build.
_CONFIGURED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable confs to an existing session
    (idempotent and memoized per session object)."""
    if spark in _CONFIGURED:
        return spark
    _CONFIGURED.add(spark)
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf not recognized/settable in this build — non-fatal.
            pass
    try:
        if spark.conf.get("spark.master", "").startswith("local"):
            # Local benches read MB-scale files; the 128m default (plus
            # the 4m per-file open cost) bins many files into one scan
            # task and the job runs a few-wide on a 32-core box. 16m keeps
            # ~one task per file for the local tiers' 2-10 MB files.
            # Finer (4m) is counterproductive: parquet readers parallelize
            # at ROW-GROUP granularity, so sub-file splits of a
            # single-row-group file only add empty tasks — measured at
            # sf10 (32-file tables): dq10 13.8s @4m vs 3.9s @16m. Cluster
            # deployments keep the 128m default — at real scale inputs
            # are many 100 MB+ files with multiple row groups.
            spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "questdb-etl-jobs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine posture.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and no
    cluster master is configured — tests and bench run single-JVM; a real
    deployment passes its own master/conf via spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    if master is None or master.startswith("local"):
        # Local mode: driver JVM == executor. The 1g default driver heap
        # forces spill on anything past sf0.1; size it to the box — half
        # of physical RAM, capped at 24g (leaves headroom for Python
        # workers / page cache so the JVM is never bigger than the
        # machine). $SPARK_GRAFT_DRIVER_MEM overrides. Only effective for
        # the process's FIRST session — harmless otherwise.
        try:
            phys_gb = (
                os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            ) // (1 << 30)
            default_mem = f"{max(1, min(24, phys_gb // 2))}g"
        except (ValueError, OSError):
            default_mem = "4g"
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", default_mem),
        )
    if shuffle_partitions is None:
        # Local default: match core count so tiny benches don't pay for
        # hundreds of empty reduce tasks; AQE coalesces further at runtime.
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return configure(spark)
