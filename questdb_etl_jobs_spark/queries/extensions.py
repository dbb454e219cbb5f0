"""Declared queries: reshaping + curation extensions (round 6).

q107 PIVOT            — wide daily matrix of event types (explicit value
                        list: no discovery job, one shuffle — scale-safe).
q108 UNPIVOT          — lineitem measure columns melted to long form
                        (`DataFrame.unpivot`, Spark 4's native melt).
q109 SAMPLE BY ALIGN TO CALENDAR TIME ZONE — QuestDB's tz-aligned daily
                        buckets (README.md:363-366 interactive SQL surface)
                        as `from_utc_timestamp` + `to_date`: wall-clock
                        days in America/New_York, not UTC days.
q110 quality filter chain — FineWeb/C4-style composable document filters
                        with a reason BITMASK per doc; all predicates in
                        integer-exact arithmetic (no float thresholds, so
                        both engines agree bit-for-bit).
q111 per-domain cap   — crawl-style curation: keep at most K docs per
                        source domain by deterministic quality order.
q112 duplicated spans — ExactSubstr-style detection (Lee et al. 2022,
                        "Deduplicating Training Data Makes Language
                        Models Better"): maximal cross-document duplicated
                        token spans ≥ K tokens via gram posting lists +
                        interval-union window merge. No suffix array
                        needed: a span of length L ≥ K duplicates iff all
                        its K-grams duplicate, so gram-level evidence
                        reconstructs span extent and coverage exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.operators.dedup import duplicated_spans
from questdb_etl_jobs_spark.queries import dq
from questdb_etl_jobs_spark.queries._protocol import sum4
from questdb_etl_jobs_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# q107 — PIVOT: daily × event-type wide matrix
# ---------------------------------------------------------------------------
#
# The value list is EXPLICIT (the reference's five event types), so Spark
# skips the values-discovery job a bare .pivot() would run — at 100 TB
# that job is a full extra scan. The plan is a single hash aggregate over
# (day): pivot cells are conditional aggregates, one shuffle total.

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q107_oracle() -> str:
    cells = []
    for t in _EVENT_TYPES:
        cells.append(
            f"COALESCE(COUNT(*) FILTER (WHERE event_type = '{t}'), 0) AS {t}_n"
        )
        cells.append(
            f"COALESCE(ROUND(CAST(SUM(CASE WHEN event_type = '{t}' THEN "
            f"CAST(ROUND(value, 4) AS DECIMAL(28,4)) END) AS DOUBLE), 4), 0.0)"
            f" AS {t}_amt"
        )
    return (
        "SELECT CAST(ts AS DATE) AS day, "
        + ", ".join(cells)
        + " FROM events GROUP BY day ORDER BY day"
    )


#: pure-SQL generator — valid at any scale factor (verify_local sf0.1 pass)
_q107_oracle.sf_invariant = True  # type: ignore[attr-defined]


@dq("q107_pivot_daily_matrix", oracle=_q107_oracle, covers="A1,F5,EXT")
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 4).cast("decimal(28,4)")).alias("amt"),
        )
    )
    out = [F.col("day")]
    for t in _EVENT_TYPES:
        out.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"{t}_n"))
        out.append(
            F.coalesce(
                F.round(F.col(f"{t}_amt").cast("double"), 4), F.lit(0.0)
            ).alias(f"{t}_amt")
        )
    return wide.select(*out).orderBy("day")


# ---------------------------------------------------------------------------
# q108 — UNPIVOT (melt) lineitem measures to long form
# ---------------------------------------------------------------------------
#
# `DataFrame.unpivot` is a Generate (explode) node — zero shuffles until
# the aggregate; the 4× row expansion never materializes row-at-a-time
# Python. Oracle is the portable UNION ALL spelling.

_Q108_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _q108_oracle() -> str:
    arms = " UNION ALL ".join(
        f"SELECT l_returnflag, '{m}' AS measure, {m} AS val FROM lineitem"
        for m in _Q108_MEASURES
    )
    return f"""
    SELECT l_returnflag, measure, COUNT(*) AS n, {sum4("val", "total")}
    FROM ({arms}) GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """


#: pure-SQL generator — valid at any scale factor (verify_local sf0.1 pass)
_q108_oracle.sf_invariant = True  # type: ignore[attr-defined]


@dq("q108_unpivot_measures", oracle=_q108_oracle, covers="T1,A1,EXT")
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=list(_Q108_MEASURES),
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(F.count(F.lit(1)).alias("n"), F.expr(sum4("val", "total")))
        .orderBy("l_returnflag", "measure")
    )


# ---------------------------------------------------------------------------
# q109 — SAMPLE BY 1d ALIGN TO CALENDAR TIME ZONE 'America/New_York'
# ---------------------------------------------------------------------------
#
# QuestDB aligns calendar buckets to a named zone's wall clock (DST-aware
# via the zone database), not fixed UTC offsets. Spark's
# from_utc_timestamp is the same tzdb lookup; date_trunc on the shifted
# wall time yields identical buckets. Pure codegen — the tz conversion is
# a JVM intrinsic, no UDF.

_Q109_TZ = "America/New_York"


@dq(
    "q109_sample_by_calendar_tz",
    oracle=f"""
    SELECT CAST(date_trunc('day',
             (CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
               AT TIME ZONE '{_Q109_TZ}') AS DATE) AS wall_day,
           COUNT(*) AS n,
           {sum4("value", "total")}
    FROM events GROUP BY wall_day ORDER BY wall_day
    """,
    covers="A7,F5,EXT",
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.to_date(F.from_utc_timestamp("ts", _Q109_TZ)).alias("wall_day")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.expr(sum4("value", "total")))
        .orderBy("wall_day")
    )


# ---------------------------------------------------------------------------
# q110 — composable quality-filter chain with reason bitmask
# ---------------------------------------------------------------------------
#
# The FineWeb/C4 pattern: each heuristic contributes one bit to a reason
# mask; keep = mask == 0. Every threshold is integer-rearranged
# (10*chars < 30*n_tok instead of chars/n_tok < 3.0) so no float division
# can disagree across engines. One scan, one aggregate — the per-doc mask
# never shuffles wider than (source, mask counts).
#
#   bit 1 — too short (< 20 tokens)
#   bit 2 — mean word length outside [3, 8]
#   bit 4 — duplicate-token fraction > 0.5 (distinct*2 < total)
#   bit 8 — no stopword present ('a' / 'the')

_Q110_BITS = """
  (CASE WHEN n_tok < 20 THEN 1 ELSE 0 END)
+ (CASE WHEN chars_ns < 3 * n_tok OR chars_ns > 8 * n_tok THEN 2 ELSE 0 END)
+ (CASE WHEN n_distinct * 2 < n_tok THEN 4 ELSE 0 END)
+ (CASE WHEN has_stop THEN 0 ELSE 8 END)
"""


@dq(
    "q110_quality_filter_chain",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(replace(text, ' ', '')) AS BIGINT) AS chars_ns,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct,
             (list_contains(string_split(text, ' '), 'a')
              OR list_contains(string_split(text, ' '), 'the')) AS has_stop
      FROM documents
    ), m AS (
      SELECT source, CAST({_Q110_BITS} AS BIGINT) AS mask,
             n_tok, chars_ns, n_distinct, has_stop
      FROM t
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN mask = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN mask % 2 >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           CAST(SUM(CASE WHEN mask % 4 >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_wordlen,
           CAST(SUM(CASE WHEN mask % 8 >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(SUM(CASE WHEN mask >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_nostop,
           CAST(SUM(mask) AS BIGINT) AS sum_mask
    FROM m GROUP BY source ORDER BY source
    """,
    covers="EXT,P2,F6,A1",
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_tok"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
            "long"
        ).alias("chars_ns"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        (
            F.array_contains(toks, "a") | F.array_contains(toks, "the")
        ).alias("has_stop"),
    )
    m = t.select("source", F.expr(_Q110_BITS).cast("long").alias("mask"))
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("mask") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("mask") % 2 >= 1, 1).otherwise(0))
            .cast("long")
            .alias("n_short"),
            F.sum(F.when(F.col("mask") % 4 >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_wordlen"),
            F.sum(F.when(F.col("mask") % 8 >= 4, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
            F.sum(F.when(F.col("mask") >= 8, 1).otherwise(0))
            .cast("long")
            .alias("n_nostop"),
            F.sum("mask").cast("long").alias("sum_mask"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q111 — per-domain cap (crawl curation: at most K docs per source)
# ---------------------------------------------------------------------------
#
# Deterministic quality order (longest first, doc_id tiebreak) + one
# row_number window per source. At 100 TB the window shuffles once on
# source; a skewed mega-domain is exactly what the cap bounds — the
# window sort is per-partition-key and the K-row result is tiny.

_Q111_K = 10


@dq(
    "q111_domain_cap",
    oracle=f"""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars_kept
    FROM r WHERE rn <= {_Q111_K}
    GROUP BY source ORDER BY source
    """,
    covers="EXT,W1,A1",
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _Q111_K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("long").alias("sum_kept_ids"),
            F.min("n_chars").cast("long").alias("min_chars_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q112 — ExactSubstr-style duplicated token spans (operators/dedup.py)
# ---------------------------------------------------------------------------

_Q112_K = 8


def _q112_oracle() -> str:
    K = _Q112_K
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(toks[i+1:i+{K}], ' ') AS gram
      FROM t, LATERAL UNNEST(range(len(toks)-{K}+1)) AS u(i)
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos,
             LAG(g.pos) OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS prev
      FROM g WHERE g.gram IN (SELECT gram FROM d)
    )
    SELECT doc_id,
           COUNT(*) AS n_dup_pos,
           CAST(SUM(CASE WHEN prev IS NULL OR pos - prev > {K}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
           CAST(SUM(LEAST(COALESCE(pos - prev, {K}), {K})) AS BIGINT)
             AS covered_tokens
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """


#: pure-SQL generator — valid at any scale factor (verify_local sf0.1 pass)
_q112_oracle.sf_invariant = True  # type: ignore[attr-defined]


@dq("q112_duplicated_spans", oracle=_q112_oracle, covers="EXT,F6,W2,A1")
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(
        docs, id_col="doc_id", text_col="text", k=_Q112_K, hash_grams=False
    ).orderBy("doc_id")
