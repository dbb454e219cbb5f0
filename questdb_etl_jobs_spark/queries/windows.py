"""Declared queries: window functions and ordered analytics (SURVEY §2.5/2.6).

Covers W1 (ranking), W2 (lag/lead/first/last), W3 (frame specs), W4
(LATEST ON — the QuestDB idiom over designated-timestamp tables, reference
sql/create-table.sql:1, README.md:70-71), O2 (top-k), T2 (set ops) and the
A4 cube variant.

Scale posture: every window partitions on a real key (customer / user) —
one shuffle on the key, state bounded per key; no global windows anywhere.
Top-k is ``orderBy().limit()`` which Catalyst plans as
``TakeOrderedAndProject`` (k rows per partition, no global sort).

Determinism protocol: every window ORDER BY ends in a unique tiebreaker
column, ranks/ntiles are cast to BIGINT to match the DuckDB window output
type, and every float is rounded via the shared 4-decimal protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.queries import dq
from questdb_etl_jobs_spark.queries._protocol import avg4, sum4
from questdb_etl_jobs_spark.operators.latest import latest_on
from questdb_etl_jobs_spark.operators.sample_by import fill_gaps, sample_by
from questdb_etl_jobs_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q30 — ranking family: row_number / rank / dense_rank / ntile (W1, DQ-30)
# ---------------------------------------------------------------------------

@dq(
    "q30_rank_top3_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS totalprice,
           rn, prio_rank, prio_dense, tile
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w_price AS rn,
             RANK() OVER w_prio AS prio_rank,
             DENSE_RANK() OVER w_prio AS prio_dense,
             NTILE(4) OVER w_price AS tile
      FROM orders
      WINDOW w_price AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey),
             w_prio  AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    covers="W1",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan shape, measured (tools/sf1_differential.py, 15M orders at
    # sf10): both window specs share ONE exchange (hash by o_custkey) and
    # pay two in-stage sorts. A "single-sort" rewrite — priority ranks
    # from per-(custkey, priority) counts + arithmetic ntile — was built
    # and benchmarked: only ~7% faster at sf10 (the second sort is cheap
    # once the scan parallelizes) but ~50% SLOWER at sf0.1 (three more
    # stages of fixed cost for the count/join path), so the direct form
    # stays. Per-partition state is bounded by the external sorter either
    # way — no collected arrays, the 100 TB-safe shape.
    orders = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_price).cast("long").alias("rn"),
            F.rank().over(w_prio).cast("long").alias("prio_rank"),
            F.dense_rank().over(w_prio).cast("long").alias("prio_dense"),
            F.ntile(4).over(w_price).cast("long").alias("tile"),
        )
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "rn",
            "prio_rank",
            "prio_dense",
            "tile",
        )
        .orderBy("o_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# q31 — analytic family: lag / lead / first / last (W2, DQ-31)
# ---------------------------------------------------------------------------

@dq(
    "q31_lag_lead_gaps",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER w AS gap_us,
           lead(event_type) OVER w AS next_type,
           ROUND(first_value(value) OVER w, 4) AS first_value,
           ROUND(last_value(value)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING), 4) AS last_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
    """,
    covers="W2",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    us = F.unix_micros("ts")
    return events.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.first("value").over(w), 4).alias("first_value"),
        F.round(F.last("value").over(w_full), 4).alias("last_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q32 — frame specs: moving average + running sum (W3, DQ-32)
# ---------------------------------------------------------------------------

@dq(
    "q32_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_avg7,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS run_sum
    FROM orders
    ORDER BY o_orderkey
    """,
    covers="W3",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_mov = ordered.rowsBetween(-6, 0)
    w_run = ordered.rowsBetween(Window.unboundedPreceding, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("mov_avg7"),
        F.round(F.sum("o_totalprice").over(w_run), 4).alias("run_sum"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# q33 — LATEST ON: latest event per user (W4, DQ-33)
# ---------------------------------------------------------------------------

@dq(
    "q33_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           ROUND(value, 4) AS value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
    covers="W4,W1",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    latest = latest_on(events, ts="ts", key=["user_id"], tiebreak=["event_id"])
    return latest.select(
        "user_id", "event_id", "ts", "event_type",
        F.round("value", 4).alias("value"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q71 — LATEST ON with composite partition key (W4 completion):
#        QuestDB `LATEST ON ts PARTITION BY user_id, event_type`
# ---------------------------------------------------------------------------

@dq(
    "q71_latest_composite_key",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
           ROUND(value, 4) AS value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    covers="W4,W1",
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    latest = latest_on(
        events, ts="ts", key=["user_id", "event_type"], tiebreak=["event_id"]
    )
    return latest.select(
        "user_id", "event_type", "event_id", "ts",
        F.round("value", 4).alias("value"),
    ).orderBy("user_id", "event_type")


# ---------------------------------------------------------------------------
# q34 — top-k by value (O2, DQ-34): TakeOrderedAndProject, no global sort
# ---------------------------------------------------------------------------

@dq(
    "q34_topk_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    covers="O2",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(10)
        .select(
            "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
        )
    )


# ---------------------------------------------------------------------------
# q171 — top-k via the partition-max threshold prune (O2 scale face)
# ---------------------------------------------------------------------------
#
# Same answer as q34 under the same oracle, computed by
# operators/topk.topk_by_threshold: a single-column threshold pass
# certifies a lower bound t for the k-th largest value, then the wide
# decode runs only over ``l_extendedprice >= t`` — pushed to the parquet
# scan, so row groups below t are skipped without decoding. At the sf100
# lineitem tier this is the difference between ~3.6 s (plain bounded-heap
# top-k, scan-bound) and ~1.3 s (below the embedded baseline's full
# Top-N rescan); see SCALE_DIFF.json dq34_topk.sf100_pruned. Exactness
# is structural (the prune only removes rows provably outside the
# answer) and the differential gates it against the identical SQL.

@dq(
    "q171_topk_threshold_prune",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    covers="O2,EXT",
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold

    lineitem = load_table(spark, sf_dir, "lineitem")
    top = topk_by_threshold(
        lineitem, "l_extendedprice", 10,
        tiebreak=["l_orderkey", "l_linenumber"],
    )
    return top.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
    )


# ---------------------------------------------------------------------------
# q172 — per-key top-k via the grouped threshold prune (W1/O2 scale face)
# ---------------------------------------------------------------------------
#
# The per-group analogue of q171: q30's row_number-rank core (top-3
# orders per customer) computed by operators/topk.topk_per_key instead
# of the full window. The plain face shuffles every order on o_custkey
# and sorts entire partitions to keep 3 of each; the pruned face first
# aggregates max(o_totalprice) by (spark_partition_id, o_custkey) —
# partial agg collapses each map task to one row per customer it sees,
# so the exchange carries the group directory, not the data — derives
# each group's certified 3rd-largest-partition-max bound, and runs the
# exact window only over rows at or above it. Bit-identical to the
# window form by construction (the prune removes only rows provably
# outside the answer); the differential gates both against the same SQL.

@dq(
    "q172_topk_per_key_prune",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    covers="W1,O2,EXT",
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    orders = load_table(spark, sf_dir, "orders")
    top = topk_per_key(
        orders, ["o_custkey"], "o_totalprice", 3,
        tiebreak=["o_orderkey"], rank_col="rn",
    )
    return top.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("totalprice"),
        F.col("rn").cast("long").alias("rn"),
    ).orderBy("o_custkey", "rn")


# ---------------------------------------------------------------------------
# q175 — dq30's FULL rank family on the pruned path (W1 scale face)
# ---------------------------------------------------------------------------
#
# q30's complete output — row_number + rank + dense_rank + ntile(4) —
# without ever shuffling the fact table on o_custkey. The plain face
# sorts every order twice inside its window partitions just to emit the
# rn<=3 survivors; this face decomposes the four functions into what
# each actually needs:
#
# - rn: the grouped threshold prune (topk_per_key) — the exchange
#   carries only certified-plausible rows;
# - rank()/dense_rank() over o_orderpriority: exact from the per-
#   (custkey, priority) count table (customers × 5 rows): rank is the
#   cumulative count below the priority +1, dense is its row_number;
# - ntile(4): pure arithmetic from the group size n and rn — ntile
#   gives the first n%4 buckets ceil(n/4) rows, so the bucket of rn is
#   closed-form.
#
# Both stats shuffles carry the group directory (map-side partial
# count), and the survivor join is a broadcast. Bit-identical to q30
# under the same oracle; the differential gates it. This is dq30's
# 100 TB shape: no full-data exchange anywhere in the plan.

@dq(
    "q175_rank_family_pruned",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS totalprice,
           rn, prio_rank, prio_dense, tile
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w_price AS rn,
             RANK() OVER w_prio AS prio_rank,
             DENSE_RANK() OVER w_prio AS prio_dense,
             NTILE(4) OVER w_price AS tile
      FROM orders
      WINDOW w_price AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey),
             w_prio  AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    covers="W1,O2,EXT",
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    orders = load_table(spark, sf_dir, "orders")
    top3 = topk_per_key(
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", "o_orderpriority"
        ),
        ["o_custkey"],
        "o_totalprice",
        3,
        tiebreak=["o_orderkey"],
        rank_col="rn",
    )

    # Per-(custkey, priority) directory: rank/dense_rank inputs and the
    # group size n. groupBy's partial agg collapses map tasks before the
    # exchange; every window below runs over customers × priorities rows.
    w_prio = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    w_all = Window.partitionBy("o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    stats = (
        orders.groupBy("o_custkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "o_custkey",
            "o_orderpriority",
            (F.sum("cnt").over(w_prio) - F.col("cnt") + 1).alias(
                "prio_rank"
            ),
            F.row_number().over(w_prio).alias("prio_dense"),
            F.sum("cnt").over(w_all).alias("n"),
        )
    )

    # Null-safe on the priority: a NULL o_orderpriority forms its own
    # directory row (Spark's ASC window seats nulls first, exactly like
    # q30's w_prio), and eqNullSafe keeps such top-3 rows — a plain
    # equi-join would silently drop them (NULL never equals NULL).
    joined = (
        top3.join(
            F.broadcast(stats),
            (top3["o_custkey"] == stats["o_custkey"])
            & top3["o_orderpriority"].eqNullSafe(stats["o_orderpriority"]),
            "inner",
        )
        .drop(stats["o_custkey"])
        .drop(stats["o_orderpriority"])
    )
    # ntile(4) closed form: the first n%4 buckets get n//4+1 rows. With
    # n < 4 the first branch always holds (rem == n), so the //base
    # division below base == 0 is never evaluated on a kept row.
    base = (F.col("n") / 4).cast("long")
    rem = F.col("n") % 4
    big = rem * (base + 1)
    tile = F.when(
        F.col("rn") <= big,
        ((F.col("rn") + base) / (base + 1)).cast("long"),
    ).otherwise(rem + ((F.col("rn") - big + base - 1) / base).cast("long"))
    return joined.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 4).alias("totalprice"),
        F.col("rn").cast("long").alias("rn"),
        F.col("prio_rank").cast("long").alias("prio_rank"),
        F.col("prio_dense").cast("long").alias("prio_dense"),
        tile.cast("long").alias("tile"),
    ).orderBy("o_custkey", "rn")


# ---------------------------------------------------------------------------
# q183 — dq34's SQL text through the dialect front-end (routed prune)
# ---------------------------------------------------------------------------
#
# Round-12 closing of the q171 loop: q34 is the DataFrame face, q171 the
# library-call face, and this is the QUERY-SURFACE face — the exact SQL
# string a reference-console user types (reference README.md:366 runs
# console SQL verbatim), submitted through questdb_sql. The dialect's
# _TOPK_SHAPE_RE pulls the scan-bound ``ORDER BY col DESC LIMIT k``
# shape off the spark.sql passthrough and plans it via
# operators/topk.topk_by_threshold, so SQL users get the certified
# prune (committed 0.55× DuckDB at the 600M-row tier) instead of the
# plain heap's 2.40× asymptote. Same oracle as q34/q171: all three
# faces are bit-identical by construction and the differential gates it.

_Q183_SQL = (
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM __q183_lineitem "
    "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10"
)


@dq(
    "q183_dialect_topk_routed",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    covers="O2,EXT",
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.sql import questdb_sql

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__q183_lineitem"
    )
    out = questdb_sql(spark, _Q183_SQL)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
    )


# ---------------------------------------------------------------------------
# q184 — bottom-k through the dialect (ASC face of the routed prune)
# ---------------------------------------------------------------------------
#
# The symmetric face of q183: ``ORDER BY <col> ASC LIMIT k`` routes
# through topk_by_threshold(ascending=True) — pass 1 reduces each
# partition to its MIN, the k-th smallest partition minimum certifies
# an upper bound, and the pruned pass keeps ``<= t`` (plus NULLs, which
# Spark's asc seats first; l_extendedprice carries none, and the
# null-bearing cases are unit-tested). Bottom-k is the curation shape
# for "worst documents by quality score" sweeps; this face proves the
# SQL surface plans it pruned too.

_Q184_SQL = (
    "SELECT l_orderkey, l_linenumber, l_extendedprice FROM __q184_lineitem "
    "ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber LIMIT 10"
)


@dq(
    "q184_dialect_bottomk_routed",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 4) AS price
    FROM lineitem
    ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    covers="O2,EXT",
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.sql import questdb_sql

    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__q184_lineitem"
    )
    out = questdb_sql(spark, _Q184_SQL)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
    )


# ---------------------------------------------------------------------------
# q173 — best-k-per-group curation face of topk_per_key (EXT curation)
# ---------------------------------------------------------------------------
#
# The training-data-curation shape the operator exists for: keep the
# best k documents per (lang, source) cell by a quality proxy (n_chars
# here; any scored column works). Multi-key grouping exercises the
# composite-key path of the grouped threshold prune; at corpus scale the
# group directory (langs × sources) is tiny next to the documents table,
# so the prune's threshold join broadcasts and the survivor exchange
# carries ~k rows per (cell × contributing partition).

@dq(
    "q173_best_docs_per_cell",
    oracle="""
    SELECT lang, source, doc_id, n_chars, rn
    FROM (
      SELECT lang, source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    WHERE rn <= 2
    ORDER BY lang, source, rn
    """,
    covers="O2,EXT",
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    docs = load_table(spark, sf_dir, "documents")
    top = topk_per_key(
        docs, ["lang", "source"], "n_chars", 2,
        tiebreak=["doc_id"], rank_col="rn",
    )
    return top.select(
        "lang",
        "source",
        "doc_id",
        "n_chars",
        F.col("rn").cast("long").alias("rn"),
    ).orderBy("lang", "source", "rn")


# ---------------------------------------------------------------------------
# q35 — set operators: UNION distinct / INTERSECT / EXCEPT (T2, DQ-35)
# ---------------------------------------------------------------------------

@dq(
    "q35_set_ops_users",
    oracle="""
    SELECT 'union' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      UNION
      SELECT user_id FROM events WHERE event_type = 'signup'
    )
    UNION ALL
    SELECT 'intersect' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'except' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'click'
    )
    ORDER BY op, user_id
    """,
    covers="T2",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def users(event_type: str) -> DataFrame:
        return events.filter(F.col("event_type") == event_type).select("user_id")

    tagged = (
        users("purchase").union(users("signup")).distinct()
        .select(F.lit("union").alias("op"), "user_id")
        .unionByName(
            users("purchase").intersect(users("error"))
            .select(F.lit("intersect").alias("op"), "user_id")
        )
        .unionByName(
            users("purchase").subtract(users("click"))
            .select(F.lit("except").alias("op"), "user_id")
        )
    )
    return tagged.orderBy("op", "user_id")


# ---------------------------------------------------------------------------
# q36 — cube over (priority, status) (A4 cube variant, DQ-22)
# ---------------------------------------------------------------------------

@dq(
    "q36_cube_orders",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, '(all)') AS priority,
           COALESCE(o_orderstatus, '(all)') AS status,
           COUNT(*) AS n,
           {sum4("o_totalprice", "total")}
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    ORDER BY priority, status
    """,
    covers="A4",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.expr(sum4("o_totalprice", "total")))
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "n",
            "total",
        )
        .orderBy("priority", "status")
    )


# ---------------------------------------------------------------------------
# q37 — GROUPING SETS via SQL text (A4 complete; the reference's
#        interactive-SQL entry point, reference README.md:363-366)
# ---------------------------------------------------------------------------

@dq(
    "q37_grouping_sets_sql",
    oracle="""
    SELECT COALESCE(o_orderpriority, '(all)') AS priority,
           COALESCE(o_orderstatus, '(all)') AS status,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    ORDER BY priority, status
    """,
    covers="A4",
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface: the engine accepts Spark SQL strings over
    registered views, mirroring the reference's interactive console."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__q37_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, '(all)') AS priority,
               COALESCE(o_orderstatus, '(all)') AS status,
               COUNT(*) AS n
        FROM __q37_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY priority, status
        """
    )


# ---------------------------------------------------------------------------
# q38 — gap-based sessionization (W2+W3 composition; QuestDB-style
#        time-series session analysis over the designated timestamp)
# ---------------------------------------------------------------------------
#
# New session when >8h elapses since the user's previous event: lag →
# boundary flag → cumulative sum = session id, then two-level aggregate.
# All-integer output (µs durations, counts) — no cross-engine float
# protocol needed. One shuffle on user_id feeds both window passes;
# the (user, session) group-by partial-aggregates map-side.

_SESSION_GAP_US = 8 * 3600 * 1_000_000


@dq(
    "q38_sessionize",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {_SESSION_GAP_US}
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM t
    ), per AS (
      SELECT user_id, session_id, COUNT(*) AS n_ev,
             MAX(us) - MIN(us) AS dur_us
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(MAX(dur_us) AS BIGINT) AS max_session_us,
           CAST(MAX(n_ev) AS BIGINT) AS max_session_events
    FROM per GROUP BY user_id ORDER BY user_id
    """,
    covers="W2,W3,A1,F5",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    flagged = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0).alias("new_s"),
    )
    sessions = flagged.select(
        "user_id", "us", F.sum("new_s").over(w_cum).alias("session_id")
    )
    per = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").alias("n_events"),
            F.max("dur_us").alias("max_session_us"),
            F.max("n_ev").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q39 — sliding time windows, batch face of R3 (1h window / 30m slide)
# ---------------------------------------------------------------------------
#
# F.window() is the SAME operator batch and streaming — this query runs
# the R3 sliding-window aggregation on the batch engine under the oracle
# gate (the streaming face is exercised in tests/test_streaming.py).
# Each event lands in exactly two windows; DuckDB mirrors by unnesting
# the two window starts per event.

@dq(
    "q39_sliding_window",
    oracle=f"""
    WITH e AS (
      SELECT unnest([
               time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
               time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                 - INTERVAL '30 minutes'
             ]) AS win_start,
             event_type, value
      FROM events
    )
    SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
           COUNT(*) AS n,
           {sum4("value", "sum_value")}
    FROM e GROUP BY win_start, event_type ORDER BY win_start, event_type
    """,
    covers="R3,A7,F5",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.expr(sum4("value", "sum_value")))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "sum_value"
        )
        .orderBy("win_start", "event_type")
    )


# ---------------------------------------------------------------------------
# q63 — native session windows (F.session_window), batch face of R3
# ---------------------------------------------------------------------------
#
# The same 8h-gap semantics as q38 expressed with Spark's built-in
# session_window (usable batch AND streaming). The oracle derives
# sessions with lag + cumulative sum — the portable formulation — and
# reports each session's start timestamp; agreement proves the built-in
# window's gap semantics match the hand-rolled sessionization.

@dq(
    "q63_session_window",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= {_SESSION_GAP_US}
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, tts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY tts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM t
    )
    SELECT user_id,
           CAST(MIN(tts) AS TIMESTAMP) AS session_start,
           COUNT(*) AS n
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start
    """,
    covers="R3,A7",
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "8 hours").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n"
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# q66 — SAMPLE BY … FILL (A7 completion; QuestDB FILL(value/PREV/LINEAR),
#        reference README.md:70-71 time-series surface)
# ---------------------------------------------------------------------------
#
# Hourly per-type aggregate densified over the global [min, max] hour grid:
# counts FILL(0), one avg column FILL(PREV), one FILL(LINEAR). The linear
# interpolation is the identical IEEE expression on both faces
# (v0 + (v1-v0) * (Δt/span) over exact 4-decimal inputs), so raw doubles
# compare bit-exact; leading/trailing gaps stay NULL as in QuestDB.

@dq(
    "q66_sample_by_fill",
    oracle=f"""
    WITH agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
             event_type, COUNT(*) AS n, {avg4("value", "avg_value")}
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM agg
    ), grid AS (
      SELECT g.bucket_ts, k.event_type
      FROM (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour'))
                     AS bucket_ts
            FROM bounds) g
      CROSS JOIN (SELECT DISTINCT event_type FROM agg) k
    ), j AS (
      SELECT g.bucket_ts, g.event_type, a.n, a.avg_value
      FROM grid g LEFT JOIN agg a
        ON a.bucket_ts = g.bucket_ts AND a.event_type = g.event_type
    ), f AS (
      SELECT bucket_ts, event_type, COALESCE(n, 0) AS n, avg_value,
             LAST_VALUE(avg_value IGNORE NULLS) OVER wp AS v0,
             LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN bucket_ts END
                        IGNORE NULLS) OVER wp AS t0,
             FIRST_VALUE(avg_value IGNORE NULLS) OVER wn AS v1,
             FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN bucket_ts END
                         IGNORE NULLS) OVER wn AS t1
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT bucket_ts, event_type, n,
           v0 AS avg_prev,
           COALESCE(avg_value,
                    v0 + (v1 - v0)
                         * (CAST(epoch_us(bucket_ts) - epoch_us(t0) AS DOUBLE)
                            / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE)))
             AS avg_lin
    FROM f ORDER BY bucket_ts, event_type
    """,
    covers="A7,W2,F5",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = sample_by(
        events,
        ts="ts",
        bucket="hour",
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.expr(avg4("value", "avg_value")),
        ],
        keys=["event_type"],
    ).withColumn("avg_prev", F.col("avg_value"))
    filled = fill_gaps(
        agg,
        bucket_col="bucket_ts",
        step="hour",
        keys=["event_type"],
        fill={"n": ("value", 0), "avg_prev": "prev", "avg_value": "linear"},
    )
    return (
        filled.withColumnRenamed("avg_value", "avg_lin")
        .select("bucket_ts", "event_type", "n", "avg_prev", "avg_lin")
        .orderBy("bucket_ts", "event_type")
    )


# ---------------------------------------------------------------------------
# q72 — hourly VWAP (weighted average; QuestDB time-series staple)
# ---------------------------------------------------------------------------
#
# vwap = Σ(value·w)/Σ(w) per (hour, type), weight w extracted from the
# JSON props (F9 composing with A7). Σ(value·w) routes through the exact
# decimal sum protocol; Σ(w) is a BIGINT — the division is one double op
# on two order-independent operands, so the quotient is cross-engine
# deterministic without rounding.

@dq(
    "q72_hourly_vwap",
    oracle=f"""
    WITH a AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
             event_type,
             {sum4("value * CAST(json_extract_string(props, '$.k') AS BIGINT)",
                   "wsum")},
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS BIGINT) AS wtot
      FROM events
      GROUP BY bucket_ts, event_type
    )
    SELECT bucket_ts, event_type, wsum, wtot,
           CASE WHEN wtot <> 0 THEN wsum / CAST(wtot AS DOUBLE) END AS vwap
    FROM a ORDER BY bucket_ts, event_type
    """,
    covers="A7,F9,F7",
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    weighted = events.select("ts", "event_type", "value", k.alias("k"))
    agg = sample_by(
        weighted,
        ts="ts",
        bucket="hour",
        aggs=[
            F.expr(sum4("value * k", "wsum")),
            F.sum("k").alias("wtot"),
        ],
        keys=["event_type"],
    )
    return agg.select(
        "bucket_ts",
        "event_type",
        "wsum",
        "wtot",
        # ANSI-mode zero guard (zero-weight buckets exist in the data).
        F.when(
            F.col("wtot") != 0, F.col("wsum") / F.col("wtot").cast("double")
        ).alias("vwap"),
    ).orderBy("bucket_ts", "event_type")


# ---------------------------------------------------------------------------
# q75 — time-RANGE window frames (W3 completion): trailing 1 hour per user
# ---------------------------------------------------------------------------
#
# RANGE frames are value-based (every peer within the interval joins the
# frame, however many rows that is) — the idiom behind "events in the
# last hour" features; rowsBetween (q32) cannot express it. Ordered on
# integer µs so both engines use the identical numeric range; aggregates
# are count + BIGINT sum + max(double) — all accumulation-order-free, so
# no float protocol is needed.

_HOUR_US = 3_600_000_000


@dq(
    "q75_trailing_hour_range",
    oracle=f"""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                OVER w AS BIGINT) AS sum_k_1h,
           MAX(value) OVER w AS max_v_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    covers="W3,F9",
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_HOUR_US, 0)
    )
    k = F.get_json_object("props", "$.k").cast("long")
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(k).over(w).alias("sum_k_1h"),
        F.max("value").over(w).alias("max_v_1h"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q65 — multiset set ops: INTERSECT ALL / EXCEPT ALL (T2 completion)
# ---------------------------------------------------------------------------
#
# The bag-semantics variants q35's distinct forms don't cover —
# duplicates preserved by multiplicity (Catalyst plans them as
# aggregate+generate, no row-id hacks).

@dq(
    "q65_set_ops_all",
    oracle="""
    SELECT 'intersect_all' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'except_all' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'click'
    )
    ORDER BY op, user_id
    """,
    covers="T2",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def users(event_type: str) -> DataFrame:
        return events.filter(F.col("event_type") == event_type).select("user_id")

    tagged = (
        users("purchase").intersectAll(users("error"))
        .select(F.lit("intersect_all").alias("op"), "user_id")
        .unionByName(
            users("purchase").exceptAll(users("click"))
            .select(F.lit("except_all").alias("op"), "user_id")
        )
    )
    return tagged.orderBy("op", "user_id")


# ---------------------------------------------------------------------------
# q79 — distribution + positional window family (W1/W2/W3 completion)
# ---------------------------------------------------------------------------
#
# percent_rank / cume_dist / nth_value / first_value / last_value — the
# remaining ANSI window functions on the QuestDB analytic surface. One
# shuffle (partition by customer); positional functions use an explicit
# full-partition ROWS frame and a unique total order so both engines see
# the same 2nd/first/last row. percent_rank and cume_dist are derived
# rationals — the oracle routes them through spark_round4 (repr-rounding
# semantics) so an exact .xxxx5 quotient can't split the engines.

@dq(
    "q79_window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(CAST(CAST(pr AS VARCHAR) AS DECIMAL(38,18)), 4)
                AS DOUBLE) AS pct_rank,
           CAST(ROUND(CAST(CAST(cd AS VARCHAR) AS DECIMAL(38,18)), 4)
                AS DOUBLE) AS cume,
           second_key, first_key, last_key
    FROM (
      SELECT o_custkey, o_orderkey,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST()    OVER w AS cd,
             NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
             FIRST_VALUE(o_orderkey)  OVER wf AS first_key,
             LAST_VALUE(o_orderkey)   OVER wf AS last_key
      FROM orders
      WHERE o_custkey % 25 = 0
      WINDOW w  AS (PARTITION BY o_custkey
                    ORDER BY o_totalprice, o_orderkey),
             wf AS (PARTITION BY o_custkey
                    ORDER BY o_totalprice, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
    )
    ORDER BY o_custkey, o_orderkey
    """,
    covers="W1,W2,W3",
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 25 == 0
    )
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
            F.first("o_orderkey").over(wf).alias("first_key"),
            F.last("o_orderkey").over(wf).alias("last_key"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q82 — QuestDB interval search: ts IN '<literal>' (O1/F5 idiom)
# ---------------------------------------------------------------------------
#
# The interval literal expands to one half-open range predicate — pure
# comparison, so it reaches the parquet scan as PushedFilters and prunes
# designated-ts partitions (plan-asserted in tests). Day literal here;
# the helper handles year/month/day/hour/minute prefixes.

@dq(
    "q82_interval_search",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
           event_type,
           COUNT(*) AS n
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
      AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-16 00:00:00'
    GROUP BY hour_ts, event_type
    ORDER BY hour_ts, event_type
    """,
    covers="O1,F5,A7",
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.sample_by import ts_in

    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(ts_in("ts", "2024-01-15"))
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .orderBy("hour_ts", "event_type")
    )


# ---------------------------------------------------------------------------
# q84 — SAMPLE BY ALIGN TO CALENDAR TIME ZONE (A7/F5 tz variant)
# ---------------------------------------------------------------------------
#
# QuestDB's time-zone-aligned calendar bucketing: daily buckets on the
# *local* calendar of a named zone, not UTC. The engine face uses the
# real tz database (from_utc_timestamp); the oracle uses the fixed
# +05:30 offset, which IS Asia/Kolkata for every instant in the data's
# range (the zone has had no transitions since 1945 and no DST ever) —
# so the comparison exercises Spark's tz path against exact arithmetic.

@dq(
    "q84_sample_by_timezone",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)
                + INTERVAL '5 hours 30 minutes') AS TIMESTAMP) AS local_day,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY local_day
    ORDER BY local_day
    """,
    covers="A7,F5,A2",
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    local_day = F.date_trunc(
        "day", F.from_utc_timestamp(F.col("ts"), "Asia/Kolkata")
    )
    return (
        events.groupBy(local_day.alias("local_day"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("local_day")
    )


# ---------------------------------------------------------------------------
# q92 — OHLC candles (SAMPLE BY + first/last ordered aggregates)
# ---------------------------------------------------------------------------
#
# QuestDB's signature candle query: SELECT first(price) open, max high,
# min low, last(price) close ... SAMPLE BY 1h. first/last over the
# designated timestamp become min_by/max_by ordered aggregates — one
# partial+final hash aggregate, no window pass. The oracle uses DuckDB's
# arg_min/arg_max on the same ordering; in-bucket timestamps are unique
# in this data (checked at sf0.1), and the library operator takes an
# explicit tiebreak for data where they are not.

@dq(
    "q92_ohlc_candles",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket_ts,
           ROUND(arg_min(value, ts), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(arg_max(value, ts), 4) AS close,
           COUNT(value) AS n_trades
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY event_type, bucket_ts
    ORDER BY event_type, bucket_ts
    """,
    covers="A7,A1,F5",
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.sample_by import (
        ohlc_aggs,
        sample_by,
    )

    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < "2024-01-03 00:00:00"
    )
    candles = sample_by(
        events,
        ts="ts",
        bucket="hour",
        aggs=ohlc_aggs("value", "ts"),
        keys=["event_type"],
    )
    return candles.select(
        "event_type",
        "bucket_ts",
        F.round("open", 4).alias("open"),
        F.round("high", 4).alias("high"),
        F.round("low", 4).alias("low"),
        F.round("close", 4).alias("close"),
        "n_trades",
    ).orderBy("event_type", "bucket_ts")


# ---------------------------------------------------------------------------
# q106 — time-weighted average (TWAP) per event type (W2+A1+F7)
# ---------------------------------------------------------------------------
#
# Each observation holds until the next one of the same type (step-wise
# price series — the QuestDB/kdb TWAP idiom; reference time-series
# surface per README.md:70-71). Segment durations come from ONE keyed
# window (lead over event_type; unique event_id tiebreak so both engines
# pick identical segments), then a hash agg: exactly one shuffle feeds
# both. Exactness protocol: prices are quantized to 1e-4 (the data's
# print precision) via FLOOR(value*1e4) — floor of a double is IEEE-
# deterministic where ROUND's decimal tie-breaking is not — so the
# weighted sum lives entirely in exact integer µprice·µs domain
# (DECIMAL(38,0) accumulator: a hot key's sum is bounded by
# max_µprice × total-time-range-µs, which can pass 2^63). The double
# outputs derive from identical integers by identical single-rounding
# ops, so no further rounding is needed.

_Q106_WSUM_U = (
    "SUM(CAST(CAST(FLOOR(value * 10000) AS BIGINT) * dur_us "
    "AS DECIMAL(38,0)))"
)


@dq(
    "q106_twap",
    oracle=f"""
    WITH seg AS (
      SELECT event_type, value,
             epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER (
                 PARTITION BY event_type
                 ORDER BY CAST(ts AS TIMESTAMP), event_id))
               - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
      FROM events
    ), a AS (
      SELECT event_type,
             {_Q106_WSUM_U} AS wsum_u,
             CAST(SUM(dur_us) AS BIGINT) AS dur_total_us
      FROM seg WHERE dur_us IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type,
           CAST(wsum_u AS DOUBLE) / 10000.0 / 1000000.0 AS wsum,
           dur_total_us,
           CASE WHEN dur_total_us <> 0
                THEN (CAST(wsum_u AS DOUBLE) / 10000.0)
                     / CAST(dur_total_us AS DOUBLE) END AS twap
    FROM a ORDER BY event_type
    """,
    covers="W2,A1,F7",
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seg = (
        events.select("event_type", "ts", "event_id", "value")
        .withColumn(
            "dur_us",
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"),
        )
        .where(F.col("dur_us").isNotNull())
    )
    agg = seg.groupBy("event_type").agg(
        F.expr(_Q106_WSUM_U).alias("wsum_u"),
        F.sum("dur_us").alias("dur_total_us"),
    )
    return agg.select(
        "event_type",
        (F.col("wsum_u").cast("double") / 10000.0 / 1000000.0).alias("wsum"),
        "dur_total_us",
        F.when(
            F.col("dur_total_us") != 0,
            (F.col("wsum_u").cast("double") / 10000.0)
            / F.col("dur_total_us").cast("double"),
        ).alias("twap"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q181 — recursive-CTE date spine gap fill (Spark 4 WITH RECURSIVE surface)
# ---------------------------------------------------------------------------
#
# The SQL-text face of SAMPLE BY FILL(0)'s grid densify (q66 is the
# operator face): a WITH RECURSIVE spine generates every day between the
# sparse series' observed bounds (UNION ALL recursion on a strictly
# increasing date — the terminating shape Spark 4 supports; UNION
# distinct recursion is not yet available, q.v. the engine's
# UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE error) and a LEFT JOIN fills the
# missing days with zeros. Both faces run structurally the same SQL —
# the oracle is the DuckDB spelling of the identical recursion, so this
# verifies at every sf, not just the Python-pinned gate. The filtered
# series (error events with value > 250) is genuinely gappy at sf0.01
# (17 rows over 14 of 30 days).

_Q181_FILTER = "event_type = 'error' AND value > 250.0"

_Q181_ORACLE = f"""
WITH RECURSIVE f AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE {_Q181_FILTER}
), bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM f
), spine(day) AS (
  SELECT lo FROM bounds WHERE lo IS NOT NULL
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM spine WHERE day < (SELECT hi FROM bounds)
), per_day AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
         {sum4("value", "sum_value")}
  FROM f GROUP BY day
)
SELECT CAST(s.day AS DATE) AS day,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n,
       COALESCE(p.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN per_day p ON s.day = p.day
ORDER BY day
"""


@dq("q181_recursive_date_spine", oracle=_Q181_ORACLE, covers="A7,F5,T1,J3")
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text surface (the q37 precedent): the engine accepts the
    recursive spine as a Spark SQL string over a registered view."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__q181_ev")
    return spark.sql(f"""
    WITH RECURSIVE f AS (
      SELECT ts, value FROM __q181_ev WHERE {_Q181_FILTER}
    ), bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM f
    ), spine(day) AS (
      SELECT lo FROM bounds WHERE lo IS NOT NULL
      UNION ALL
      SELECT date_add(day, 1) FROM spine
      WHERE day < (SELECT hi FROM bounds)
    ), per_day AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             {sum4("value", "sum_value")}
      FROM f GROUP BY day
    )
    SELECT s.day AS day,
           COALESCE(p.n, 0) AS n,
           COALESCE(p.sum_value, 0.0D) AS sum_value
    FROM spine s LEFT JOIN per_day p ON s.day = p.day
    ORDER BY day
    """)
