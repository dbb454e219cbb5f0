"""Declared queries: joins and aggregations (SURVEY §2.3/2.4).

Join strategy notes (the 100 TB posture, verified via .explain in tests):
nation/region/supplier are broadcast (under the auto threshold — tiny
dims); lineitem⋈orders shuffles on the order key with AQE free to pick
shuffled-hash vs sort-merge and to split skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.queries import dq
from questdb_etl_jobs_spark.queries._protocol import avg4, sum4
from questdb_etl_jobs_spark.operators.asof import asof_join
from questdb_etl_jobs_spark.operators.interval import interval_join
from questdb_etl_jobs_spark.operators.sample_by import sample_by
from questdb_etl_jobs_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q10 — 3-hop star join + grouped revenue (J1, J2, A1, F7)
# ---------------------------------------------------------------------------

_REVENUE = "l_extendedprice * (1 - l_discount)"


@dq(
    "q10_join_revenue_by_nation",
    oracle=f"""
    SELECT n_name,
           {sum4(_REVENUE, "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    covers="J1,J2,A1,F7",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.expr(sum4(_REVENUE, "revenue")),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q11 — left outer join keeps zero-order customers (J3)
# ---------------------------------------------------------------------------

@dq(
    "q11_left_join_order_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    covers="J3",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q12/q13 — semi and anti joins (J4)
# ---------------------------------------------------------------------------

@dq(
    "q12_semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    covers="J4",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@dq(
    "q13_anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    covers="J4",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who never placed a 400k+ order.

    Every part has lineitems and every customer has orders in the test
    data, so an unfiltered anti join would pass vacuously (0 rows verify
    nothing); the filtered right side guarantees a non-empty result while
    keeping genuine anti-join semantics.
    """
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        customer.join(
            big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q14 — theta self-join (J5)
# ---------------------------------------------------------------------------

@dq(
    "q14_theta_self_join_suppliers",
    oracle="""
    SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,
           ROUND(ABS(a.s_acctbal - b.s_acctbal), 4) AS bal_diff
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey
     AND a.s_suppkey < b.s_suppkey
     AND ABS(a.s_acctbal - b.s_acctbal) < 100
    ORDER BY suppkey_a, suppkey_b
    """,
    covers="J5",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    a = supplier.alias("a")
    b = supplier.alias("b")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey"))
            & (F.abs(F.col("a.s_acctbal") - F.col("b.s_acctbal")) < 100),
        )
        .select(
            F.col("a.s_suppkey").alias("suppkey_a"),
            F.col("b.s_suppkey").alias("suppkey_b"),
            F.round(F.abs(F.col("a.s_acctbal") - F.col("b.s_acctbal")), 4).alias(
                "bal_diff"
            ),
        )
        .orderBy("suppkey_a", "suppkey_b")
    )


# ---------------------------------------------------------------------------
# q15 — interval join via time bucketization (J6)
# ---------------------------------------------------------------------------

@dq(
    "q15_interval_join_events",
    oracle="""
    SELECT p.event_id AS purchase_id, COUNT(e.event_id) AS n_errors_nearby
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND event_id % 50 = 0) p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON ABS(epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(e.ts AS TIMESTAMP)))
         <= 600000000
    GROUP BY p.event_id
    ORDER BY purchase_id
    """,
    covers="J6",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 50 == 0)
    ).select(F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    pairs = interval_join(
        purchases, errors, left_ts="p_ts", right_ts="e_ts", tolerance="10 minutes"
    )
    return (
        pairs.groupBy("purchase_id")
        .agg(F.count("error_id").alias("n_errors_nearby"))
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# q16 — as-of join (J7; DuckDB native ASOF JOIN is the oracle)
# ---------------------------------------------------------------------------

@dq(
    "q16_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
    covers="J7",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(purchases, signups, on="ts", by=["user_id"], how="left")
    return joined.select(
        "event_id", "user_id", "ts", F.col("ts_right").alias("signup_ts")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q105 — ASOF JOIN with TOLERANCE (J7; QuestDB `ASOF JOIN ... TOLERANCE`)
# ---------------------------------------------------------------------------
#
# Same purchase↔signup as-of as q16 but a signup older than 7 days is no
# longer a match. The oracle takes DuckDB's unbounded ASOF match and
# NULLs it past the bound — exact, because the as-of match is the
# *closest* preceding row. Spark side: one predicate after the carry,
# same single-shuffle plan as q16.

@dq(
    "q105_asof_tolerance",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN p.ts - s.ts <= INTERVAL 7 DAY THEN s.ts END
             AS signup_ts
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
    covers="J7",
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts"
    )
    joined = asof_join(
        purchases, signups, on="ts", by=["user_id"], how="left",
        tolerance="7d",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("ts_right").alias("signup_ts")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q20 — pricing summary (TPC-H Q1 shape; A1, F7)
# ---------------------------------------------------------------------------

@dq(
    "q20_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sum4("l_quantity", "sum_qty")},
           {sum4("l_extendedprice", "sum_base_price")},
           {sum4(_REVENUE, "sum_disc_price")},
           {avg4("l_quantity", "avg_qty")},
           {avg4("l_extendedprice", "avg_price")},
           {avg4("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    covers="A1,F7,S3",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(sum4("l_quantity", "sum_qty")),
            F.expr(sum4("l_extendedprice", "sum_base_price")),
            F.expr(sum4(_REVENUE, "sum_disc_price")),
            F.expr(avg4("l_quantity", "avg_qty")),
            F.expr(avg4("l_extendedprice", "avg_price")),
            F.expr(avg4("l_discount", "avg_disc")),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Plain-double bench variants (no decimal canonicalization)
# ---------------------------------------------------------------------------
#
# The sum4/avg4 decimal round-trip exists purely so Spark and DuckDB agree
# on the 4th decimal of large float sums (oracle determinism); it costs ~5×
# on the aggregate-heavy queries. The bench times these plain-double
# variants — the shape a real deployment runs, and the same arithmetic the
# DuckDB baseline used — while the correctness gate keeps the decimal path.

def q20_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.expr(_REVENUE)).alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q10_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Eager-aggregation rewrite: fold lineitem to order grain BEFORE the
    # join, so the fact-fact exchange carries |orders| pre-aggregated
    # rows instead of |lineitem| raw rows (4x fewer at TPC-H shape —
    # measured 3.2s -> 2.4s at sf10). sum-of-sums / sum-of-counts over
    # the order grain is exactly the n_name rollup (every lineitem row
    # joins exactly one order); only double summation ORDER differs,
    # which parallel aggregation never fixes anyway. The canonicalized
    # correctness twin (q10) keeps the direct shape.
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    li = lineitem.groupBy("l_orderkey").agg(
        F.sum(F.expr(_REVENUE)).alias("__rev"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum("__rev").alias("revenue"),
            F.sum("__cnt").alias("n_items"),
        )
        .orderBy("n_name")
    )


def q26_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sample_by(
        events,
        ts="ts",
        bucket="hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value")],
    ).orderBy("bucket_ts")


# ---------------------------------------------------------------------------
# q21 — exact distinct counting (A2)
# ---------------------------------------------------------------------------

@dq(
    "q21_distinct_users_per_type",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    covers="A2",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q22 — rollup (A4)
# ---------------------------------------------------------------------------

@dq(
    "q22_rollup_orders",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, '(all)') AS priority,
           COALESCE(o_orderstatus, '(all)') AS status,
           COUNT(*) AS n,
           {sum4("o_totalprice", "total")}
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    ORDER BY priority, status
    """,
    covers="A4",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
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
# q23 — statistical aggregates (A5)
# ---------------------------------------------------------------------------

@dq(
    "q23_stats_by_type",
    oracle="""
    SELECT event_type,
           ROUND(stddev_samp(value), 4) AS value_stddev,
           ROUND(corr(value, CAST(user_id AS DOUBLE)), 4) AS value_user_corr
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    covers="A5",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 4).alias("value_stddev"),
            F.round(F.corr("value", F.col("user_id").cast("double")), 4).alias(
                "value_user_corr"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q24 — exact percentile / median (A5)
# ---------------------------------------------------------------------------

@dq(
    "q24_median_price_by_status",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    covers="A5",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q25 — order-insensitive agg-to-array (A6)
# ---------------------------------------------------------------------------

@dq(
    "q25_collect_types_per_user",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    covers="A6",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
                "types"
            )
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q26 — SAMPLE BY: calendar-bucket aggregation (A7, F5)
# ---------------------------------------------------------------------------

@dq(
    "q26_hourly_bucket_agg",
    oracle=f"""
    SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket_ts,
           COUNT(*) AS n,
           {avg4("value", "avg_value")}
    FROM events GROUP BY bucket_ts ORDER BY bucket_ts
    """,
    covers="A7,F5,R2",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sample_by(
        events,
        ts="ts",
        bucket="hour",
        aggs=[F.count(F.lit(1)).alias("n"), F.expr(avg4("value", "avg_value"))],
    ).orderBy("bucket_ts")


# ---------------------------------------------------------------------------
# q27 — approximate distinct (A3) — sketch ≠ oracle, rows-only check
# ---------------------------------------------------------------------------

@dq(
    "q27_approx_distinct_users",
    # HLL++ (approx_count_distinct) has no cross-engine value oracle — the
    # estimate is implementation-defined — so the gated row carries the
    # EXACT count plus a within-5% accuracy assertion on the estimate
    # (rsd=0.01 → 5% is 5σ; same pattern as q117/q120). A wrong or wildly
    # drifting sketch flips the boolean and fails the hash-match.
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    covers="A3",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q17 — 6-table regional star join (TPC-H Q5 shape): J1/J2 at full width
# ---------------------------------------------------------------------------
#
# The widest join in the suite: fact (lineitem) against orders plus four
# dimensions, with the classic c_nationkey = s_nationkey "local supplier"
# constraint. Scale shape: nation and region ride as broadcasts (bytes),
# the lineitem⋈orders⋈customer chain shuffles on its keys under AQE,
# date + region filters reach the scans.

@dq(
    "q17_regional_revenue",
    oracle=f"""
    SELECT n_name,
           {sum4(_REVENUE, "revenue")},
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
    covers="J1,J2,A1,F7",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.expr(sum4(_REVENUE, "revenue")), F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q18 — promo revenue share per month (TPC-H Q14 shape): CASE inside agg
# ---------------------------------------------------------------------------

@dq(
    "q18_promo_share",
    oracle=f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           {sum4(f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0.0 END", "promo_revenue")},
           {sum4(_REVENUE, "total_revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part   ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY month
    ORDER BY month
    """,
    covers="J1,A1,F5,F10",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    promo = f"CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE 0.0 END"
    joined = lineitem.join(part, lineitem.l_partkey == part.p_partkey).join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    )
    return (
        joined.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.expr(sum4(promo, "promo_revenue")),
            F.expr(sum4(_REVENUE, "total_revenue")),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# q19 — subquery family: EXISTS + correlated scalar + uncorrelated scalar
# ---------------------------------------------------------------------------
#
# Exercises Catalyst's subquery decorrelation (EXISTS → left-semi,
# correlated scalar COUNT → left-outer aggregate join, uncorrelated
# scalar → one-row broadcast). Scalars are order-independent (MAX,
# COUNT) so both engines agree bit-for-bit — never AVG/SUM of doubles
# in a comparison threshold.

_Q19_SQL = """
SELECT o_orderkey,
       ROUND(o_totalprice, 4) AS totalprice,
       (SELECT COUNT(*) FROM {li} l
        WHERE l.l_orderkey = o.o_orderkey) AS n_items
FROM {od} o
WHERE EXISTS (SELECT 1 FROM {li} l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
  AND o_totalprice > (SELECT MAX(o_totalprice) FROM {od}) / 2
ORDER BY o_orderkey
"""


@dq(
    "q19_subqueries",
    oracle=_Q19_SQL.format(li="lineitem", od="orders"),
    covers="J4,A1,F7",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__q19_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q19_lineitem")
    return spark.sql(_Q19_SQL.format(li="__q19_lineitem", od="__q19_orders"))


# ---------------------------------------------------------------------------
# q28 — pivot: event_type → columns (wide analytics face of A1)
# ---------------------------------------------------------------------------
#
# Explicit value list (the scale-correct form — pivot without values
# triggers a driver-side distinct scan to discover columns). Oracle uses
# conditional aggregation, the engine-portable formulation of the same
# plan. Spark pivot yields NULL for empty cells; coalesced to 0 to match
# COUNT FILTER semantics.

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@dq(
    "q28_pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}"
                      for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    covers="A1,F10",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q29 — unpivot/melt: wide → long (inverse of q28)
# ---------------------------------------------------------------------------

@dq(
    "q29_unpivot_stats",
    oracle="""
    SELECT s_suppkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT s_suppkey, 'acctbal' AS metric, ROUND(s_acctbal, 4) AS val
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE)
      FROM supplier
    )
    ORDER BY s_suppkey, metric
    """,
    covers="T1,U4",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    prepared = supplier.select(
        "s_suppkey",
        F.round("s_acctbal", 4).alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return prepared.unpivot(
        ["s_suppkey"], ["acctbal", "nationkey"], "metric", "val"
    ).orderBy("s_suppkey", "metric")


# ---------------------------------------------------------------------------
# q74 — KMV distinct sketch (A3, VALUE-verified)
# ---------------------------------------------------------------------------
#
# The deterministic counterpart of q27: the k smallest distinct xxhash64
# values are a pure function of the data, so the CPython oracle (via the
# golden-tested XXH64 mirror) reproduces the sketch frontier BIT-EXACTLY
# and the estimate via the identical IEEE expression — approx-distinct
# under the full value gate, not rows-only.

_Q74_K = 32


def _q74_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str:
    import struct

    import duckdb

    from questdb_etl_jobs_spark.queries._xxhash import xxh64_signed

    rows = duckdb.sql(
        f"SELECT event_type, user_id FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_type: dict[str, set[int]] = {}
    for etype, uid in rows:
        by_type.setdefault(etype, set()).add(uid)
    out = []
    for etype in sorted(by_type):
        hashes = sorted(
            xxh64_signed(struct.pack("<q", uid)) for uid in by_type[etype]
        )
        mins = hashes[:_Q74_K]
        kth, n_min = mins[-1], len(mins)
        if n_min < _Q74_K:
            est = float(n_min)
        else:
            est = (_Q74_K - 1) / ((float(kth) + 2.0**63) / 2.0**64)
        out.append(f"('{etype}', {kth}, {n_min}, {est!r})")
    values = ",\n      ".join(out)
    return f"""
    SELECT event_type, CAST(kth_hash AS BIGINT) AS kth_hash,
           CAST(n_min AS INT) AS n_min,
           CAST(est_distinct AS DOUBLE) AS est_distinct
    FROM (VALUES
      {values}
    ) AS t(event_type, kth_hash, n_min, est_distinct)
    ORDER BY event_type
    """


# Cheap XXH64 mirror over the tier's own events: sf-parametric.
_q74_oracle.sf_parametric = True


@dq("q74_kmv_distinct", oracle=_q74_oracle, covers="A3,A2,W1")
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.sketch import kmv_distinct

    events = load_table(spark, sf_dir, "events")
    return kmv_distinct(
        events, keys=["event_type"], value_col="user_id", k=_Q74_K
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q76 — weekly cohort retention (A1+A2+F5+J1 composition)
# ---------------------------------------------------------------------------
#
# cohort = the ISO week of a user's first event; each (cohort, week
# offset) cell counts distinct users still active that week — the
# standard retention matrix. Two shuffles: min-per-user, then the
# (cohort, offset) distinct-count; the user→cohort join hashes on
# user_id. All-integer output (datediff DIV 7), no float protocol.

@dq(
    "q76_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id,
             date_trunc('week', CAST(ts AS TIMESTAMP)) AS act_week
      FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    covers="A1,A2,F5,J1",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    firsts = events.groupBy("user_id").agg(
        F.min(week).alias("cohort_week")
    )
    activity = events.select("user_id", week.alias("act_week")).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr("datediff(act_week, cohort_week) DIV 7").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# q104 — ordered funnel progression (EXT: sessionize/cohort family)
# ---------------------------------------------------------------------------
#
# view → click → purchase, strictly in time order per user (a step-2
# event before the user's first step-1 event does not count). One hash
# shuffle (collect_list per user), Catalyst higher-order fold — see
# operators/funnel.py. The oracle is the equivalent conditional-min
# cascade (t2 = first click >= first view, t3 = first purchase >= t2);
# the fold's equal-ts stage tiebreak matches the cascade's ``>=``.

_FUNNEL_STEPS = ["view", "click", "purchase"]

@dq(
    "q104_funnel_steps",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    v AS (SELECT user_id, MIN(ts) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t2
          GROUP BY e.user_id)
    SELECT stage, step, n_users FROM (
      SELECT 1 AS stage, 'view' AS step,
             (SELECT COUNT(*) FROM v) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT COUNT(*) FROM c)
      UNION ALL
      SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
    ) ORDER BY stage
    """,
    covers="EXT,A1,A6,F8,F10",
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.funnel import funnel_counts

    events = load_table(spark, sf_dir, "events")
    return funnel_counts(events, _FUNNEL_STEPS)


# ---------------------------------------------------------------------------
# q77 — LT JOIN: strictly-before as-of (J7 strict variant)
# ---------------------------------------------------------------------------
#
# QuestDB's LT JOIN is ASOF with a strict inequality (latest right row
# strictly before each left row). Same single-shuffle union+window plan;
# the side tag flips sort order at equal ts so a right row at the exact
# left timestamp is NOT visible. DuckDB's ASOF supports the strict
# comparator natively → direct oracle.

@dq(
    "q77_lt_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase'),
         s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts > s.ts
    ORDER BY p.event_id
    """,
    covers="J7",
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, on="ts", by=["user_id"], how="left", strict=True
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("ts_right").alias("signup_ts")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# q78 — SPLICE JOIN: full-outer as-of (J7 full variant)
# ---------------------------------------------------------------------------
#
# One row per input row from BOTH sides, each carrying the latest
# other-side row at-or-before its timestamp. Engine: one shuffle, two
# sorted window carries (operators/asof.py:splice_join). Oracle: the
# union of the two directional DuckDB ASOF joins — the definition.

@dq(
    "q78_splice_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'purchase' AND event_id % 3 = 0),
         s AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'signup'),
    lface AS (
      SELECT 'L' AS side, p.event_id, p.user_id, p.ts,
             s.event_id AS other_id, s.ts AS other_ts
      FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    ),
    rface AS (
      SELECT 'R' AS side, s.event_id, s.user_id, s.ts,
             p.event_id AS other_id, p.ts AS other_ts
      FROM s ASOF LEFT JOIN p ON s.user_id = p.user_id AND s.ts >= p.ts
    )
    SELECT side, event_id, user_id, ts, other_id, other_ts
    FROM (SELECT * FROM lface UNION ALL SELECT * FROM rface)
    ORDER BY side, event_id
    """,
    covers="J7,T1",
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.asof import splice_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 3 == 0)
    ).select("event_id", "user_id", "ts")
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    spliced = splice_join(
        purchases, signups, on="ts", by=["user_id"], suffix="_right"
    )
    is_l = F.col("side") == "L"
    return spliced.select(
        "side",
        F.when(is_l, F.col("event_id")).otherwise(F.col("event_id_right")).alias("event_id"),
        "user_id",
        F.when(is_l, F.col("ts")).otherwise(F.col("ts_right")).alias("ts"),
        F.when(is_l, F.col("event_id_right")).otherwise(F.col("event_id")).alias("other_id"),
        F.when(is_l, F.col("ts_right")).otherwise(F.col("ts")).alias("other_ts"),
    ).orderBy("side", "event_id")


# ---------------------------------------------------------------------------
# q149 — bucketed-layout star join, exchange-free on the fact tables
# ---------------------------------------------------------------------------
#
# sources/bucketed.py under the driver's oracle: lineitem and orders land
# hash-bucketed on the join key (the pay-the-shuffle-once layout a 100 TB
# deployment uses for recurring fact-fact joins), lineitem folds to order
# grain ON the bucket key (zero-exchange aggregation whose output KEEPS
# the bucket partitioning), the fact-fact join plans with zero exchanges,
# and the dimensions broadcast. Same composed shape the scale
# differential times at sf10 (tools/sf1_differential.py); the revenue
# decimal protocol composes exactly because DECIMAL(28,4) partial sums
# are associative: sum-of-order-sums == direct sum4.

@dq(
    "q149_bucketed_join_revenue",
    oracle=f"""
    SELECT n_name,
           {sum4(_REVENUE, "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    covers="J1,J2,A1,F7,EXT",
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from questdb_etl_jobs_spark.sources.bucketed import write_bucketed

    wh = "/tmp/spark_graft_q149_bucketed"
    shutil.rmtree(wh, ignore_errors=True)
    for tbl in ("q149_li_b", "q149_od_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "q149_li_b", f"{wh}/li", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        "q149_od_b", f"{wh}/od", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    li = (
        spark.table("q149_li_b")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(f"CAST(ROUND({_REVENUE}, 4) AS DECIMAL(28,4))")
            ).alias("__rev_d"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    od = spark.table("q149_od_b")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(customer), od.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(F.sum("__rev_d").cast("double"), 4).alias("revenue"),
            F.sum("__cnt").alias("n_items"),
        )
        .orderBy("n_name")
    )
