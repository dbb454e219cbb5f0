"""Engine-vs-DuckDB differential at data-proportional scales (sf1, sf10).

BASELINE.md's 2x acceptance bar was measured at sf0.1, where the five
headline DQs cost Spark 0.2-0.8 s of which (per tools/scaling_report.py)
all but ~0.05-0.4 s is FIXED per-query cost — scheduling, AQE stage
materialization, py4j round-trips — that an embedded single-process engine
does not pay and a real cluster amortizes over 1000x more data. That
argument has so far been prose; this tool is the measurement.

Measurement protocol (round-7 redesign; the round-6 artifact's dq25
asymptote of 0.12x against a 5.9x raw ratio was a least-squares fit
through noisy single-pass endpoints — self-contradictory, judged
untrustworthy):

- INTERLEAVED rounds on ONE boot: every (engine, query, tier) cell is
  timed once per round, engines alternating back-to-back, for
  ``ROUNDS`` rounds after a discarded warmup round; the recorded value
  is the per-cell best. Slow-boot drift hits adjacent cells equally
  instead of whole columns.
- CONTROL probes: the sf0.1 DuckDB dq20/dq25 times are recorded against
  BASELINE.md's baseline-day values as ``control.drift_vs_baseline``, so
  the artifact states how fast this boot was relative to the day the 2x
  bar was calibrated.
- SELF-CONSISTENT asymptotes: the marginal per-unit-data cost is the
  two-point slope between the two largest tiers of the SAME best-of
  numbers the raw ratios use — marginal = (t_sf10 − t_sf1) / 90 per
  engine — not an LSQ fit that lets the sf0.1 endpoint drag the slope.
  By construction the reported asymptote and the sf10 raw ratio move
  together.

Row counts are cross-checked per query/scale so the two engines provably
ran the same computation. Synthesized tiers are written as 32
range-partitioned files per fact table (tools/stress_scale.py FILES):
parquet readers — Spark AND DuckDB — parallelize at row-group
granularity, so a single-file synthesis would serialize both engines'
scans and measure file decode, not engine compute.

The largest tier also times a BUCKETED dq10 (lineitem/orders hash-
bucketed on the join key; zero-Exchange join plan) — the layout-aware
shape a 100 TB deployment uses for recurring fact-fact joins — with the
one-time layout cost reported alongside.

Usage: python tools/sf1_differential.py [out.json] [--skip-sf10]
Writes a JSON summary to stdout (and out.json), human table to stderr.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.stress_scale import BASE, OUT, synthesize, synthesize_big  # noqa: E402

OUT100 = "/tmp/spark_graft_sf10"
SF100_LINEITEM = "/tmp/spark_graft_sf100_lineitem"

#: tier tag -> (dir, relative data scale vs sf0.1). ``sf100`` is a
#: lineitem-only tier (tools/stress_scale.synthesize_lineitem_only):
#: only dq20/dq34 — the lineitem-only headliners — are timed there (see
#: :func:`_lineitem_sf100`); the all-query interleaved loop excludes it.
TIERS: dict[str, tuple[str, float]] = {
    "sf0.1": (BASE, 1.0),
    "sf1": (OUT, 10.0),
    "sf10": (OUT100, 100.0),
    "sf100": (SF100_LINEITEM, 1000.0),
    # events-family tiers (query-specific, like sf100): the as-of cell
    # measures both so dq15 carries a two-point marginal fit.
    "sf10_events": ("/tmp/spark_graft_sf10_events", 100.0),
    "sf100_events": ("/tmp/spark_graft_sf100_events", 1000.0),
}

#: tiers the all-query interleaved loop runs (sf100 is query-specific).
FULL_TIERS = ("sf0.1", "sf1", "sf10")

# DuckDB equivalents of the five headline DQs — semantically identical to
# the Spark bench variants (plain double arithmetic, same predicates, same
# output shape; see bench.py _headline and queries/relational.py).
DUCK_SQL = {
    "dq20_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity)                              AS sum_qty,
               sum(l_extendedprice)                         AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount))      AS sum_disc_price,
               avg(l_quantity)                              AS avg_qty,
               avg(l_extendedprice)                         AS avg_price,
               avg(l_discount)                              AS avg_disc,
               count(*)                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "dq10_join_revenue": """
        SELECT n_name,
               sum(l_extendedprice * (1 - l_discount)) AS revenue,
               count(*)                                AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "dq30_window_rank": """
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 4) AS totalprice,
               rn, prio_rank, prio_dense, tile
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   rank()       OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderpriority) AS prio_rank,
                   dense_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderpriority) AS prio_dense,
                   ntile(4)     OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS tile
            FROM orders
        )
        WHERE rn <= 3
        ORDER BY o_custkey, o_orderkey
    """,
    "dq25_hourly_bucket": """
        SELECT date_trunc('hour', ts) AS bucket_ts,
               count(*)   AS n,
               avg(value) AS avg_value
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
    "dq34_topk": """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
}

TABLES = ("lineitem", "orders", "customer", "nation", "events")


def _spark_headline():
    from questdb_etl_jobs_spark.queries import spark_queries
    from questdb_etl_jobs_spark.queries.relational import (
        q10_plain,
        q20_plain,
        q26_plain,
    )

    registry = spark_queries()
    return {
        "dq20_pricing_summary": q20_plain,
        "dq10_join_revenue": q10_plain,
        "dq30_window_rank": registry["q30_rank_top3_orders"],
        "dq25_hourly_bucket": q26_plain,
        "dq34_topk": registry["q34_topk_lineitems"],
    }


#: Recorded measurement rounds (plus one discarded warmup round).
ROUNDS = 3

#: BASELINE.md control-probe values (same machine, baseline day).
CONTROL_BASELINE = {"dq20_pricing_summary": 0.0683, "dq25_hourly_bucket": 0.0203}


def _time_spark(spark, fn, sf_dir: str, runs: int = 1) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(runs):
        t0 = time.perf_counter()
        pdf = fn(spark, sf_dir).toPandas()
        best = min(best, time.perf_counter() - t0)
        rows = len(pdf)
    return best, rows


def _time_duck(con, sql: str, runs: int = 1) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(runs):
        t0 = time.perf_counter()
        out = con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
        rows = len(out)
    return best, rows


def _duck_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()  # defaults, matching BASELINE.md protocol
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        glob = f"{src}/**/*.parquet" if os.path.isdir(src) else src
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    return con


def _bucketed_dq10(spark, sf_dir: str, raw_entry: dict) -> dict:
    """Time dq10 over bucketed lineitem/orders at ``sf_dir``, in two
    shapes:

    - ``join`` — raw-grain join of the bucketed tables (zero-Exchange
      fact-fact join, aggregation after);
    - ``preagg`` — the composed 100 TB form: lineitem folds to order
      grain ON the bucketed layout first (groupBy on the bucket key
      needs NO exchange and its output KEEPS the bucket partitioning),
      then joins bucketed orders exchange-free and broadcasts the
      dimension tables — the q10_plain eager-aggregation rewrite and
      the bucketed layout composed, where round 7 measured each alone.

    Returns {prep_sec, spark_sec, ratio, rows, shapes: {join: {...},
    preagg: {...}}} with spark_sec/ratio from the best shape; both
    aggregates are value-checked against the raw-parquet plan (counts
    exact, revenue within double-summation-order tolerance).
    """
    import shutil

    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.sources.bucketed import write_bucketed
    from questdb_etl_jobs_spark.sources.tables import load_table

    wh = "/tmp/spark_graft_diff_bucketed"
    shutil.rmtree(wh, ignore_errors=True)
    for tbl in ("diff_li_b", "diff_od_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    t0 = time.perf_counter()
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "diff_li_b", f"{wh}/li", ["l_orderkey"], 32,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        "diff_od_b", f"{wh}/od", ["o_orderkey"], 32,
        sort_cols=["o_orderkey"],
    )
    prep = time.perf_counter() - t0

    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")

    def q_join():
        li = spark.table("diff_li_b")
        od = spark.table("diff_od_b")
        joined = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .join(customer, od.o_custkey == customer.c_custkey)
            .join(
                F.broadcast(nation),
                customer.c_nationkey == nation.n_nationkey,
            )
        )
        return (
            joined.groupBy("n_name")
            .agg(
                F.sum(
                    F.expr("l_extendedprice * (1 - l_discount)")
                ).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .orderBy("n_name")
        )

    def q_preagg():
        li = (
            spark.table("diff_li_b")
            .groupBy("l_orderkey")
            .agg(
                F.sum(
                    F.expr("l_extendedprice * (1 - l_discount)")
                ).alias("__rev"),
                F.count(F.lit(1)).alias("__cnt"),
            )
        )
        od = spark.table("diff_od_b")
        joined = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .join(
                F.broadcast(customer),
                od.o_custkey == customer.c_custkey,
            )
            .join(
                F.broadcast(nation),
                customer.c_nationkey == nation.n_nationkey,
            )
        )
        return (
            joined.groupBy("n_name")
            .agg(
                F.sum("__rev").alias("revenue"),
                F.sum("__cnt").alias("n_items"),
            )
            .orderBy("n_name")
        )

    raw = _spark_headline()["dq10_join_revenue"](spark, sf_dir).toPandas()
    duck = raw_entry["duckdb_sec"]
    shapes: dict[str, dict] = {}
    for shape, q in (("join", q_join), ("preagg", q_preagg)):
        best, rows = float("inf"), -1
        pdf = None
        for _ in range(3):
            t0 = time.perf_counter()
            pdf = q().toPandas()
            best = min(best, time.perf_counter() - t0)
            rows = len(pdf)
        # Cross-check vs the raw-parquet plan: counts must match
        # exactly, double sums within summation-order tolerance.
        assert (raw["n_items"].values == pdf["n_items"].values).all(), (
            f"bucketed dq10 ({shape}) count mismatch"
        )
        rel = (
            (raw["revenue"] - pdf["revenue"]).abs() / raw["revenue"].abs()
        ).max()
        assert rel < 1e-9, f"bucketed dq10 ({shape}) revenue drift {rel}"
        shapes[shape] = {
            "spark_sec": round(best, 4),
            "ratio": round(best / duck, 2),
            "rows": rows,
        }
        print(
            f"bucketed dq10 [{shape}]: prep={prep:.1f}s run={best:.3f}s "
            f"ratio-vs-raw-duckdb={best / duck:.2f}",
            file=sys.stderr,
        )
    best_shape = min(shapes, key=lambda s: shapes[s]["spark_sec"])
    return {
        "prep_sec": round(prep, 2),
        "spark_sec": shapes[best_shape]["spark_sec"],
        "ratio": shapes[best_shape]["ratio"],
        "rows": shapes[best_shape]["rows"],
        "best_shape": best_shape,
        "shapes": shapes,
    }


def _matview_dq25(spark, sf_dir: str, raw_entry: dict) -> dict:
    """Time dq25 served from the materialized SAMPLE BY view at
    ``sf_dir`` — layout-as-investment for the recurring hourly-bucket
    dashboard, the exact structure dq10's ``sf10_bucketed`` line records
    for the fact-fact join (round-8 verdict task #2).

    Prep (disclosed): one refresh folds the events history into hourly
    mergeable partials (operators/matview.py). At deployment the view is
    maintained incrementally per micro-batch — refresh cost O(batch +
    touched buckets), never O(history) — so the build here is the
    one-time cost a recurring dashboard amortizes to zero. Serving:
    ``read_sample_by_view`` is a projection over the key-sized store
    (zero exchanges; plan-asserted in tests/test_plans.py), which is WHY
    this shape's scaling is flat: the serving scan is O(buckets), not
    O(rows).

    DuckDB comparison value is its raw-parquet dq25 at the same tier
    (``sf10_bucketed`` convention: DuckDB has no incremental matview;
    single-node it rescans — the line quantifies what the engine's
    maintained-view structure buys for a repeated query). Values are
    cross-checked against the raw plan: counts exact; avg within the
    4-decimal pre-rounding the store's exact-decimal sums apply
    (|Δavg| ≤ 5e-5 by construction).
    """
    import shutil

    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.operators.matview import (
        read_sample_by_view,
        refresh_sample_by_view,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table

    path = "/tmp/spark_graft_diff_matview"
    shutil.rmtree(path, ignore_errors=True)
    events = load_table(spark, sf_dir, "events").select("ts", "value")
    t0 = time.perf_counter()
    refresh_sample_by_view(
        spark, events, path, ts="ts", bucket="hour", value="value", keys=[]
    )
    prep = time.perf_counter() - t0

    def q_view():
        return (
            read_sample_by_view(spark, path)
            .select("bucket_ts", "n", F.col("avg").alias("avg_value"))
            .orderBy("bucket_ts")
        )

    raw = _spark_headline()["dq25_hourly_bucket"](spark, sf_dir).toPandas()
    duck = raw_entry["duckdb_sec"]
    best, rows, pdf = float("inf"), -1, None
    for _ in range(3):
        t0 = time.perf_counter()
        pdf = q_view().toPandas()
        best = min(best, time.perf_counter() - t0)
        rows = len(pdf)
    assert (raw["n"].values == pdf["n"].values).all(), (
        "matview dq25 count mismatch"
    )
    max_d = (raw["avg_value"] - pdf["avg_value"]).abs().max()
    assert max_d <= 5.1e-5, f"matview dq25 avg drift {max_d}"
    print(
        f"matview dq25: prep={prep:.1f}s run={best:.3f}s "
        f"ratio-vs-raw-duckdb={best / duck:.2f}",
        file=sys.stderr,
    )
    return {
        "prep_sec": round(prep, 2),
        "spark_sec": round(best, 4),
        "ratio": round(best / duck, 2),
        "rows": rows,
    }


def _sf100_duck_connection(tables, base=None):
    """Fresh DuckDB connection with views over the sf100 tier's tables
    (directory or single-file parquet both supported)."""
    import duckdb

    con = duckdb.connect()
    for t in tables:
        path = f"{base or SF100_LINEITEM}/{t}.parquet"
        glob = f"{path}/**/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    return con


def _interleaved_sf100_cells(spark, con, pairs, tag="sf100", sf_dir=None):
    """The one-boot interleaved measurement loop every sf100 fast path
    shares: 1 discarded warmup round + ``ROUNDS`` recorded, engines
    back-to-back within a cell, per-round row-count cross-check,
    per-cell best with the full run series kept. ``pairs`` maps
    label -> (spark_fn, duck_sql); returns {label: cell_dict}."""
    cells = {lab: {"spark": [], "duck": [], "rows": -1} for lab in pairs}
    for rnd in range(ROUNDS + 1):
        recorded = rnd > 0
        for lab, (fn, sql) in pairs.items():
            s_sec, s_rows = _time_spark(spark, fn, sf_dir or SF100_LINEITEM)
            d_sec, d_rows = _time_duck(con, sql)
            if s_rows != d_rows:
                raise SystemExit(
                    f"row mismatch {lab}@{tag}: spark={s_rows} duck={d_rows}"
                )
            if recorded:
                cells[lab]["spark"].append(round(s_sec, 4))
                cells[lab]["duck"].append(round(d_sec, 4))
                cells[lab]["rows"] = s_rows
        print(f"# {tag} round {rnd} done", file=sys.stderr)
    out = {}
    for lab, c in cells.items():
        s_sec, d_sec = min(c["spark"]), min(c["duck"])
        out[lab] = {
            "spark_sec": s_sec,
            "duckdb_sec": d_sec,
            "ratio": round(s_sec / d_sec, 2),
            "rows": c["rows"],
            "spark_runs": c["spark"],
            "duckdb_runs": c["duck"],
        }
        print(
            f"{tag}  {lab:22s} spark={s_sec:7.3f}s duckdb={d_sec:7.3f}s "
            f"ratio={s_sec / d_sec:6.2f} rows={c['rows']}",
            file=sys.stderr,
        )
    return out


def _lineitem_sf100(spark, results: dict) -> None:
    """dq20/dq34 at the lineitem-only sf100 tier (1000× sf0.1; 600M
    rows) — the third fit point that settles dq20's marginal.

    The committed two-point [sf1, sf10] fit put dq20's asymptotic ratio
    at 2.09×, but its slope numerators are ~0.3 s against a per-boot
    noise floor of ~0.05-0.1 s per cell. Here the data term is ~4 s
    (Spark) / ~2 s (DuckDB) — 10-20× above noise — and ``_refit``'s
    two-largest-tiers rule makes [sf10, sf100] the committed fit, so
    the settled number is measured in whole seconds on one boot.

    Protocol matches the main loop: interleaved engines, 1 discarded
    warmup round + ``ROUNDS`` recorded rounds, per-cell best, row-count
    cross-check per round. Cells land as ``results[label]["sf100"]``
    with full run series, plus a ``decomp`` block for dq20 that splits
    the Spark and DuckDB times into scan+filter+count (decode one
    column, no agg values) vs the full 6-column aggregation — the
    where-does-the-marginal-go decomposition the round-10 verdict asked
    for if the ratio stays above 2×."""
    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.sources.tables import load_table
    from tools.stress_scale import synthesize_lineitem_only

    t0 = time.perf_counter()
    synthesize_lineitem_only(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 lineitem synthesis: {synth}s", file=sys.stderr)

    con = _sf100_duck_connection(["lineitem"])
    heads = _spark_headline()
    pairs = {
        lab: (heads[lab], DUCK_SQL[lab])
        for lab in ("dq20_pricing_summary", "dq34_topk")
    }
    for lab, cell in _interleaved_sf100_cells(spark, con, pairs).items():
        results[lab]["sf100"] = {**cell, "synth_sec": synth}

    # Decomposition: same filter, count-only (decodes l_shipdate alone,
    # no agg arithmetic) vs the full dq20 — the difference is column
    # decode + hash-agg update cost, the scan term is the count-only
    # time. Best-of-3, interleaved.
    li = load_table(spark, SF100_LINEITEM, "lineitem")
    count_only = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00")
    ).agg(F.count(F.lit(1)).alias("n"))
    duck_count = (
        "SELECT count(*) AS n FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'"
    )
    best_s, best_d = float("inf"), float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        count_only.collect()
        best_s = min(best_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        con.execute(duck_count).fetchall()
        best_d = min(best_d, time.perf_counter() - t0)
    con.close()
    full = results["dq20_pricing_summary"]["sf100"]
    full["decomp"] = {
        "spark_scan_count_sec": round(best_s, 4),
        "duckdb_scan_count_sec": round(best_d, 4),
        "spark_agg_delta_sec": round(full["spark_sec"] - best_s, 4),
        "duckdb_agg_delta_sec": round(full["duckdb_sec"] - best_d, 4),
    }
    print(
        f"sf100  dq20 decomp: scan+count spark={best_s:.3f}s "
        f"duck={best_d:.3f}s (full-agg delta "
        f"spark={full['decomp']['spark_agg_delta_sec']:.3f}s "
        f"duck={full['decomp']['duckdb_agg_delta_sec']:.3f}s)",
        file=sys.stderr,
    )

    # Plan-aware cell, same convention as dq10's bucketed / dq25's
    # matview lines: the raw bounded-heap cell above stays disclosed;
    # this records the engine's DEPLOYED top-k plan — the partition-max
    # threshold prune (operators/topk.py, q171) whose wide decode only
    # touches rows provably able to appear in the answer. Same data,
    # same answer (cross-checked against the raw cell row-for-row).
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold

    def q34_pruned(spark_, sf_dir_):
        li2 = load_table(spark_, sf_dir_, "lineitem")
        return topk_by_threshold(
            li2, "l_extendedprice", 10,
            tiebreak=["l_orderkey", "l_linenumber"],
        ).select(
            "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
        )

    raw_rows = sorted(
        map(tuple, heads["dq34_topk"](spark, SF100_LINEITEM).collect())
    )
    best_p, runs_p = float("inf"), []
    pruned_rows = None
    for _ in range(3):
        t0 = time.perf_counter()
        pruned_rows = q34_pruned(spark, SF100_LINEITEM).collect()
        dt = time.perf_counter() - t0
        best_p = min(best_p, dt)
        runs_p.append(round(dt, 4))
    assert sorted(map(tuple, pruned_rows)) == raw_rows, (
        "threshold-pruned top-k diverged from the plain plan at sf100"
    )
    duck100 = results["dq34_topk"]["sf100"]["duckdb_sec"]
    results["dq34_topk"]["sf100_pruned"] = {
        "spark_sec": round(best_p, 4),
        "ratio": round(best_p / duck100, 2),
        "rows": len(pruned_rows),
        "spark_runs": runs_p,
    }
    print(
        f"sf100  dq34 threshold-pruned: run={best_p:.3f}s "
        f"ratio-vs-raw-duckdb={best_p / duck100:.2f}",
        file=sys.stderr,
    )


def _relational_sf100(spark, results: dict) -> None:
    """dq10/dq30 at the sf100 tier — the same third fit point
    dq20/dq34 got from :func:`_lineitem_sf100`, for the two headliners
    whose committed fits still rest on [sf1, sf10] small-tier slopes.

    ``synthesize_orders_into`` adds a 150M-row ``orders`` to the cached
    lineitem-only tier with the SAME key remapping (mult=1024), so
    dq10's fact-fact equi-join matches replica-to-replica exactly as
    BASE does, while customer/nation stay BASE-sized (broadcastable
    dims — the 100 TB shape). dq10 here is the genuinely hard regime:
    a 600M ⋈ 150M shuffle join against DuckDB's in-memory hash join.
    dq30's per-custkey window partitions deepen 1000× while its rn<=3
    output stays ~3 rows per key — the window sort term dominates.

    Protocol matches :func:`_lineitem_sf100`: interleaved engines, one
    discarded warmup round + ``ROUNDS`` recorded, per-cell best,
    row-count cross-check every round. Cells land as
    ``results[label]["sf100"]`` so ``_refit``'s two-largest-tiers rule
    commits the [sf10, sf100] slope."""
    from tools.stress_scale import (
        synthesize_lineitem_only,
        synthesize_orders_into,
    )

    t0 = time.perf_counter()
    synthesize_lineitem_only(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synthesize_orders_into(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 orders synthesis: {synth}s", file=sys.stderr)

    con = _sf100_duck_connection(["lineitem", "orders", "customer", "nation"])
    heads = _spark_headline()
    pairs = {
        lab: (heads[lab], DUCK_SQL[lab])
        for lab in ("dq10_join_revenue", "dq30_window_rank")
    }
    cells = _interleaved_sf100_cells(
        spark, con, pairs, tag="relational sf100"
    )
    con.close()
    for lab, cell in cells.items():
        results[lab]["sf100"] = {**cell, "synth_sec": synth}


def _dq30_pruned_sf100(spark, results: dict) -> None:
    """dq30's DEPLOYED plan at the sf100 tier — the pruned rank family
    (queries/windows.q175: grouped threshold prune for rn, the
    per-(custkey, priority) count directory for rank/dense_rank,
    closed-form ntile from the group size) — disclosed next to the raw
    window cell exactly as ``dq34_topk.sf100_pruned`` discloses the
    threshold-pruned top-k. The full answer (all four window functions)
    is cross-checked row-for-row against the plain window face on the
    same tier before any timing is recorded, and DuckDB's full-window
    time is re-measured on this boot so the cell's ratio is same-boot
    rather than borrowed from another run."""
    from tools.stress_scale import (
        synthesize_lineitem_only,
        synthesize_orders_into,
    )

    synthesize_lineitem_only(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synthesize_orders_into(spark, SF100_LINEITEM, factor=1000, mult=1024)

    from questdb_etl_jobs_spark.queries import spark_queries

    registry = spark_queries()
    plain_fn = registry["q30_rank_top3_orders"]
    pruned_fn = registry["q175_rank_family_pruned"]

    con = _sf100_duck_connection(["orders"])
    # Value cross-check BEFORE any timing: the pruned face must match
    # the plain window face row-for-row on this tier.
    raw_rows = sorted(map(tuple, plain_fn(spark, SF100_LINEITEM).collect()))
    pruned_rows = sorted(
        map(tuple, pruned_fn(spark, SF100_LINEITEM).collect())
    )
    assert pruned_rows == raw_rows, (
        "pruned rank family diverged from the plain window plan at sf100"
    )
    cells = _interleaved_sf100_cells(
        spark, con,
        {"dq30_pruned": (pruned_fn, DUCK_SQL["dq30_window_rank"])},
        tag="dq30-pruned sf100",
    )
    con.close()
    results["dq30_window_rank"]["sf100_pruned"] = {
        **cells["dq30_pruned"],
        "plain_crosscheck": True,
    }


def _dialect_routed_sf100(spark, results: dict) -> None:
    """dq34 submitted as SQL TEXT through the dialect front-end at the
    sf100 tier — the round-12 routing's own scale cell, disclosed next
    to ``sf100`` (plain heap) and ``sf100_pruned`` (library call). The
    routed face should match the pruned cell modulo the one extra
    bounded threshold job questdb_sql runs at call time (plan-build:
    single-column scan + k-row collect, included in the timing — the
    honest end-to-end cost a SQL user pays). Rows are cross-checked
    against the plain plan before any timing."""
    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.sql.dialect import questdb_sql
    from tools.stress_scale import synthesize_lineitem_only

    t0 = time.perf_counter()
    synthesize_lineitem_only(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 lineitem synthesis: {synth}s", file=sys.stderr)

    def routed(spark_, sf_dir_):
        load_table(spark_, sf_dir_, "lineitem").createOrReplaceTempView(
            "__sf100_lineitem"
        )
        out = questdb_sql(
            spark_,
            "SELECT l_orderkey, l_linenumber, l_extendedprice "
            "FROM __sf100_lineitem "
            "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber "
            "LIMIT 10",
        )
        return out.select(
            "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
        )

    heads = _spark_headline()
    raw_rows = sorted(
        map(tuple, heads["dq34_topk"](spark, SF100_LINEITEM).collect())
    )
    routed_rows = sorted(
        map(tuple, routed(spark, SF100_LINEITEM).collect())
    )
    assert routed_rows == raw_rows, (
        "dialect-routed top-k diverged from the plain plan at sf100"
    )
    con = _sf100_duck_connection(["lineitem"])
    cells = _interleaved_sf100_cells(
        spark, con,
        {"dq34_dialect_routed": (routed, DUCK_SQL["dq34_topk"])},
        tag="dq34-routed sf100",
    )
    con.close()
    results["dq34_topk"]["sf100_dialect_routed"] = {
        **cells["dq34_dialect_routed"],
        "plain_crosscheck": True,
        "synth_sec": synth,
    }


def _bottomk_sf100(spark, results: dict) -> None:
    """The ascending (bottom-k) prune at the sf100 tier — the round-12
    wave-2 face measured where it matters: ``ORDER BY l_extendedprice
    ASC LIMIT 10`` over 600M rows, routed through the dialect (so the
    cell times the SQL-surface cost end to end, call-time partition-MIN
    pass included) vs DuckDB's ASC top-k on the same tier. Rows are
    cross-checked against Spark's plain ascending sort before timing.
    Recorded as ``dq34_topk.sf100_bottomk`` — disclosed next to the
    descending cells; the two faces are symmetric by construction, this
    proves the symmetry holds at scale."""
    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.sql.dialect import questdb_sql
    from tools.stress_scale import synthesize_lineitem_only

    t0 = time.perf_counter()
    synthesize_lineitem_only(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 lineitem synthesis: {synth}s", file=sys.stderr)

    def routed(spark_, sf_dir_):
        load_table(spark_, sf_dir_, "lineitem").createOrReplaceTempView(
            "__sf100b_lineitem"
        )
        out = questdb_sql(
            spark_,
            "SELECT l_orderkey, l_linenumber, l_extendedprice "
            "FROM __sf100b_lineitem "
            "ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber "
            "LIMIT 10",
        )
        return out.select(
            "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
        )

    duck_sql = """
        SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
        FROM lineitem
        ORDER BY l_extendedprice ASC, l_orderkey, l_linenumber
        LIMIT 10
    """
    li = load_table(spark, SF100_LINEITEM, "lineitem")
    plain_rows = sorted(
        map(
            tuple,
            li.orderBy(
                F.asc("l_extendedprice"), F.asc("l_orderkey"),
                F.asc("l_linenumber"),
            )
            .limit(10)
            .select(
                "l_orderkey", "l_linenumber",
                F.round("l_extendedprice", 4).alias("price"),
            )
            .collect(),
        )
    )
    routed_rows = sorted(map(tuple, routed(spark, SF100_LINEITEM).collect()))
    assert routed_rows == plain_rows, (
        "dialect-routed bottom-k diverged from the plain ASC plan at sf100"
    )
    con = _sf100_duck_connection(["lineitem"])
    cells = _interleaved_sf100_cells(
        spark, con,
        {"dq34_bottomk": (routed, duck_sql)},
        tag="bottomk sf100",
    )
    con.close()
    results["dq34_topk"]["sf100_bottomk"] = {
        **cells["dq34_bottomk"],
        "plain_crosscheck": True,
        "synth_sec": synth,
    }


SF100_EVENTS = "/tmp/spark_graft_sf100_events"


def _latest_on_sf100(spark, results: dict) -> None:
    """LATEST ON at the sf100 events tier (100M rows, ~1.5M users).
    THREE Spark faces are measured against the same DuckDB full-window
    query: the DEPLOYED ranking window (whose rn=1 filter plans a
    map-side WindowGroupLimit — the exchange is already directory-
    bounded), the grouped threshold prune, and the max_by whole-row
    aggregate — so the cell records WHY the window stays the deployed
    face at this shape, not just its number. (This round's first
    measurement showed the prune ~2× slower here — with 1.5M keys the
    certified directory IS the answer key set, so broadcasting it back
    is pure overhead — and max_by's struct buffers force
    SortAggregate. Those measurements are what kept the window
    deployed.)

    Both engines consume the LATEST ON output with a 1-row digest
    (count + keyed sums) INSIDE the engine: the answer is ~1.5M rows,
    and a client fetch of 1.5M Python tuples would charge DuckDB's
    fetchall asymmetrically while hiding the operator cost this cell
    exists to measure. Cross-checks before any timing: all three faces
    match bit-for-bit on (user_id, event_id), and the Spark digest
    values equal DuckDB's digest values."""
    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.operators.latest import latest_on
    from questdb_etl_jobs_spark.sources.tables import load_table
    from tools.stress_scale import synthesize_events_only

    t0 = time.perf_counter()
    synthesize_events_only(spark, SF100_EVENTS, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 events synthesis: {synth}s", file=sys.stderr)

    def digest(latest):
        return latest.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("sum_eid"),
            F.sum(F.unix_micros("ts") % F.lit(1_000_000_000)).alias(
                "sum_ts"
            ),
        )

    def face(strategy):
        def fn(spark_, sf_dir_):
            ev = load_table(spark_, sf_dir_, "events")
            return digest(
                latest_on(
                    ev, ts="ts", key=["user_id"], tiebreak=["event_id"],
                    strategy=strategy,
                )
            )

        return fn

    deployed, pruned, maxby = face("window"), face("prune"), face("agg")

    duck_sql = """
    SELECT count(*) AS n, sum(event_id) AS sum_eid,
           sum(epoch_us(ts) % 1000000000) AS sum_ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """

    ev = load_table(spark, SF100_EVENTS, "events")
    rows_by_face = {
        s: sorted(
            map(
                tuple,
                latest_on(ev, "ts", ["user_id"], ["event_id"], strategy=s)
                .select("user_id", "event_id")
                .collect(),
            )
        )
        for s in ("agg", "prune", "window")
    }
    assert rows_by_face["agg"] == rows_by_face["window"], (
        "agg LATEST ON diverged from the plain window face at sf100"
    )
    assert rows_by_face["prune"] == rows_by_face["window"], (
        "pruned LATEST ON diverged from the plain window face at sf100"
    )
    con = _sf100_duck_connection(["events"], base=SF100_EVENTS)
    s_digest = [
        tuple(int(v) for v in r)
        for r in deployed(spark, SF100_EVENTS).collect()
    ]
    d_digest = [
        tuple(int(v) for v in r) for r in con.execute(duck_sql).fetchall()
    ]
    assert s_digest == d_digest, (
        f"LATEST ON digest mismatch: spark={s_digest} duck={d_digest}"
    )
    cells = _interleaved_sf100_cells(
        spark, con,
        {
            "latest_window": (deployed, duck_sql),
            "latest_pruned": (pruned, duck_sql),
            "latest_maxby": (maxby, duck_sql),
        },
        tag="latest-on sf100",
        sf_dir=SF100_EVENTS,
    )
    con.close()
    results.setdefault("dq33_latest_on", {})
    results["dq33_latest_on"]["sf100_events"] = {
        **cells["latest_window"],
        "deployed_face": "window (map-side WindowGroupLimit)",
        "plain_crosscheck": True,
        "digest_value_check": True,
        "keys": len(rows_by_face["agg"]),
        "synth_sec": synth,
    }
    results["dq33_latest_on"]["sf100_events_prune_face"] = {
        **cells["latest_pruned"],
        "synth_sec": synth,
    }
    results["dq33_latest_on"]["sf100_events_maxby_face"] = {
        **cells["latest_maxby"],
        "synth_sec": synth,
    }


def _asof_sf100(spark, results: dict) -> None:
    """The as-of join family's first scale-differential cell (round-14,
    VERDICT r13 item 2: the one flagship operator with no tier
    evidence). Shape: the sf100 events tier (100M left rows, ~1.5M
    users) ASOF-joined to a ~10M-row ``signups`` right side over the
    same user space — each event meets its latest prior signup, ~13% of
    events precede their user's first signup and exercise the left-join
    NULL path. DuckDB's NATIVE ``ASOF LEFT JOIN`` is the oracle — the
    embedded engine's own specialized operator, not a window rewrite.

    TWO Spark faces are measured (the LATEST ON treatment — measure the
    alternatives, keep the winner deployed, state the regime): the
    DEPLOYED union + ordered-window carry (ONE exchange of left∪right
    hash-partitioned by user; PLANS.md's cost model) and the bucketed
    hot-key face (partitions the carry window by (user, day) with a
    per-bucket summary carry — two extra directory-sized shuffles,
    built for keys whose row count exceeds one task, which this tier's
    ~66 rows/user shape does NOT have; its number documents why the
    plain face stays deployed at normal key density).

    The 100M-row join output is consumed INSIDE each engine by a 1-row
    digest (count + matched-count + keyed sums — a client fetch of 100M
    tuples would measure the FFI, not the join). Cross-checks before
    timing: both Spark faces match the digest AND match row-for-row on
    a deterministic ~150-user stratum, where DuckDB's native ASOF rows
    are compared too."""
    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.operators.asof import asof_join
    from questdb_etl_jobs_spark.sources.tables import load_table
    from tools.stress_scale import (
        synthesize_events_only,
        synthesize_signups_into,
    )

    t0 = time.perf_counter()
    synthesize_events_only(spark, SF100_EVENTS, factor=1000, mult=1024)
    synthesize_signups_into(spark, SF100_EVENTS, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 events+signups synthesis: {synth}s", file=sys.stderr)

    def face(bucket):
        def fn(spark_, sf_dir_):
            ev = load_table(spark_, sf_dir_, "events")
            sg = load_table(spark_, sf_dir_, "signups").select(
                "signup_id", "user_id", "ts"
            )
            joined = asof_join(
                ev.select("event_id", "user_id", "ts"),
                sg, on="ts", by=["user_id"], bucket=bucket,
            )
            return joined.agg(
                F.count(F.lit(1)).alias("n"),
                F.count("signup_id").alias("matched"),
                F.sum(F.col("event_id") % F.lit(1_000_003)).alias(
                    "sum_eid"
                ),
                F.sum(
                    F.unix_micros(F.col("ts_right"))
                    % F.lit(1_000_000_000)
                ).alias("sum_sts"),
            )

        return fn

    deployed, bucketed = face(None), face("1 day")

    duck_sql = """
    SELECT count(*) AS n, count(s.signup_id) AS matched,
           sum(e.event_id % 1000003) AS sum_eid,
           sum(epoch_us(s.ts) % 1000000000) AS sum_sts
    FROM events e ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """

    con = _sf100_duck_connection(["events", "signups"], base=SF100_EVENTS)
    s_digest = [
        tuple(int(v) for v in r)
        for r in deployed(spark, SF100_EVENTS).collect()
    ]
    b_digest = [
        tuple(int(v) for v in r)
        for r in bucketed(spark, SF100_EVENTS).collect()
    ]
    d_digest = [
        tuple(int(v) for v in r) for r in con.execute(duck_sql).fetchall()
    ]
    assert s_digest == b_digest == d_digest, (
        f"as-of digest mismatch: plain={s_digest} bucketed={b_digest} "
        f"duck={d_digest}"
    )

    # Row-level crosscheck on a deterministic user stratum (~150 users,
    # ~10k rows): plain face, bucketed face, and DuckDB's native ASOF
    # must agree tuple-for-tuple.
    def stratum_rows(bucket):
        ev = load_table(spark, SF100_EVENTS, "events").filter(
            F.col("user_id") % 9973 == 0
        )
        sg = load_table(spark, SF100_EVENTS, "signups").select(
            "signup_id", "user_id", "ts"
        )
        return sorted(
            map(
                tuple,
                asof_join(
                    ev.select("event_id", "user_id", "ts"),
                    sg, on="ts", by=["user_id"], bucket=bucket,
                )
                .select("user_id", "event_id", "signup_id")
                .collect(),
            )
        )

    duck_stratum = sorted(
        map(
            tuple,
            con.execute(
                """
        SELECT e.user_id, e.event_id, s.signup_id
        FROM events e ASOF LEFT JOIN signups s
          ON e.user_id = s.user_id AND e.ts >= s.ts
        WHERE e.user_id % 9973 = 0
        """
            ).fetchall(),
        )
    )
    plain_stratum = stratum_rows(None)
    assert plain_stratum == stratum_rows("1 day"), (
        "bucketed as-of diverged from the plain face on the stratum"
    )
    assert plain_stratum == duck_stratum, (
        "Spark as-of diverged from DuckDB native ASOF on the stratum"
    )

    cells = _interleaved_sf100_cells(
        spark, con,
        {
            "asof_union_window": (deployed, duck_sql),
            "asof_bucketed": (bucketed, duck_sql),
        },
        tag="asof sf100",
        sf_dir=SF100_EVENTS,
    )
    con.close()
    results.setdefault("dq15_asof", {})
    results["dq15_asof"]["sf100_events"] = {
        **cells["asof_union_window"],
        "deployed_face": "union + ordered-window carry (one exchange)",
        "oracle": "DuckDB native ASOF LEFT JOIN",
        "plain_crosscheck": True,
        "digest_value_check": True,
        "matched_rows": s_digest[0][1],
        "left_rows": s_digest[0][0],
        "synth_sec": synth,
    }
    results["dq15_asof"]["sf100_events_bucketed_face"] = {
        **cells["asof_bucketed"],
        "synth_sec": synth,
    }

    # Second fit point (10M ⋈ 1M, same shape at 1/10th the data) so the
    # [sf10_events → sf100_events] marginal slope is measured where
    # both engines' data terms clear their fixed costs — the same
    # two-largest-tiers protocol the five headliners use.
    sf10_dir = TIERS["sf10_events"][0]
    t0 = time.perf_counter()
    synthesize_events_only(spark, sf10_dir, factor=100, mult=1024)
    synthesize_signups_into(spark, sf10_dir, factor=100, mult=1024)
    synth10 = round(time.perf_counter() - t0, 1)
    print(f"# sf10 events+signups synthesis: {synth10}s", file=sys.stderr)
    con10 = _sf100_duck_connection(["events", "signups"], base=sf10_dir)
    s10 = [
        tuple(int(v) for v in r)
        for r in deployed(spark, sf10_dir).collect()
    ]
    d10 = [
        tuple(int(v) for v in r) for r in con10.execute(duck_sql).fetchall()
    ]
    assert s10 == d10, (
        f"as-of digest mismatch at sf10: spark={s10} duck={d10}"
    )
    cells10 = _interleaved_sf100_cells(
        spark, con10,
        {"asof_union_window": (deployed, duck_sql)},
        tag="asof sf10",
        sf_dir=sf10_dir,
    )
    con10.close()
    results["dq15_asof"]["sf10_events"] = {
        **cells10["asof_union_window"],
        "digest_value_check": True,
        "synth_sec": synth10,
    }
    _refit(results["dq15_asof"])


def _update_tier_cell(spark, tier_key: str, factor: int) -> dict:
    """One UPDATE DML scale cell at an events tier (round-14 second
    wave; the measurement habit applied to the newest mutating operator
    before any routing folklore can form). Called for BOTH event tiers
    by :func:`_update_sf10` so dq198 carries the same two-largest-tiers
    marginal fit as the read-side headliners.

    Shape: the events tier (``factor``×100k rows, ~30 day partitions)
    landed ONCE as a designated-ts table; the measured statement is QuestDB's
    `UPDATE ev SET value = value + 1.0 WHERE ts IN '<one day>'` — the
    fix-one-bad-day idiom. The Spark lowering is partition-scoped
    (plans/designated.update_designated_ts): a narrow pass finds the
    matching date directories, only those read and rewrite under
    dynamic partition overwrite. DuckDB's oracle face is its NATIVE
    row-level UPDATE on a NATIVE table built from the same parquet —
    the embedded engine's real DML, not a SELECT rewrite.

    Timing protocol: 1 discarded warmup + ROUNDS recorded, engines
    back-to-back per round, best-of kept with the series. Each round
    re-applies +1.0 to the same day — both engines drift identically,
    so the post-loop stratum crosscheck (event_id % 9973, exact double
    equality — addition of identical operands is bit-identical) also
    proves every recorded round updated the same rows. A third face is
    measured once for the evidence story: the NAIVE full-table rewrite
    (read every partition, CASE WHEN, overwrite everything) that a
    non-partition-scoped lowering would pay — its cost is the point of
    the deployed design."""
    import datetime as _dtm
    import shutil

    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.plans.designated import (
        PARTITION_SUFFIX,
        list_partitions,
        register_designated_table,
        write_designated_ts,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.sql import questdb_ddl
    from tools.stress_scale import synthesize_events_only

    sf10_dir = TIERS[tier_key][0]
    t0 = time.perf_counter()
    synthesize_events_only(spark, sf10_dir, factor=factor, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# {tier_key} events synthesis: {synth}s", file=sys.stderr)

    tbl = f"{sf10_dir}/upd_table"
    shutil.rmtree(tbl, ignore_errors=True)
    t0 = time.perf_counter()
    ev = load_table(spark, sf10_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    write_designated_ts(ev, tbl, "ts", mode="overwrite")
    build = round(time.perf_counter() - t0, 1)
    print(f"# designated table build: {build}s", file=sys.stderr)
    tables = {"ev": tbl}
    dates = list_partitions(spark, tbl, "ts")
    day = dates[len(dates) // 2]
    nxt = str(_dtm.date.fromisoformat(day) + _dtm.timedelta(days=1))

    # TWO DuckDB faces. The HEADLINE oracle is a DISK-BACKED database
    # with an explicit CHECKPOINT after each UPDATE — the Spark face
    # durably rewrites compressed columnar files, so the comparable
    # embedded-engine cost is update + persist, not an in-memory row-
    # version flip whose durability is deferred. The in-memory flip is
    # still recorded as a labeled secondary face (it is the latency a
    # DuckDB user FEELS transactionally, and the gap between the two
    # numbers IS the persistence cost).
    import duckdb as _duckdb

    dbfile = f"{sf10_dir}/upd_duck.db"
    for leftover in (dbfile, dbfile + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)
    con = _duckdb.connect(dbfile)
    src_glob = f"{sf10_dir}/events.parquet"
    if os.path.isdir(src_glob):
        src_glob = f"{src_glob}/**/*.parquet"
    con.execute(
        "CREATE TABLE ev AS SELECT event_id, user_id, value, ts "
        f"FROM read_parquet('{src_glob}')"
    )
    con.execute("CHECKPOINT")
    con_mem = _duckdb.connect()
    con_mem.execute(
        "CREATE TABLE ev AS SELECT event_id, user_id, value, ts "
        f"FROM read_parquet('{src_glob}')"
    )
    spark_upd = f"UPDATE ev SET value = value + 1.0 WHERE ts IN '{day}'"
    duck_upd = (
        "UPDATE ev SET value = value + 1.0 "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00'"
    )
    s_runs, d_runs, m_runs = [], [], []
    day_rows = -1
    for rnd in range(ROUNDS + 1):
        t0 = time.perf_counter()
        touched = questdb_ddl(spark, spark_upd, tables)
        s_sec = time.perf_counter() - t0
        assert touched == [day], touched
        t0 = time.perf_counter()
        con.execute(duck_upd)
        con.execute("CHECKPOINT")
        d_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        con_mem.execute(duck_upd)
        m_sec = time.perf_counter() - t0
        if rnd > 0:
            s_runs.append(round(s_sec, 4))
            d_runs.append(round(d_sec, 4))
            m_runs.append(round(m_sec, 4))
        print(f"# update {tier_key} round {rnd} done", file=sys.stderr)

    # Crosscheck: after ROUNDS+1 identical updates on both engines, the
    # updated day must agree tuple-for-tuple on the stratum (exact
    # double equality — same parquet doubles, same additions).
    reg = register_designated_table(spark, "ev", tbl)
    s_rows = sorted(
        (int(r.event_id), float(r.value))
        for r in reg.filter(
            (F.col("ts") >= F.lit(f"{day} 00:00:00"))
            & (F.col("ts") < F.lit(f"{nxt} 00:00:00"))
            & (F.col("event_id") % 9973 == 0)
        ).select("event_id", "value").collect()
    )
    d_rows = sorted(
        (int(a), float(b))
        for a, b in con.execute(
            "SELECT event_id, value FROM ev "
            f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
            f"AND ts < TIMESTAMP '{nxt} 00:00:00' "
            "AND event_id % 9973 = 0"
        ).fetchall()
    )
    assert s_rows == d_rows and s_rows, (
        f"update stratum mismatch: {len(s_rows)} vs {len(d_rows)}"
    )
    day_rows = con.execute(
        "SELECT count(*) FROM ev "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00'"
    ).fetchone()[0]
    total_rows = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    con.close()
    con_mem.close()
    for leftover in (dbfile, dbfile + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)

    # The naive face a non-partition-scoped lowering would pay: read
    # EVERY partition, CASE WHEN, rewrite the whole table (to a temp
    # sibling — the live table stays intact). Measured once; it is the
    # cost the deployed design deletes.
    tmp = f"{sf10_dir}/upd_naive_out"
    shutil.rmtree(tmp, ignore_errors=True)
    pcol = "ts" + PARTITION_SUFFIX
    t0 = time.perf_counter()
    full = register_designated_table(spark, "ev", tbl)
    rewritten = full.withColumn(
        "value",
        F.when(
            (F.col("ts") >= F.lit(f"{day} 00:00:00"))
            & (F.col("ts") < F.lit(f"{nxt} 00:00:00")),
            F.col("value") + 1.0,
        ).otherwise(F.col("value")),
    )
    (
        rewritten.sortWithinPartitions(pcol, "ts")
        .write.mode("overwrite")
        .partitionBy(pcol)
        .parquet(tmp)
    )
    naive = round(time.perf_counter() - t0, 3)
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"# naive full-rewrite face: {naive}s", file=sys.stderr)

    s_best, d_best, m_best = min(s_runs), min(d_runs), min(m_runs)
    cell = {
        "spark_sec": s_best,
        "duckdb_sec": d_best,
        "ratio": round(s_best / d_best, 2),
        "rows": int(day_rows),
        "total_rows": int(total_rows),
        "spark_runs": s_runs,
        "duckdb_runs": d_runs,
        "duckdb_inmem_sec": m_best,
        "duckdb_inmem_runs": m_runs,
        "full_rewrite_sec": naive,
        "partition_scoped_speedup_vs_naive": round(naive / s_best, 2),
        "deployed_face": (
            "partition-scoped conditional rewrite (narrow date probe + "
            "dynamic partition overwrite of matched days only)"
        ),
        "oracle": (
            "DuckDB native UPDATE + CHECKPOINT on a disk-backed "
            "database (durable like the Spark face; the in-memory "
            "row-version flip is the secondary duckdb_inmem_sec "
            "face — the gap between them is the persistence cost)"
        ),
        "stratum_crosscheck": True,
        "synth_sec": synth,
        "table_build_sec": build,
    }
    print(
        f"update {tier_key}  partition-scoped spark={s_best:.3f}s "
        f"duckdb(durable)={d_best:.3f}s ratio={s_best / d_best:.2f} "
        f"duckdb(inmem)={m_best:.3f}s naive_rewrite={naive:.3f}s "
        f"day_rows={day_rows}",
        file=sys.stderr,
    )
    return cell


def _update_sf10(spark, results: dict) -> None:
    """Both UPDATE DML tier cells + the two-largest-tiers marginal fit
    (the read-side headliners' protocol): sf10-events (10M rows) and
    sf100-events (100M rows), each stratum-crosschecked before timing,
    each carrying the durable-DuckDB, in-memory-DuckDB, and
    naive-full-rewrite faces beside the deployed partition-scoped
    number."""
    results.setdefault("dq198_update", {})
    results["dq198_update"]["sf10_events"] = _update_tier_cell(
        spark, "sf10_events", 100
    )
    results["dq198_update"]["sf100_events"] = _update_tier_cell(
        spark, "sf100_events", 1000
    )
    _refit(results["dq198_update"])


def _update_mor_tier_cell(spark, tier_key: str, factor: int) -> dict:
    """One SELECTIVE-UPDATE scale cell comparing the two Spark UPDATE
    faces (round-15 VERDICT task #2) against DuckDB's native UPDATE.

    The statement is the merge-on-read lever case: ``UPDATE ev SET
    value = value + 1.0 WHERE <one day> AND user_id % 97 = 7`` — ~1% of
    one day matched, so the COW face's write amplification is
    day-size/matched-size ≈ 97× while the MoR face writes exactly the
    matched rows into a delta sidecar. THREE faces timed interleaved on
    one boot (warmup + ROUNDS, best-of): MoR (update_designated_mor on
    its own table copy), COW (the deployed dialect UPDATE on a second
    copy), DuckDB durable native UPDATE + CHECKPOINT (plus the
    in-memory secondary face). MoR deltas are NOT folded between
    rounds — the per-round series shows the realistic stacking cost
    (round k updates through k-1 pending deltas).

    The trade's other half is measured in the same cell: after the last
    round the merged READ (all pending deltas applied) and the clean
    COW read run the same full-table aggregate back-to-back
    (read_merged_sec vs read_clean_sec — the read tax every query pays
    until VACUUM), and one fold is timed (fold_sec). Crosscheck before
    any verdict: after equal rounds the MoR merged face and the COW
    table agree tuple-for-tuple on an event_id stratum (exact double
    equality — identical per-row operations)."""
    import datetime as _dtm
    import shutil

    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.plans.designated import (
        list_partitions,
        read_designated_merged,
        register_designated_table,
        update_designated_mor,
        write_designated_ts,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.sql import questdb_ddl
    from tools.stress_scale import synthesize_events_only

    sf_dir = TIERS[tier_key][0]
    t0 = time.perf_counter()
    synthesize_events_only(spark, sf_dir, factor=factor, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# {tier_key} events synthesis: {synth}s", file=sys.stderr)

    tbl_mor = f"{sf_dir}/upd_mor_table"
    tbl_cow = f"{sf_dir}/upd_cow_table"
    t0 = time.perf_counter()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    for tbl in (tbl_mor, tbl_cow):
        shutil.rmtree(tbl, ignore_errors=True)
        write_designated_ts(ev, tbl, "ts", mode="overwrite")
    build = round(time.perf_counter() - t0, 1)
    print(f"# designated table builds (×2): {build}s", file=sys.stderr)

    dates = list_partitions(spark, tbl_mor, "ts")
    day = dates[len(dates) // 2]
    nxt = str(_dtm.date.fromisoformat(day) + _dtm.timedelta(days=1))
    mor_where = (
        f"ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00' "
        f"AND ts_pdate >= DATE '{day}' AND ts_pdate <= DATE '{nxt}' "
        "AND user_id % 97 = 7"
    )
    cow_sql = (
        "UPDATE ev SET value = value + 1.0 "
        f"WHERE ts IN '{day}' AND user_id % 97 = 7"
    )
    duck_sql = (
        "UPDATE ev SET value = value + 1.0 "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00' AND user_id % 97 = 7"
    )

    import duckdb as _duckdb

    dbfile = f"{sf_dir}/upd_mor_duck.db"
    for leftover in (dbfile, dbfile + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)
    con = _duckdb.connect(dbfile)
    src_glob = f"{sf_dir}/events.parquet"
    if os.path.isdir(src_glob):
        src_glob = f"{src_glob}/**/*.parquet"
    con.execute(
        "CREATE TABLE ev AS SELECT event_id, user_id, value, ts "
        f"FROM read_parquet('{src_glob}')"
    )
    con.execute("CHECKPOINT")
    con_mem = _duckdb.connect()
    con_mem.execute(
        "CREATE TABLE ev AS SELECT event_id, user_id, value, ts "
        f"FROM read_parquet('{src_glob}')"
    )

    mor_runs, cow_runs, d_runs, m_runs = [], [], [], []
    for rnd in range(ROUNDS + 1):
        t0 = time.perf_counter()
        touched = update_designated_mor(
            spark, tbl_mor, "ts", [("value", "value + 1.0")], mor_where
        )
        mor_sec = time.perf_counter() - t0
        assert touched == [day], touched
        t0 = time.perf_counter()
        touched = questdb_ddl(spark, cow_sql, {"ev": tbl_cow})
        cow_sec = time.perf_counter() - t0
        assert touched == [day], touched
        t0 = time.perf_counter()
        con.execute(duck_sql)
        con.execute("CHECKPOINT")
        d_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        con_mem.execute(duck_sql)
        m_sec = time.perf_counter() - t0
        if rnd > 0:
            mor_runs.append(round(mor_sec, 4))
            cow_runs.append(round(cow_sec, 4))
            d_runs.append(round(d_sec, 4))
            m_runs.append(round(m_sec, 4))
        print(
            f"# update-mor {tier_key} round {rnd} done "
            f"(mor={mor_sec:.2f}s cow={cow_sec:.2f}s duck={d_sec:.2f}s)",
            file=sys.stderr,
        )

    # Crosscheck BEFORE any verdict: MoR merged face vs COW table,
    # tuple-for-tuple on the stratum (same +1.0 applied the same number
    # of times to the same parquet doubles — exact equality), plus the
    # DuckDB face on the same stratum.
    merged = read_designated_merged(spark, tbl_mor, "ts")
    mor_rows = sorted(
        (int(r.event_id), float(r.value))
        for r in merged.filter(
            (F.col("ts") >= F.lit(f"{day} 00:00:00"))
            & (F.col("ts") < F.lit(f"{nxt} 00:00:00"))
            & (F.col("event_id") % 9973 == 0)
        ).select("event_id", "value").collect()
    )
    cow_reg = register_designated_table(spark, "ev_cow", tbl_cow)
    cow_rows = sorted(
        (int(r.event_id), float(r.value))
        for r in cow_reg.filter(
            (F.col("ts") >= F.lit(f"{day} 00:00:00"))
            & (F.col("ts") < F.lit(f"{nxt} 00:00:00"))
            & (F.col("event_id") % 9973 == 0)
        ).select("event_id", "value").collect()
    )
    d_rows = sorted(
        (int(a), float(b))
        for a, b in con.execute(
            "SELECT event_id, value FROM ev "
            f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
            f"AND ts < TIMESTAMP '{nxt} 00:00:00' "
            "AND event_id % 9973 = 0"
        ).fetchall()
    )
    assert mor_rows == cow_rows == d_rows and mor_rows, (
        f"update-mor stratum mismatch: mor={len(mor_rows)} "
        f"cow={len(cow_rows)} duck={len(d_rows)}"
    )
    matched_rows = con.execute(
        "SELECT count(*) FROM ev "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00' AND user_id % 97 = 7"
    ).fetchone()[0]
    day_rows = con.execute(
        "SELECT count(*) FROM ev "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00'"
    ).fetchone()[0]
    total_rows = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    con.close()
    con_mem.close()
    for leftover in (dbfile, dbfile + ".wal"):
        if os.path.exists(leftover):
            os.remove(leftover)

    # Read tax: the same full-table aggregate through the merged face
    # (ROUNDS+1 pending deltas — the realistic pre-fold state) vs the
    # clean COW table, best-of-ROUNDS back-to-back.
    from questdb_etl_jobs_spark.plans.designated import (
        pending_update_seqs,
    )

    n_pending = len(pending_update_seqs(spark, tbl_mor))
    read_merged_best = read_clean_best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        read_designated_merged(spark, tbl_mor, "ts").agg(
            F.count("*"), F.sum("value")
        ).collect()
        read_merged_best = min(
            read_merged_best, time.perf_counter() - t0
        )
        t0 = time.perf_counter()
        cow_reg.agg(F.count("*"), F.sum("value")).collect()
        read_clean_best = min(read_clean_best, time.perf_counter() - t0)

    # One fold, timed: VACUUM folds the deltas and retires the sidecar.
    t0 = time.perf_counter()
    questdb_ddl(spark, "VACUUM TABLE ev", {"ev": tbl_mor})
    fold_sec = round(time.perf_counter() - t0, 3)
    assert pending_update_seqs(spark, tbl_mor) == []

    mor_best, cow_best = min(mor_runs), min(cow_runs)
    d_best, m_best = min(d_runs), min(m_runs)
    cell = {
        "spark_sec": mor_best,
        "duckdb_sec": d_best,
        "ratio": round(mor_best / d_best, 2),
        "spark_cow_sec": cow_best,
        "cow_ratio": round(cow_best / d_best, 2),
        "mor_vs_cow_speedup": round(cow_best / mor_best, 2),
        "matched_rows": int(matched_rows),
        "day_rows": int(day_rows),
        "total_rows": int(total_rows),
        "write_amp_cow_vs_mor": round(day_rows / max(matched_rows, 1), 1),
        "spark_runs": mor_runs,
        "spark_cow_runs": cow_runs,
        "duckdb_runs": d_runs,
        "duckdb_inmem_sec": m_best,
        "duckdb_inmem_runs": m_runs,
        "read_merged_sec": round(read_merged_best, 4),
        "read_clean_sec": round(read_clean_best, 4),
        "read_tax_ratio": round(read_merged_best / read_clean_best, 2),
        "pending_deltas_at_read": n_pending,
        "fold_sec": fold_sec,
        "faces": (
            "spark_sec = merge-on-read delta write (deltas stack across "
            "rounds, series shows the trend); spark_cow_sec = deployed "
            "partition-scoped copy-on-write day rewrite; duckdb_sec = "
            "durable native UPDATE + CHECKPOINT"
        ),
        "stratum_crosscheck": True,
        "synth_sec": synth,
        "table_build_sec": build,
    }
    print(
        f"update-mor {tier_key}  mor={mor_best:.3f}s cow={cow_best:.3f}s "
        f"duckdb(durable)={d_best:.3f}s matched={matched_rows} "
        f"day={day_rows} read_tax={cell['read_tax_ratio']}x "
        f"fold={fold_sec}s",
        file=sys.stderr,
    )
    return cell


def _update_mor_sf10(spark, results: dict) -> None:
    """Both selective-UPDATE tier cells (sf10-events 10M rows,
    sf100-events 100M rows) for the merge-on-read face, with the
    two-largest-tiers marginal fit over the MoR numbers — the COW face
    on the SAME selective statement rides in every cell, so the
    deployment decision (BENCH.md) reads directly from the artifact."""
    results.setdefault("dq198_update_mor", {})
    results["dq198_update_mor"]["sf10_events"] = _update_mor_tier_cell(
        spark, "sf10_events", 100
    )
    results["dq198_update_mor"]["sf100_events"] = _update_mor_tier_cell(
        spark, "sf100_events", 1000
    )
    _refit(results["dq198_update_mor"])


def _interval_sf10(spark, results: dict) -> None:
    """Interval-search pushdown tier cell (round-15 VERDICT task #7):
    ``ts IN '<one day>'`` through the FULL questdb_sql path at
    sf10-events (10M rows, ~30 day partitions) vs DuckDB's equivalent
    range predicate over the same parquet. The dialect's rewrite is
    claimed scan-pushdown by plan tests (q82/q156); this cell times it.

    THREE faces, interleaved warmup + ROUNDS best-of: (a) the dialect
    interval search — expands to the half-open range PLUS the
    ``ts_pdate`` partition-pruning conjunct, so the scan lists ONE day
    directory; (b) the same range predicate WITHOUT the partition
    conjunct — row-group stats still skip data but every file's footer
    is read (the pruning's marginal value, isolated); (c) DuckDB's
    native range scan with its own zonemap skipping. Row-count and
    exact integer-sum crosschecks per round prove all faces computed
    the same answer."""
    import datetime as _dtm
    import shutil

    import duckdb as _duckdb

    from questdb_etl_jobs_spark.plans.designated import (
        list_partitions,
        register_designated_table,
        write_designated_ts,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.sql import questdb_sql
    from tools.stress_scale import synthesize_events_only

    tier_key, factor = "sf10_events", 100
    sf_dir = TIERS[tier_key][0]
    t0 = time.perf_counter()
    synthesize_events_only(spark, sf_dir, factor=factor, mult=1024)
    synth = round(time.perf_counter() - t0, 1)

    tbl = f"{sf_dir}/iv_table"
    shutil.rmtree(tbl, ignore_errors=True)
    t0 = time.perf_counter()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    write_designated_ts(ev, tbl, "ts", mode="overwrite")
    build = round(time.perf_counter() - t0, 1)
    register_designated_table(spark, "iv_ev", tbl)
    dates = list_partitions(spark, tbl, "ts")
    day = dates[len(dates) // 2]
    nxt = str(_dtm.date.fromisoformat(day) + _dtm.timedelta(days=1))

    iv_sql = (
        "SELECT count(*) AS n, sum(user_id) AS su FROM iv_ev "
        f"WHERE ts IN '{day}'"
    )
    range_sql = (
        "SELECT count(*) AS n, sum(user_id) AS su FROM iv_ev "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00'"
    )
    duck_sql = (
        "SELECT count(*) AS n, sum(user_id) AS su FROM ev "
        f"WHERE ts >= TIMESTAMP '{day} 00:00:00' "
        f"AND ts < TIMESTAMP '{nxt} 00:00:00'"
    )
    con = _duckdb.connect()
    src_glob = f"{sf_dir}/events.parquet"
    if os.path.isdir(src_glob):
        src_glob = f"{src_glob}/**/*.parquet"
    con.execute(
        f"CREATE VIEW ev AS SELECT * FROM read_parquet('{src_glob}')"
    )
    con.execute("SELECT count(*) FROM ev").fetchall()  # warm

    iv_runs, rg_runs, d_runs = [], [], []
    answer = None
    for rnd in range(ROUNDS + 1):
        t0 = time.perf_counter()
        iv = questdb_sql(spark, iv_sql, {"iv_ev": "ts"}).collect()
        iv_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        rg = questdb_sql(spark, range_sql, {"iv_ev": "ts"}).collect()
        rg_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        dk = con.execute(duck_sql).fetchall()
        d_sec = time.perf_counter() - t0
        got = (int(iv[0].n), int(iv[0].su))
        assert got == (int(rg[0].n), int(rg[0].su))
        assert got == (int(dk[0][0]), int(dk[0][1]))
        answer = got
        if rnd > 0:
            iv_runs.append(round(iv_sec, 4))
            rg_runs.append(round(rg_sec, 4))
            d_runs.append(round(d_sec, 4))
        print(
            f"# interval {tier_key} round {rnd} done "
            f"(interval={iv_sec:.3f}s range-nopcol={rg_sec:.3f}s "
            f"duck={d_sec:.3f}s)",
            file=sys.stderr,
        )
    con.close()
    iv_best, rg_best, d_best = min(iv_runs), min(rg_runs), min(d_runs)
    cell = {
        "spark_sec": iv_best,
        "duckdb_sec": d_best,
        "ratio": round(iv_best / d_best, 2),
        "spark_nopcol_sec": rg_best,
        "pruning_speedup_vs_nopcol": round(rg_best / iv_best, 2),
        "rows": int(answer[0]),
        "sum_crosscheck": True,
        "day": day,
        "n_partitions": len(dates),
        "faces": (
            "spark_sec = dialect `ts IN '<day>'` (range + ts_pdate "
            "partition pruning, one directory listed); "
            "spark_nopcol_sec = same range without the partition "
            "conjunct (row-group stats only); duckdb_sec = native "
            "range scan with zonemap skipping"
        ),
        "synth_sec": synth,
        "table_build_sec": build,
    }
    print(
        f"interval {tier_key}  interval={iv_best:.3f}s "
        f"nopcol={rg_best:.3f}s duckdb={d_best:.3f}s "
        f"rows={answer[0]}",
        file=sys.stderr,
    )
    results.setdefault("dq82_interval_search", {})
    results["dq82_interval_search"][tier_key] = cell


def _stream_topk_sf10(
    spark,
    results: dict,
    tier_key: str = "sf10_events",
    factor: int = 100,
    chunks_n: int = 10,
) -> None:
    """First STREAMING tier cell (round-15 VERDICT task #3): the
    per-key top-k leaderboard (q176's operator,
    streaming/topk_stream.topk_per_key_stream) replayed over a
    10×-volume arrival sequence cut from the sf10-events tier — real
    scale evidence for the bounded-state contract that so far rested on
    unit tests of the state size. Round 16 re-runs the same cell at the
    sf100-events tier (``tier_key="sf100_events"``, factor=1000 — 10×
    the rows AND ~10× the keys, so the state store is an order of
    magnitude hotter) to pin the trigger-latency trend.

    Shape: the tier's replay stratum (user_id % 7 = 0, ~10% of keys —
    the same stratum every streaming replay gate uses) in global
    (ts, event_id) order, cut into CHUNKS files replayed
    one-per-trigger. Recorded per batch, from the engine's own
    StreamingQuery progress: input rows, trigger latency, and the state
    store's row count. Bounded-state evidence: state rows equal the
    distinct keys seen so far at EVERY batch (one applyInPandasWithState
    row per key, each holding exactly k (id, value) pairs + 2 counters
    — topk_stream.py's stated contract), so state is O(keys × k) and
    independent of stream volume: the final batch absorbs the same
    state footprint as the first. Correctness at the tier: the final
    emission per key must match a CPython top-k recomputation over the
    whole stratum VALUE-exactly (the q176 oracle protocol, run at this
    tier's volume)."""
    import math
    import shutil
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from questdb_etl_jobs_spark.streaming.topk_stream import (
        topk_per_key_stream,
    )
    from tools.stress_scale import synthesize_events_only

    k = 3
    sf_dir = TIERS[tier_key][0]
    t0 = time.perf_counter()
    synthesize_events_only(spark, sf_dir, factor=factor, mult=1024)
    synth = round(time.perf_counter() - t0, 1)

    src_glob = f"{sf_dir}/events.parquet"
    if os.path.isdir(src_glob):
        src_glob = f"{src_glob}/**/*.parquet"
    tbl = duckdb.sql(
        "SELECT user_id, event_id, ts, value "
        f"FROM read_parquet('{src_glob}') "
        "WHERE user_id % 7 = 0 ORDER BY ts, event_id"
    ).arrow()
    n_rows = tbl.num_rows
    print(f"# stream-topk stratum: {n_rows} rows", file=sys.stderr)

    work = tempfile.mkdtemp(prefix=f"stream_topk_{tier_key}_")
    try:
        src = f"{work}/src"
        os.makedirs(src)
        per = max(1, math.ceil(n_rows / chunks_n))
        for i in range(chunks_n):
            chunk = tbl.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            dst = f"{src}/chunk_{i:03d}.parquet"
            pq.write_table(chunk, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(
                "user_id bigint, event_id bigint, ts timestamp, "
                "value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = (
            topk_per_key_stream(stream, "user_id", "value", "event_id", k)
            .writeStream.format("parquet")
            .option("path", f"{work}/out")
            .option("checkpointLocation", f"{work}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        wall = round(time.perf_counter() - t0, 2)
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        batches = [
            {
                "input_rows": int(p["numInputRows"]),
                "trigger_ms": int(p["durationMs"]["triggerExecution"]),
                "state_rows": int(p["stateOperators"][0]["numRowsTotal"]),
            }
            for p in progress
        ]

        # Bounded-state evidence + tier-volume oracle, both from the
        # same stratum table the stream consumed.
        by_key: dict[int, list[tuple[float, int]]] = {}
        counts: dict[int, int] = {}
        for uid, eid, val in zip(
            tbl["user_id"].to_pylist(),
            tbl["event_id"].to_pylist(),
            tbl["value"].to_pylist(),
        ):
            if val is not None:
                by_key.setdefault(uid, []).append((float(val), eid))
            counts[uid] = counts.get(uid, 0) + 1
        n_keys = len(counts)
        assert batches, "no recorded streaming progress"
        assert all(b["state_rows"] <= n_keys for b in batches), batches
        assert batches[-1]["state_rows"] == n_keys, (
            batches[-1], n_keys,
        )
        assert all(
            a["state_rows"] <= b["state_rows"]
            for a, b in zip(batches, batches[1:])
        ), "state rows must grow with keys seen, never with volume"

        expect: dict[int, list[tuple[int, int, float, int]]] = {}
        for uid, vals in by_key.items():
            best = sorted(vals, key=lambda t: t[1])
            best.sort(key=lambda t: t[0], reverse=True)
            expect[uid] = [
                (rn, eid, val, counts[uid])
                for rn, (val, eid) in enumerate(best[:k], 1)
            ]
        out = spark.read.parquet(f"{work}/out").collect()
        best_n: dict[int, int] = {}
        for r in out:
            best_n[r.user_id] = max(best_n.get(r.user_id, 0), r.n_seen)
        got: dict[int, list[tuple[int, int, float, int]]] = {}
        for r in out:
            if r.n_seen == best_n[r.user_id] and r.value is not None:
                got.setdefault(r.user_id, []).append(
                    (r.rn, r.event_id, float(r.value), r.n_seen)
                )
        for uid in got:
            got[uid].sort()
        assert got == expect, (
            f"final leaderboard mismatch: {len(got)} vs {len(expect)} keys"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    cell = {
        "spark_sec": wall,
        "rows": int(n_rows),
        "rows_per_sec": int(n_rows / wall),
        "batches": batches,
        "distinct_keys": n_keys,
        "k": k,
        "state_rows_final": batches[-1]["state_rows"],
        "state_bound": (
            "state rows == distinct keys seen at every batch (one "
            "applyInPandasWithState row per key, each exactly k "
            "(id, value) pairs + 2 counters) — O(keys × k), volume-"
            "independent; asserted per batch before this cell recorded"
        ),
        "oracle": (
            "CPython exact top-k over the full tier stratum, final "
            "emission per key compared VALUE-exactly (q176 protocol "
            "at 10× volume) — asserted before this cell recorded"
        ),
        "oracle_crosscheck": True,
        "synth_sec": synth,
    }
    print(
        f"stream-topk {tier_key}  wall={wall}s rows={n_rows} "
        f"keys={n_keys} batches={len(batches)} "
        f"max_trigger_ms={max(b['trigger_ms'] for b in batches)}",
        file=sys.stderr,
    )
    results.setdefault("dq176_stream_topk", {})
    results["dq176_stream_topk"][tier_key] = cell


def _stream_admit_sf10(
    spark,
    results: dict,
    factor: int = 1,
    tier_key: str = "sf01_docs_composite",
    chunks_n: int = 10,
) -> None:
    """Second streaming tier cell (round 15): the LSH near-dup
    ADMISSION GATE (q167's operator, streaming/dedup_stream.py) over a
    composite corpus ~20× the q167 fixture — the state-growth story the
    per-key top-k cell cannot show: this operator's state is the
    admitted INDEX (one row per novel document), so state grows with
    novel content, never with duplicate volume, and the per-batch cost
    driver is the index scan (latency trend across batches IS the
    evidence).

    Corpus: the sf0.1 documents (5,000) plus three deterministic
    variant families — exact copies (ids +100000, every even base),
    small-suffix variants (+200000, every 5th base), word-reversed
    variants (+300000, every 3rd base) — arriving in (base, rank)
    order cut into 10 file-arrival batches, so every variant arrives
    with or after its base. Ground truth: ALL ≥0.8-Jaccard pairs are
    enumerated with the batch LSH + exact integer verification (the
    oracle-paired q47 machinery), asserted same-base-only, and a
    CPython mirror of the gate's DOCUMENTED semantics (within-batch
    connected-component min-id winner, cross-batch first-admitted-wins)
    replays those pairs over the same batch boundaries — the admitted
    set must match exactly. Recorded: per-batch trigger latency and
    input rows, admitted/rejected counts, final index size (== admitted
    docs — the state bound)."""
    import math
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.operators.dedup import (
        lsh_candidate_pairs,
        signature_and_shingles,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table
    from questdb_etl_jobs_spark.streaming.dedup_stream import (
        maintain_dedup_corpus,
    )

    base_docs = load_table(spark, BASE, "documents").select(
        "doc_id", "text"
    )
    if factor > 1:
        # Third tier cell (round 17): scale the NOVEL base ~factor× so
        # the admitted INDEX — this operator's state — is ~factor×
        # larger, pinning the index-scan latency trend at depth.
        # Replica k suffixes EVERY word with the replica index: every
        # 3-word shingle rewrites, so replicas are novel CONTENT with
        # Jaccard 0 against their base. (A first attempt ROTATED the
        # word sequence — but rotation preserves all contiguous
        # shingles except at the seam, so replicas were near-dups and
        # the index grew only 1.9×; the suffix transform is the one
        # that actually multiplies state.) Residual collisions are
        # handled by the mirror either way — it replays the MEASURED
        # pair graph rather than assuming one. Replica ids live k·1M
        # up, keeping the +100k/+200k/+300k variant offsets
        # collision-free.
        reps = [base_docs]
        for k in range(1, factor):
            w = F.split(F.col("text"), " ")
            suffixed = F.concat_ws(
                " ",
                F.transform(
                    w, lambda x, _k=k: F.concat(x, F.lit(f"_{_k}"))
                ),
            )
            reps.append(
                base_docs.select(
                    (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
                    suffixed.alias("text"),
                )
            )
        from functools import reduce

        base_docs = reduce(
            lambda a, b: a.unionByName(b), reps
        ).localCheckpoint()
    corpus = base_docs
    corpus = corpus.unionByName(
        base_docs.filter(F.col("doc_id") % 2 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    corpus = corpus.unionByName(
        base_docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz yy xx ww")).alias("text"),
        )
    )
    corpus = corpus.unionByName(
        base_docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            F.concat_ws(
                " ", F.reverse(F.split(F.col("text"), " "))
            ).alias("text"),
        )
    )
    ordered = corpus.withColumn(
        "__base", F.col("doc_id") % 100000
    ).orderBy("__base", "doc_id").drop("__base")
    rows = ordered.collect()
    n_docs = len(rows)
    print(f"# stream-admit corpus: {n_docs} docs", file=sys.stderr)

    # Ground truth: every >=0.8 pair in the corpus via the batch LSH +
    # exact integer Jaccard (q47's oracle-paired machinery). Must be
    # same-base-only, or the construction-based model is invalid.
    fused = signature_and_shingles(
        ordered, "doc_id", "text", 32, 3
    ).localCheckpoint()
    cands = lsh_candidate_pairs(
        fused.select("doc_id", "signature"), "doc_id", 16
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size(F.array_union("__sh_a", "__sh_b"))
    pairs = [
        (int(r.doc_id_a), int(r.doc_id_b))
        for r in cands.join(
            fused.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("__sh").alias("__sh_a"),
            ),
            "doc_id_a",
        )
        .join(
            fused.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("__sh").alias("__sh_b"),
            ),
            "doc_id_b",
        )
        .filter(5 * inter >= 4 * union)
        .select("doc_id_a", "doc_id_b")
        .collect()
    ]
    # The base corpus has GENUINE near-dups of its own (short synthetic
    # docs over a small vocabulary collide) — the mirror below handles
    # any pair graph, so cross-base pairs are recorded, not assumed
    # away. The one assumption is COMPLETENESS of the pair list, which
    # holds by construction: the gate and this ground-truth pass band
    # the same deterministic signatures with the same banding operator,
    # so a pair collides here iff it collides there.
    n_cross_base = sum(
        1 for a, b in pairs if a % 100000 != b % 100000
    )
    print(
        f"# stream-admit ground truth: {len(pairs)} pairs "
        f"({n_cross_base} cross-base)",
        file=sys.stderr,
    )

    # CPython mirror of the gate's documented semantics over the SAME
    # batch boundaries.
    order_ids = [int(r.doc_id) for r in rows]
    per = max(1, math.ceil(n_docs / chunks_n))
    batches_ids = [
        order_ids[i * per:(i + 1) * per] for i in range(chunks_n)
    ]
    nbr: dict[int, set[int]] = {}
    for a, b in pairs:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    admitted_model: set[int] = set()
    for chunk in batches_ids:
        if not chunk:
            continue
        in_chunk = set(chunk)
        # Within-batch connected components over the pair edges -> the
        # min-id winner survives per component.
        parent = {d: d for d in chunk}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            if a in in_chunk and b in in_chunk:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comp_min: dict[int, int] = {}
        for d in chunk:
            r = find(d)
            comp_min[r] = min(comp_min.get(r, d), d)
        survivors = [d for d in chunk if comp_min[find(d)] == d]
        # Cross-batch: first-admitted-wins against the admitted index.
        for d in survivors:
            if not (nbr.get(d, set()) & admitted_model):
                admitted_model.add(d)

    # Replay through the streaming gate.
    work = tempfile.mkdtemp(prefix=f"stream_admit_{tier_key}_")
    try:
        src = f"{work}/src"
        os.makedirs(src)
        for i, chunk in enumerate(batches_ids):
            if not chunk:
                continue
            lo = i * per
            tblc = pa.table(
                {
                    "doc_id": pa.array(
                        [int(r.doc_id) for r in rows[lo:lo + per]],
                        pa.int64(),
                    ),
                    "text": pa.array(
                        [r.text for r in rows[lo:lo + per]], pa.string()
                    ),
                }
            )
            dst = f"{src}/chunk_{i:03d}.parquet"
            pq.write_table(tblc, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = maintain_dedup_corpus(
            stream,
            corpus_path=f"{work}/corpus",
            index_path=f"{work}/index",
            checkpoint_path=f"{work}/ckpt",
        )
        q.awaitTermination(1800 if factor == 1 else 5400)
        wall = round(time.perf_counter() - t0, 2)
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
        batch_stats = [
            {
                "input_rows": int(p["numInputRows"]),
                "trigger_ms": int(p["durationMs"]["triggerExecution"]),
            }
            for p in progress
        ]
        admitted_got = {
            int(r.doc_id)
            for r in spark.read.parquet(f"{work}/corpus")
            .select("doc_id")
            .collect()
        }
        index_rows = spark.read.parquet(f"{work}/index").count()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    assert admitted_got == admitted_model, (
        f"admission mismatch: got {len(admitted_got)}, model "
        f"{len(admitted_model)}; e.g. "
        f"{sorted(admitted_got ^ admitted_model)[:5]}"
    )
    assert index_rows == len(admitted_got)

    cell = {
        "spark_sec": wall,
        "rows": n_docs,
        "admitted": len(admitted_got),
        "rejected": n_docs - len(admitted_got),
        "index_rows_final": index_rows,
        "near_dup_pairs": len(pairs),
        "cross_base_pairs": n_cross_base,
        "batches": batch_stats,
        "state_bound": (
            "state = the admitted index, one row per NOVEL document "
            "(index_rows_final == admitted) — grows with novel content, "
            "never with duplicate volume; per-batch trigger latency "
            "trend shows the index-scan cost driver"
        ),
        "oracle": (
            "CPython mirror of the documented gate semantics "
            "(within-batch component min-id winner, cross-batch "
            "first-admitted-wins) over LSH+exact-verified ground-truth "
            "pairs, same batch boundaries; admitted set compared as a "
            "SET, asserted before this cell recorded"
        ),
        "oracle_crosscheck": True,
    }
    print(
        f"stream-admit  wall={wall}s docs={n_docs} "
        f"admitted={len(admitted_got)} rejected={cell['rejected']} "
        f"pairs={len(pairs)}",
        file=sys.stderr,
    )
    results.setdefault("dq167_stream_admit", {})
    results["dq167_stream_admit"][tier_key] = cell


def _grouped_topk_sf100(spark, results: dict) -> None:
    """The grouped threshold prune's per-key top-k (q172's shape:
    best-3 orders per custkey) at the sf100 orders tier (150M rows,
    ~10k orders per customer) — round-12 VERDICT asked for a second
    sf100 cell for the prune FAMILY beyond the rank-family face, so
    the group-directory-shuffle claim carries a measured number at
    depth. Cross-checked row-for-row against the plain window face on
    the same tier before timing; DuckDB runs the registry's own q172
    oracle SQL over the tier's orders."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import questdb_etl_jobs_spark.queries as q
    from questdb_etl_jobs_spark.queries import spark_queries
    from questdb_etl_jobs_spark.sources.tables import load_table
    from tools.stress_scale import (
        synthesize_lineitem_only,
        synthesize_orders_into,
    )

    t0 = time.perf_counter()
    synthesize_lineitem_only(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synthesize_orders_into(spark, SF100_LINEITEM, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)
    print(f"# sf100 orders synthesis: {synth}s", file=sys.stderr)

    pruned_fn = spark_queries()["q172_topk_per_key_prune"]
    duck_sql = q.REGISTRY["q172_topk_per_key_prune"].oracle
    assert isinstance(duck_sql, str)

    def plain_fn(spark_, sf_dir_):
        orders = load_table(spark_, sf_dir_, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        return (
            orders.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select(
                "o_custkey",
                "o_orderkey",
                F.round("o_totalprice", 4).alias("totalprice"),
                F.col("rn").cast("long").alias("rn"),
            )
            .orderBy("o_custkey", "rn")
        )

    raw_rows = sorted(
        map(tuple, plain_fn(spark, SF100_LINEITEM).collect())
    )
    pruned_rows = sorted(
        map(tuple, pruned_fn(spark, SF100_LINEITEM).collect())
    )
    assert pruned_rows == raw_rows, (
        "grouped top-k prune diverged from the plain window at sf100"
    )
    con = _sf100_duck_connection(["orders"])
    cells = _interleaved_sf100_cells(
        spark, con,
        {"grouped_topk": (pruned_fn, duck_sql)},
        tag="grouped-topk sf100",
    )
    con.close()
    # Own label (NOT a tag under dq30_window_rank): q172 answers a
    # DIFFERENT query than dq30's four-function window, so the merge's
    # shape-cell re-ratio against dq30's DuckDB base would overstate it
    # — this cell's ratio is against its own simple-window oracle.
    results.setdefault("dq172_grouped_topk", {})
    results["dq172_grouped_topk"]["sf100"] = {
        **cells["grouped_topk"],
        "plain_crosscheck": True,
        "synth_sec": synth,
    }


def _matview_dq25_sf100(spark) -> dict:
    """dq25 at an events-only sf100 tier (1000× the bar's sf0.1): the
    tier where the maintained view's FLAT serving cost meets a raw
    rescan that has outgrown every engine's fixed cost.

    At sf10 the entire raw dq25 answer costs an embedded engine ~50 ms —
    comparable to its own fixed cost and BELOW any JVM engine's
    per-query floor, so no structure can clear a raw-ratio bar there
    (the committed fixed-cost decomposition already shows dq25's Spark
    marginal at 0.47× DuckDB's). This cell makes the layout argument at
    the scale the engine is designed for: the view store is O(buckets)
    — IDENTICAL at sf10 and sf100 — while both raw scans grow 1000×,
    so the serving read's advantage is structural, not a tuning
    artifact. Recorded: tier synthesis cost, view build cost (one-time;
    incremental per micro-batch at deployment), best-of-3 interleaved
    raw-DuckDB / raw-Spark / view-serve times, ratio = view-serve vs
    raw DuckDB on the same tier (the sf10_bucketed convention).
    Cross-checks: view row count and per-bucket n match raw Spark
    exactly; avg within the store's 4-decimal pre-rounding; DuckDB row
    count matches."""
    import shutil

    import duckdb
    from pyspark.sql import functions as F

    from questdb_etl_jobs_spark.operators.matview import (
        read_sample_by_view,
        refresh_sample_by_view,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table
    from tools.stress_scale import synthesize_events_only

    t0 = time.perf_counter()
    synthesize_events_only(spark, SF100_EVENTS, factor=1000, mult=1024)
    synth = round(time.perf_counter() - t0, 1)

    path = "/tmp/spark_graft_diff_matview_sf100"
    shutil.rmtree(path, ignore_errors=True)
    events = load_table(spark, SF100_EVENTS, "events").select("ts", "value")
    t0 = time.perf_counter()
    refresh_sample_by_view(
        spark, events, path, ts="ts", bucket="hour", value="value", keys=[]
    )
    prep = round(time.perf_counter() - t0, 1)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF100_EVENTS}/events.parquet/**/*.parquet')"
    )

    def q_view():
        return (
            read_sample_by_view(spark, path)
            .select("bucket_ts", "n", F.col("avg").alias("avg_value"))
            .orderBy("bucket_ts")
        )

    raw_fn = _spark_headline()["dq25_hourly_bucket"]
    best = {"duck": float("inf"), "raw": float("inf"), "view": float("inf")}
    rows = {}
    pdf_view = pdf_raw = None
    for rnd in range(4):  # round 0 = warmup, discarded
        t0 = time.perf_counter()
        duck_rows = con.execute(DUCK_SQL["dq25_hourly_bucket"]).fetchall()
        d = time.perf_counter() - t0
        t0 = time.perf_counter()
        pdf_raw = raw_fn(spark, SF100_EVENTS).toPandas()
        r = time.perf_counter() - t0
        t0 = time.perf_counter()
        pdf_view = q_view().toPandas()
        v = time.perf_counter() - t0
        if rnd > 0:
            best["duck"] = min(best["duck"], d)
            best["raw"] = min(best["raw"], r)
            best["view"] = min(best["view"], v)
        rows = {"duck": len(duck_rows), "raw": len(pdf_raw),
                "view": len(pdf_view)}
    con.close()
    assert rows["duck"] == rows["raw"] == rows["view"], rows
    assert (pdf_raw["n"].values == pdf_view["n"].values).all(), (
        "sf100 matview count mismatch"
    )
    max_d = (pdf_raw["avg_value"] - pdf_view["avg_value"]).abs().max()
    assert max_d <= 5.1e-5, f"sf100 matview avg drift {max_d}"
    ratio = round(best["view"] / best["duck"], 2)
    print(
        f"matview dq25 @sf100(events-only): synth={synth}s prep={prep}s "
        f"duck_raw={best['duck']:.3f}s spark_raw={best['raw']:.3f}s "
        f"view_serve={best['view']:.3f}s ratio={ratio}",
        file=sys.stderr,
    )
    return {
        "tier": "sf100_events_only",
        "scale_vs_sf01": 1000.0,
        "synth_sec": synth,
        "prep_sec": prep,
        "duckdb_sec": round(best["duck"], 4),
        "spark_raw_sec": round(best["raw"], 4),
        "spark_sec": round(best["view"], 4),
        "ratio": ratio,
        "spark_raw_ratio": round(best["raw"] / best["duck"], 2),
        "rows": rows["view"],
    }


def _refit(tiers_out: dict) -> None:
    """(Re)compute the two-largest-tier marginal fit for one query's
    tier dict in place — shared by the fresh run and the cross-run
    merge so merged bests always carry a consistent fit."""
    pts = sorted(
        (TIERS[t][1], v["spark_sec"], v["duckdb_sec"])
        for t, v in tiers_out.items()
        if t in TIERS
        and isinstance(v, dict)
        and "spark_sec" in v
        and "duckdb_sec" in v  # streaming cells carry no DuckDB side
    )
    if len(pts) < 2:
        return
    (x1, s1, d1), (x2, s2, d2) = pts[-2], pts[-1]
    ms = (s2 - s1) / (x2 - x1)
    md = (d2 - d1) / (x2 - x1)
    sf = (s2 - ms * x2, d2 - md * x2)
    tiers_out["fit"] = {
        "tiers_used": [x1, x2],
        "spark_marginal_sec_per_sf01": round(ms, 5),
        "duckdb_marginal_sec_per_sf01": round(md, 5),
        "asymptotic_ratio": round(ms / md, 2) if md > 0 else None,
        "spark_fixed_cost_sec": round(sf[0], 4),
        "duckdb_fixed_cost_sec": round(sf[1], 4),
        "residual_data_proportional_ratio": (
            round(ms / md, 2) if md > 0 else None
        ),
    }


def _merge_cell(prev: dict, new: dict, duck_base: float | None = None) -> dict:
    """Per-cell best across disclosed runs (the protocol's stated
    policy, now applied to what gets committed — round-8 verdict task
    #3): each engine keeps its best time over ALL runs; run series are
    concatenated so the artifact still shows full variance."""
    out = dict(new)
    if "spark_sec" in prev and "spark_sec" in new:
        out["spark_sec"] = min(prev["spark_sec"], new["spark_sec"])
    if "duckdb_sec" in prev and "duckdb_sec" in new:
        out["duckdb_sec"] = min(prev["duckdb_sec"], new["duckdb_sec"])
    for k in ("spark_runs", "duckdb_runs"):
        if k in prev and k in new:
            out[k] = prev[k] + new[k]
    if "prep_sec" in prev and "prep_sec" in new:
        out["prep_sec"] = min(prev["prep_sec"], new["prep_sec"])
    if "spark_raw_sec" in prev and "spark_raw_sec" in new:
        out["spark_raw_sec"] = min(prev["spark_raw_sec"], new["spark_raw_sec"])
    if "shapes" in prev and "shapes" in new:
        out["shapes"] = {
            s: _merge_cell(prev["shapes"][s], new["shapes"][s], duck_base)
            for s in new["shapes"]
            if s in prev["shapes"]
        }
        best_shape = min(
            out["shapes"], key=lambda s: out["shapes"][s]["spark_sec"]
        )
        out["best_shape"] = best_shape
        out["spark_sec"] = out["shapes"][best_shape]["spark_sec"]
    denom = duck_base if duck_base is not None else out.get("duckdb_sec")
    if denom and "spark_sec" in out:
        out["ratio"] = round(out["spark_sec"] / denom, 2)
    if denom and "spark_raw_sec" in out:
        out["spark_raw_ratio"] = round(out["spark_raw_sec"] / denom, 2)
    return out


def merge_summaries(prev: dict, new: dict) -> dict:
    """Fold a previous SCALE_DIFF artifact into a fresh one: per-cell
    best per engine, shape cells re-ratioed against the merged raw
    DuckDB base of their tier, fits recomputed from the merged bests,
    headline aggregates recomputed. Provenance: ``runs_merged`` counts
    the disclosed runs folded in; every per-run series is kept."""
    merged = dict(new)
    queries: dict[str, dict] = {}
    # UNION of labels and tier tags from BOTH artifacts (round-9
    # ADVICE): a query or cell present only in the previous artifact —
    # e.g. an sf100 shape cell from a run the new one produced with
    # --skip-sf10 — is carried through unchanged, never silently
    # dropped.
    prev_queries = prev.get("queries", {})
    for label in list(new["queries"]) + [
        q for q in prev_queries if q not in new["queries"]
    ]:
        ntiers = new["queries"].get(label)
        ptiers = prev_queries.get(label)
        if not ptiers:
            queries[label] = ntiers
            continue
        if not ntiers:
            queries[label] = ptiers
            continue
        out: dict[str, dict] = {}
        tags = [t for t in ntiers if t != "fit"] + [
            t for t in ptiers if t not in ntiers and t != "fit"
        ]
        for tag in tags:
            cell = ntiers.get(tag)
            pcell = ptiers.get(tag)
            if cell is None:  # prev-only cell: carry through unchanged
                out[tag] = pcell
                continue
            if not isinstance(cell, dict) or not isinstance(pcell, dict):
                out[tag] = cell
                continue
            base_tag = tag.split("_")[0] if "_" in tag else None
            if base_tag in TIERS:  # layout shape cell (e.g. sf10_bucketed)
                bases = [
                    t[base_tag]["duckdb_sec"]
                    for t in (ntiers, ptiers)
                    if isinstance(t.get(base_tag), dict)
                ]
                out[tag] = (
                    _merge_cell(pcell, cell, min(bases))
                    if bases
                    else _merge_cell(pcell, cell)
                )
            else:
                out[tag] = _merge_cell(pcell, cell)
        _refit(out)
        queries[label] = out
    merged["queries"] = queries
    merged["runs_merged"] = prev.get("runs_merged", 1) + new.get(
        "runs_merged", 1
    )
    merged["control_runs"] = prev.get("control_runs", [prev["control"]]) + \
        new.get("control_runs", [new["control"]])

    last_tag = "sf10" if any(
        "sf10" in v for v in queries.values()
    ) else "sf1"
    ratios = [
        v[last_tag]["ratio"] for v in queries.values() if last_tag in v
    ]
    asym_all = [
        v["fit"]["asymptotic_ratio"]
        for v in queries.values()
        if v.get("fit", {}).get("asymptotic_ratio") is not None
    ]
    asym = [r for r in asym_all if r > 0]
    merged[f"{last_tag}_ratio_le_2x"] = sum(1 for r in ratios if r <= 2.0)
    merged[f"{last_tag}_geomean_ratio"] = round(
        math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 2
    )
    merged["asymptote_le_2x"] = sum(1 for r in asym_all if r <= 2.0)
    merged["asymptote_geomean"] = (
        round(math.exp(sum(math.log(r) for r in asym) / len(asym)), 2)
        if asym
        else None
    )
    merged["asymptote_below_noise"] = [
        q for q, v in queries.items()
        if (v.get("fit", {}).get("asymptotic_ratio") or 1) <= 0
    ]
    return merged


def main() -> None:
    from questdb_etl_jobs_spark.session import get_spark

    skip_sf10 = "--skip-sf10" in sys.argv
    argv = sys.argv[1:]
    merge_path = None
    if "--merge" in argv:
        i = argv.index("--merge")
        merge_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf100_only = "--sf100-only" in argv
    sf100_relational = "--sf100-relational-only" in argv
    sf100_dq30_pruned = "--sf100-dq30-pruned-only" in argv
    sf100_dialect_routed = "--sf100-dialect-routed-only" in argv
    sf100_bottomk = "--sf100-bottomk-only" in argv
    sf100_latest = "--sf100-latest-only" in argv
    sf100_grouped_topk = "--sf100-grouped-topk-only" in argv
    sf100_asof = "--sf100-asof-only" in argv
    sf10_update = "--sf10-update-only" in argv
    sf10_update_mor = "--sf10-update-mor-only" in argv
    sf10_stream_topk = "--sf10-stream-topk-only" in argv
    sf100_stream_topk = "--sf100-stream-topk-only" in argv
    sf10_interval = "--sf10-interval-only" in argv
    sf10_stream_admit = "--sf10-stream-admit-only" in argv
    sf10_docs_stream_admit = "--sf10-docs-stream-admit-only" in argv
    sf10_docs_admit_narrow = "--sf10-docs-stream-admit-narrow-only" in argv
    argv = [
        a for a in argv
        if a not in (
            "--sf100-only",
            "--sf100-relational-only",
            "--sf100-dq30-pruned-only",
            "--sf100-dialect-routed-only",
            "--sf100-bottomk-only",
            "--sf100-latest-only",
            "--sf100-grouped-topk-only",
            "--sf100-asof-only",
            "--sf10-update-only",
            "--sf10-update-mor-only",
            "--sf10-stream-topk-only",
            "--sf100-stream-topk-only",
            "--sf10-interval-only",
            "--sf10-stream-admit-only",
            "--sf10-docs-stream-admit-only",
            "--sf10-docs-stream-admit-narrow-only",
        )
    ]
    out_path = next((a for a in argv if not a.startswith("--")), None)

    spark = get_spark(app_name="sf1-differential")
    spark.sparkContext.setLogLevel("ERROR")

    if (sf100_only or sf100_relational or sf100_dq30_pruned
            or sf100_dialect_routed or sf100_bottomk or sf100_latest
            or sf100_grouped_topk or sf100_asof or sf10_update
            or sf10_update_mor or sf10_stream_topk or sf100_stream_topk
            or sf10_interval or sf10_stream_admit
            or sf10_docs_stream_admit or sf10_docs_admit_narrow):
        # Fast path for re-measuring ONLY the lineitem sf100 cells (the
        # third fit point) on a fresh quiet boot, merged into a prior
        # artifact via --merge: control probes + _lineitem_sf100, no
        # sf1/sf10 synthesis or all-query rounds.
        heads = _spark_headline()
        heads["dq20_pricing_summary"](spark, BASE).collect()  # warm
        con = _duck_connection(BASE)
        con.execute("SELECT count(*) FROM lineitem").fetchall()
        control = {}
        drift_terms = []
        for label, base_sec in CONTROL_BASELINE.items():
            best = float("inf")
            for _ in range(ROUNDS + 1):
                best = min(best, _time_duck(con, DUCK_SQL[label])[0])
            control[f"{label}_duck_sec"] = round(best, 4)
            control[f"{label}_baseline_sec"] = base_sec
            drift_terms.append(best / base_sec)
        control["drift_vs_baseline"] = round(
            math.exp(
                sum(math.log(r) for r in drift_terms) / len(drift_terms)
            ), 3,
        )
        con.close()
        if sf10_stream_admit:
            results = {"dq167_stream_admit": {}}
            _stream_admit_sf10(spark, results)
            scope = (
                "composite-docs streaming admission-gate replay: "
                "per-batch latency, admitted-index state bound, CPython "
                "gate-semantics mirror over verified ground-truth pairs"
            )
        elif sf10_docs_stream_admit:
            results = {"dq167_stream_admit": {}}
            _stream_admit_sf10(
                spark, results, factor=10, tier_key="sf10_docs"
            )
            scope = (
                "sf10-docs streaming admission-gate tier cell: same "
                "10-batch chunking over a ~10× novel corpus (per-word-"
                "SUFFIX replicas — rotation preserved shingles and only "
                "grew the index 1.9×, see _stream_admit_sf10), per-batch "
                "latency trend where the "
                "admitted index is ~10× larger, CPython gate mirror "
                "over verified ground-truth pairs at the tier"
            )
        elif sf10_docs_admit_narrow:
            # Fourth streaming tier story (round 18, VERDICT r17 #7):
            # the sf10_docs cell scales BOTH the admitted index (~10x)
            # AND the per-batch input (~10x, same 10-batch chunking
            # over the 10x corpus). This cell holds per-batch input at
            # the sf01 cell's size (100 chunks over the same 10x
            # corpus) while the index still grows to the same ~65k
            # rows - comparing its late-batch trigger latency against
            # sf01 (1x input x 1x index) isolates the index-scan term,
            # and against sf10_docs (10x x 10x) isolates the
            # input-join term.
            results = {"dq167_stream_admit": {}}
            _stream_admit_sf10(
                spark, results, factor=10,
                tier_key="sf10_docs_narrowbatch", chunks_n=100,
            )
            scope = (
                "sf10-docs NARROW-BATCH admission-gate cell: the same "
                "~10x novel corpus (per-word-SUFFIX replicas) cut into "
                "100 sf01-sized batches - per-batch input held at the "
                "base cell's size while the admitted index grows ~10x, "
                "so the latency decomposition separates index-scan "
                "cost from input-join cost; CPython gate mirror over "
                "verified ground-truth pairs at the tier"
            )
        elif sf10_interval:
            results = {"dq82_interval_search": {}}
            _interval_sf10(spark, results)
            scope = (
                "sf10-events interval-search pushdown cell: dialect "
                "`ts IN '<day>'` (partition-pruned) vs the same range "
                "without the partition conjunct vs DuckDB native range"
            )
        elif sf10_stream_topk:
            results = {"dq176_stream_topk": {}}
            _stream_topk_sf10(spark, results)
            scope = (
                "sf10-events streaming per-key top-k replay: per-batch "
                "latency + state-store rows from engine progress, "
                "bounded-state assertions, CPython oracle at the tier"
            )
        elif sf100_stream_topk:
            results = {"dq176_stream_topk": {}}
            _stream_topk_sf10(
                spark, results, tier_key="sf100_events", factor=1000
            )
            scope = (
                "sf100-events streaming per-key top-k replay (10× the "
                "sf10 cell's rows and ~10× its keys): per-batch latency "
                "+ state-store rows, bounded-state assertions, CPython "
                "oracle at the tier"
            )
        elif sf10_update_mor:
            results = {"dq198_update_mor": {}}
            _update_mor_sf10(spark, results)
            scope = (
                "sf10/sf100-events SELECTIVE UPDATE cells: merge-on-read "
                "delta face vs deployed copy-on-write face vs DuckDB "
                "native UPDATE, plus merged-read tax and fold cost"
            )
        elif sf10_update:
            results = {"dq198_update": {}}
            _update_sf10(spark, results)
            scope = (
                "sf10 UPDATE DML cell only (partition-scoped vs DuckDB "
                "native UPDATE + naive-rewrite face)"
            )
        elif sf100_asof:
            results = {"dq15_asof": {}}
            _asof_sf100(spark, results)
            scope = "sf100 as-of join cells only (union-window + bucketed)"
        elif sf100_latest:
            results = {"dq33_latest_on": {}}
            _latest_on_sf100(spark, results)
            scope = "sf100 LATEST ON cells only (pruned + plain window)"
        elif sf100_grouped_topk:
            results = {"dq172_grouped_topk": {}}
            _grouped_topk_sf100(spark, results)
            scope = "sf100 grouped top-k-per-key (q172 shape) cell only"
        elif sf100_bottomk:
            results = {"dq34_topk": {}}
            _bottomk_sf100(spark, results)
            scope = "sf100 dq34 bottom-k (ascending prune) cell only"
        elif sf100_dialect_routed:
            results = {"dq34_topk": {}}
            _dialect_routed_sf100(spark, results)
            scope = "sf100 dq34 dialect-routed cell only"
        elif sf100_dq30_pruned:
            results = {"dq30_window_rank": {}}
            _dq30_pruned_sf100(spark, results)
            scope = "sf100 dq30 pruned-rank-family cell only"
        elif sf100_relational:
            results = {"dq10_join_revenue": {}, "dq30_window_rank": {}}
            _relational_sf100(spark, results)
            scope = "sf100-relational cells only (dq10/dq30)"
        else:
            results = {"dq20_pricing_summary": {}, "dq34_topk": {}}
            _lineitem_sf100(spark, results)
            scope = "sf100-lineitem cells only"
        summary = {
            "metric": "scale_differential",
            "protocol": {
                "rounds_recorded": ROUNDS,
                "warmup_rounds": 1,
                "interleaved": True,
                "per_cell": "best-of-rounds, per-round series recorded",
                "scope": scope,
            },
            "control": control,
            "queries": results,
        }
        if merge_path:
            with open(merge_path) as fh:
                prev = json.load(fh)
            summary = merge_summaries(prev, summary)
            print(
                f"# merged with {merge_path}: runs_merged="
                f"{summary['runs_merged']}",
                file=sys.stderr,
            )
        out = json.dumps(summary)
        print(out)
        if out_path:
            with open(out_path, "w") as fh:
                fh.write(out + "\n")
        return

    t0 = time.perf_counter()
    synthesize(spark)
    if not skip_sf10:
        synthesize_big(spark, OUT100, factor=100, mult=128)
    print(f"# synthesis: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    heads = _spark_headline()
    heads["dq20_pricing_summary"](spark, BASE).collect()  # warm off the clock

    tiers = {
        k: v for k, v in TIERS.items()
        if k in FULL_TIERS and not (skip_sf10 and k == "sf10")
    }
    cons = {tag: _duck_connection(d) for tag, (d, _) in tiers.items()}
    for con in cons.values():
        con.execute("SELECT count(*) FROM lineitem").fetchall()  # warm

    # Interleaved rounds: engines alternate back-to-back within a cell,
    # cells cycle within a round, rounds repeat on one boot. Round 0 is a
    # discarded warmup (page cache, AQE stats, JIT); per-cell best over
    # the recorded rounds is the reported value, per-round series kept in
    # the artifact for variance visibility.
    runs: dict[tuple[str, str], dict[str, list]] = {
        (label, tag): {"spark": [], "duck": [], "rows": -1}
        for label in heads
        for tag in tiers
    }
    for rnd in range(ROUNDS + 1):
        recorded = rnd > 0
        for tag, (sf_dir, _scale) in tiers.items():
            con = cons[tag]
            for label, fn in heads.items():
                s_sec, s_rows = _time_spark(spark, fn, sf_dir)
                d_sec, d_rows = _time_duck(con, DUCK_SQL[label])
                if s_rows != d_rows:
                    raise SystemExit(
                        f"row mismatch {label}@{tag}: "
                        f"spark={s_rows} duck={d_rows}"
                    )
                if recorded:
                    cell = runs[(label, tag)]
                    cell["spark"].append(round(s_sec, 4))
                    cell["duck"].append(round(d_sec, 4))
                    cell["rows"] = s_rows
        print(
            f"# round {rnd}{' (warmup, discarded)' if not recorded else ''} "
            "done",
            file=sys.stderr,
        )
    for con in cons.values():
        con.close()

    results: dict[str, dict] = {}
    for (label, tag), cell in runs.items():
        s_sec, d_sec = min(cell["spark"]), min(cell["duck"])
        results.setdefault(label, {})[tag] = {
            "spark_sec": s_sec,
            "duckdb_sec": d_sec,
            "ratio": round(s_sec / d_sec, 2),
            "rows": cell["rows"],
            "spark_runs": cell["spark"],
            "duckdb_runs": cell["duck"],
        }
        print(
            f"{tag:6s} {label:22s} spark={s_sec:7.3f}s duckdb={d_sec:7.3f}s "
            f"ratio={s_sec / d_sec:6.2f} rows={cell['rows']}",
            file=sys.stderr,
        )

    # Control probes: this boot's DuckDB sf0.1 times vs the baseline-day
    # measurements behind BASELINE.md's 2x bar.
    control: dict[str, float] = {}
    drift_terms = []
    for label, base_sec in CONTROL_BASELINE.items():
        probe = results[label]["sf0.1"]["duckdb_sec"]
        control[f"{label}_duck_sec"] = probe
        control[f"{label}_baseline_sec"] = base_sec
        drift_terms.append(probe / base_sec)
    control["drift_vs_baseline"] = round(
        math.exp(sum(math.log(r) for r in drift_terms) / len(drift_terms)), 3
    )

    # Layout-aware variant at the largest tier: bucketed (co-located)
    # lineitem/orders — the 100 TB answer to the fact-fact join. Both
    # sides hash-bucketed on the join key at write time, so the join
    # plans with ZERO exchanges; the one-time layout cost is reported
    # alongside (at real scale data LANDS bucketed once and every
    # subsequent join skips both shuffles). DuckDB comparison value is
    # the raw-parquet dq10 time at the same tier (DuckDB has no bucketed
    # storage; single-node it does not need one — the line quantifies
    # what Spark's layout control buys back of the shuffle cost).
    last_tag = list(tiers)[-1]
    last_dir = tiers[last_tag][0]
    results["dq10_join_revenue"][f"{last_tag}_bucketed"] = _bucketed_dq10(
        spark, last_dir, results["dq10_join_revenue"][last_tag]
    )
    # Layout-aware variant for the time-bucket dashboard: dq25 served
    # from the maintained SAMPLE BY view (see _matview_dq25), plus the
    # events-only sf100 tier where the view's flat cost meets a raw
    # rescan big enough to dominate fixed costs (see _matview_dq25_sf100).
    results["dq25_hourly_bucket"][f"{last_tag}_matview"] = _matview_dq25(
        spark, last_dir, results["dq25_hourly_bucket"][last_tag]
    )
    if not skip_sf10:
        results["dq25_hourly_bucket"]["sf100_matview_events"] = (
            _matview_dq25_sf100(spark)
        )
        # The third fit point for the lineitem-only headliners — after
        # this, _refit's two-largest-tiers rule commits the [sf10,
        # sf100] slope for dq20/dq34 (the data-dominated regime).
        _lineitem_sf100(spark, results)

    # Marginal per-unit-data cost per engine: the two-point slope between
    # the two LARGEST tiers of the same best-of numbers the raw ratios
    # use. The asymptotic ratio marginal_spark / marginal_duckdb is the
    # gap that survives when the data term dominates — and, computed this
    # way, it cannot contradict the sf10 raw ratio the way an LSQ fit
    # through a noisy sf0.1 endpoint can.
    # Fixed-cost decomposition at the largest tier: t = fixed +
    # marginal*scale — the per-query constant (scheduling, AQE stage
    # materialization, py4j round-trips for Spark; ~0 for an embedded
    # engine) that a 1000-executor deployment amortizes over 1000x more
    # data per query. The residual data-proportional ratio IS the
    # asymptotic_ratio: what survives when the data term dominates.
    for label, tiers_out in results.items():
        _refit(tiers_out)
        fit = tiers_out.get("fit")
        if fit:
            print(
                f"fit    {label:22s} marginal "
                f"spark={fit['spark_marginal_sec_per_sf01']:.4f}/sf0.1 "
                f"duck={fit['duckdb_marginal_sec_per_sf01']:.4f}/sf0.1 "
                f"asymptote={fit['asymptotic_ratio']}",
                file=sys.stderr,
            )

    last_tag = list(tiers)[-1]
    ratios = [v[last_tag]["ratio"] for v in results.values()]
    # A NON-POSITIVE marginal means the query's best-of time did not
    # grow from sf1 to sf10 — its data-proportional cost is below this
    # boot's measurement noise. Such a ratio is "unmeasurably small",
    # not a number a geomean can absorb (log of ≤0): count it as ≤2×
    # and exclude it from the geomean, flagging it in the summary.
    asym_all = [
        v["fit"]["asymptotic_ratio"]
        for v in results.values()
        if v.get("fit", {}).get("asymptotic_ratio") is not None
    ]
    asym = [r for r in asym_all if r > 0]
    summary = {
        "metric": "scale_differential",
        "protocol": {
            "rounds_recorded": ROUNDS,
            "warmup_rounds": 1,
            "interleaved": True,
            "per_cell": "best-of-rounds, per-round series recorded",
        },
        "control": control,
        "queries": results,
        f"{last_tag}_ratio_le_2x": sum(1 for r in ratios if r <= 2.0),
        f"{last_tag}_geomean_ratio": round(
            math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 2
        ),
        "asymptote_le_2x": sum(1 for r in asym_all if r <= 2.0),
        "asymptote_geomean": round(
            math.exp(sum(math.log(r) for r in asym) / len(asym)), 2
        )
        if asym
        else None,
        "asymptote_below_noise": [
            q for q, v in results.items()
            if (v.get("fit", {}).get("asymptotic_ratio") or 1) <= 0
        ],
    }
    if merge_path:
        with open(merge_path) as fh:
            prev = json.load(fh)
        summary = merge_summaries(prev, summary)
        print(
            f"# merged with {merge_path}: runs_merged="
            f"{summary['runs_merged']}",
            file=sys.stderr,
        )
    out = json.dumps(summary)
    print(out)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(out + "\n")


if __name__ == "__main__":
    main()
