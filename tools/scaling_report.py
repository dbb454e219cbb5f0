"""Measure headline-query latency across sf0.001 / sf0.01 / sf0.1.

Separates Spark's *fixed* local-mode per-query cost (scheduling, AQE
stage materialization, Python<->JVM plan round-trip) from the
*data-proportional* cost — the part that actually scales. For each
headline DQ the report fits

    t(sf) ~= fixed + marginal * rows(sf)

from the three measurements and prints the table BENCH.md cites: if the
100x row growth from sf0.001 to sf0.1 moves the time by only a small
multiple, the sf0.1 number is overhead-dominated and the DuckDB-embedded
baseline comparison measures session overhead, not operator cost.

Usage: python tools/scaling_report.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _headline():
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


def main() -> None:
    from questdb_etl_jobs_spark.session import get_spark

    spark = get_spark(app_name="scaling-report")
    spark.sparkContext.setLogLevel("ERROR")
    heads = _headline()

    # warm
    next(iter(heads.values()))(spark, SFS[0]).collect()

    out: dict[str, dict[str, float]] = {}
    for label, fn in heads.items():
        per_sf: dict[str, float] = {}
        for sf_dir in SFS:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).toPandas()
                best = min(best, time.perf_counter() - t0)
            per_sf[sf_dir.rsplit("/", 1)[-1]] = round(best, 4)
        t1, t100 = per_sf["sf0.001"], per_sf["sf0.1"]
        # 100x the rows -> growth factor; fixed share at sf0.1 assuming
        # the sf0.001 run is ~pure overhead (its data term is <1 ms).
        per_sf["growth_100x_rows"] = round(t100 / t1, 2)
        per_sf["fixed_share_sf01"] = round(min(t1 / t100, 1.0), 2)
        out[label] = per_sf

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
