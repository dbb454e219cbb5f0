"""Per-query profiling harness for the optimization rounds (guide §1).

For every bench headline entry: capture ``explain("formatted")`` into
plans/<tag>/<label>_<suffix>.txt, then time the query with the SAME
methodology as bench.py (warmup pass + 3 recorded passes, toPandas
fetch) and additionally a noop-sink timing (guide §1.4) so the
computation is separable from the Arrow fetch. Prints one JSON line.

Usage:
  python tools/profile_bench.py [--plans-dir plans/r18] [--suffix before]
                                [--labels a,b,c] [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--labels", default=None)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="also time with the noop sink")
    args = ap.parse_args()

    from bench import _dup_clusters_lsh, _headline, _kmeans_pll_init  # noqa
    from questdb_etl_jobs_spark.queries import spark_queries
    from questdb_etl_jobs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = spark_queries()
    heads = {
        label: (registry[key] if isinstance(key, str) else key)
        for label, key in _headline().items()
    }
    if args.labels:
        want = args.labels.split(",")
        heads = {k: heads[k] for k in want}

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for label, fn in heads.items():
            try:
                plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                    fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(
                f"{args.plans_dir}/{label}_{args.suffix}.txt", "w"
            ) as fh:
                fh.write(plan)

    # warmup
    for label, fn in heads.items():
        spark.sparkContext.setJobDescription(f"warmup:{label}")
        fn(spark, sf_dir).toPandas()
    runs: dict[str, list[float]] = {label: [] for label in heads}
    noop_runs: dict[str, list[float]] = {label: [] for label in heads}
    for _ in range(args.passes):
        for label, fn in heads.items():
            spark.sparkContext.setJobDescription(f"profile:{label}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs[label].append(round(time.perf_counter() - t0, 4))
            if args.noop:
                t0 = time.perf_counter()
                (fn(spark, sf_dir).write.format("noop")
                 .mode("overwrite").save())
                noop_runs[label].append(round(time.perf_counter() - t0, 4))
    out = {
        label: {
            "best": min(series),
            "runs": series,
            **(
                {"noop_best": min(noop_runs[label]),
                 "noop_runs": noop_runs[label]}
                if args.noop else {}
            ),
        }
        for label, series in runs.items()
    }
    out["_total_best"] = round(sum(v["best"] for v in out.values()), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
