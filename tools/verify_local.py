"""Local mirror of the driver's correctness gate (t2).

Runs every registered query's Spark face and DuckDB oracle face at sf0.01,
compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted, canonical stringification). Prints one line
per query; exits nonzero on any failure.

Usage: python tools/verify_local.py [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

#: Override with SPARK_GRAFT_VERIFY_SF=/root/testdata/sf0.1 for a 10×
#: scale differential pass. Python-computed oracles are pinned to sf0.01
#: (they recompute over that sf by construction) and are skipped at any
#: other sf.
SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 0.0 == -0.0 canonicalization + stable shortest repr
        return repr(v + 0.0)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    from questdb_etl_jobs_spark.queries import oracle_queries, spark_queries
    from questdb_etl_jobs_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    sq = spark_queries()
    oq = oracle_queries(SF_DIR)
    pinned: dict[str, str] = {}
    if SF_DIR.rstrip("/") != "/root/testdata/sf0.01":
        from questdb_etl_jobs_spark.queries import REGISTRY

        # Callable oracles default to sf0.01-pinned (they bake Python-
        # computed values from that sf into the SQL) unless they are
        # marked `sf_invariant` (pure SQL generators / fixture-bound
        # queries whose Spark face never reads the sf tables) or
        # `sf_parametric` (their mirror recomputes over SF_DIR — the
        # call above already built them there). Remaining pins state a
        # per-query reason via `sf_pin_reason`.
        pinned = {
            n: getattr(
                spec.oracle, "sf_pin_reason",
                "Python-computed oracle pinned to sf0.01",
            )
            for n, spec in REGISTRY.items()
            if callable(spec.oracle)
            and not getattr(spec.oracle, "sf_invariant", False)
            and not getattr(spec.oracle, "sf_parametric", False)
        }
    failures = 0
    for name, fn in sq.items():
        if only and name not in only:
            continue
        if name in pinned:
            print(f"skip {name}: {pinned[name]}")
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oq:
            status = "ROWS-ONLY" + (" (0 rows!)" if not srows else "")
            if not srows:
                failures += 1
            print(f"{'FAIL' if not srows else 'pass'} {name}: {status} "
                  f"rows={len(srows)}")
            continue
        try:
            rel = con.sql(oq[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            type_map = {
                "BIGINT": "bigint", "INTEGER": "int", "DOUBLE": "double",
                "VARCHAR": "string", "TIMESTAMP": "timestamp",
                "TIMESTAMP_NS": "timestamp", "FLOAT": "float",
                "BOOLEAN": "boolean",
            }
            sdt = dict(sdf.dtypes)
            for col, dt in zip(ocols, otypes):
                want = type_map.get(dt.split("(")[0], dt.lower())
                if sdt.get(col) != want:
                    problems.append(
                        f"dtype {col}: spark={sdt.get(col)} duck={dt}"
                    )
        if not problems:
            sc, oc = rows_canon(scols, srows), rows_canon(ocols, orows)
            if sc != oc:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sc, oc)) if a != b
                )
                problems.append(f"values differ at sorted-row {diff[0]}: "
                                f"spark={diff[1]} oracle={diff[2]}")
        if not srows:
            problems.append("vacuous (0 rows)")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"pass {name}: rows={len(srows)}")
    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL GREEN'} "
          f"({len(sq)} queries registered, {len(oq)} oracle-paired)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
