"""SCD2 build + point-in-time join semantics (operators/scd.py), plus
plan-shape checks for the q113-q118 profiling/sketch query family."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.operators.scd import pit_join, scd2_intervals


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _dim(spark):
    rows = [
        # key 1: A A B A  -> versions A(2 rows), B(1), A(1)
        (1, "A", _ts("2021-01-01 00:00:00"), 1),
        (1, "A", _ts("2021-01-01 01:00:00"), 2),
        (1, "B", _ts("2021-01-01 02:00:00"), 3),
        (1, "A", _ts("2021-01-01 03:00:00"), 4),
        # key 2: single row
        (2, "C", _ts("2021-01-01 00:30:00"), 5),
    ]
    return spark.createDataFrame(rows, "k int, attr string, ts timestamp, id int")


def test_scd2_collapses_runs_and_links_intervals(spark):
    out = scd2_intervals(_dim(spark), "k", "attr", "ts", order=["id"]).orderBy(
        "k", "version"
    )
    got = [
        (r.k, r.attr, r.version, r.valid_from, r.valid_to, r.n_rows)
        for r in out.collect()
    ]
    assert got == [
        (1, "A", 1, _ts("2021-01-01 00:00:00"), _ts("2021-01-01 02:00:00"), 2),
        (1, "B", 2, _ts("2021-01-01 02:00:00"), _ts("2021-01-01 03:00:00"), 1),
        (1, "A", 3, _ts("2021-01-01 03:00:00"), None, 1),
        (2, "C", 1, _ts("2021-01-01 00:30:00"), None, 1),
    ]


def test_scd2_null_attr_forms_runs(spark):
    rows = [
        (1, None, _ts("2021-01-01 00:00:00"), 1),
        (1, None, _ts("2021-01-01 01:00:00"), 2),
        (1, "A", _ts("2021-01-01 02:00:00"), 3),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, id int")
    out = scd2_intervals(df, "k", "attr", "ts", order=["id"]).orderBy("version")
    got = [(r.attr, r.version, r.n_rows) for r in out.collect()]
    assert got == [(None, 1, 2), ("A", 2, 1)]


def test_scd2_equal_ts_tiebreaks_by_order_col(spark):
    # Two rows at the same timestamp: the `order` column decides run order
    # deterministically (B after A -> two versions, A first).
    rows = [
        (1, "A", _ts("2021-01-01 00:00:00"), 1),
        (1, "B", _ts("2021-01-01 00:00:00"), 2),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, id int")
    out = scd2_intervals(df, "k", "attr", "ts", order=["id"]).orderBy("version")
    got = [(r.attr, r.version) for r in out.collect()]
    assert got == [("A", 1), ("B", 2)]


def test_pit_join_picks_interval_containing_fact(spark):
    dim = scd2_intervals(_dim(spark), "k", "attr", "ts", order=["id"])
    facts = spark.createDataFrame(
        [
            (1, _ts("2020-12-31 23:59:59"), "before-first"),
            (1, _ts("2021-01-01 00:00:00"), "at-start"),
            (1, _ts("2021-01-01 02:30:00"), "inside-B"),
            (1, _ts("2021-01-01 10:00:00"), "open-end"),
            (3, _ts("2021-01-01 01:00:00"), "unknown-key"),
        ],
        "k int, ts timestamp, tag string",
    )
    out = pit_join(facts, dim.drop("n_rows", "version"), key="k", ts="ts")
    got = {r.tag: r.attr for r in out.collect()}
    assert got == {
        "before-first": None,
        "at-start": "A",
        "inside-B": "B",
        "open-end": "A",
        "unknown-key": None,
    }


def test_pit_join_inner_drops_unmatched(spark):
    dim = scd2_intervals(_dim(spark), "k", "attr", "ts", order=["id"])
    facts = spark.createDataFrame(
        [(1, _ts("2020-01-01 00:00:00"), "early"), (1, _ts("2021-01-01 01:30:00"), "hit")],
        "k int, ts timestamp, tag string",
    )
    out = pit_join(facts, dim.drop("n_rows", "version"), key="k", ts="ts", how="inner")
    assert [r.tag for r in out.collect()] == ["hit"]


def test_pit_join_respects_gap_in_dim(spark):
    # Hand-built dim with a GAP: [0h,1h) then [3h,∞). A fact at 2h falls in
    # the gap — the as-of match (version starting 0h) must be nulled by the
    # valid_to bound, not returned.
    dim = spark.createDataFrame(
        [
            (1, "A", _ts("2021-01-01 00:00:00"), _ts("2021-01-01 01:00:00")),
            (1, "B", _ts("2021-01-01 03:00:00"), None),
        ],
        "k int, attr string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [(1, _ts("2021-01-01 02:00:00"), "in-gap")],
        "k int, ts timestamp, tag string",
    )
    out = pit_join(facts, dim, key="k", ts="ts").collect()
    assert out[0].attr is None and out[0].valid_from is None


def test_scd2_single_shuffle_plan(spark):
    """Both windows and the groupBy share the key partitioning: exactly one
    exchange on the dimension key in the whole build."""
    dim = scd2_intervals(_dim(spark), "k", "attr", "ts", order=["id"])
    plan = dim._jdf.queryExecution().executedPlan().toString()
    # hashpartitioning(k ...) appears in exchanges; count Exchange nodes.
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_skew_safe_distinct_matches_count_distinct(spark):
    df = spark.createDataFrame(
        [(t, u) for t in ("x", "y") for u in (1, 2, 2, 3, 3, 3)],
        "t string, u int",
    )
    pairs = df.groupBy("t", "u").agg(F.count(F.lit(1)).alias("c"))
    two_stage = pairs.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    direct = df.groupBy("t").agg(F.count_distinct("u").alias("n"))
    assert sorted(map(tuple, two_stage.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_union_of_partials_tracks_exact(spark):
    # 5k distinct keys split into 10 partial sketches, unioned: the
    # mergeable-sketch estimate must land within 5% of exact.
    df = spark.range(5000).select(
        (F.col("id") % 10).alias("part"), F.col("id").alias("k")
    )
    partials = df.groupBy("part").agg(F.hll_sketch_agg("k", F.lit(14)).alias("sk"))
    est = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    assert abs(est - 5000) <= 250, est
