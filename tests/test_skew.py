"""Salted-join semantics and physical shape (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from questdb_etl_jobs_spark.operators.skew import salted_join


def _skewed(spark):
    # 90% of facts share key 1 (the hot key); dim has keys 1..5 plus an
    # extra value column so payload carries through.
    facts = spark.createDataFrame(
        [(1 if i % 10 else (i // 10) % 5 + 1, i, float(i)) for i in range(1000)],
        "k int, fid int, v double",
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 6)], "k int, name string"
    )
    return facts, dim


def test_salted_join_equals_plain_inner(spark):
    facts, dim = _skewed(spark)
    plain = facts.join(dim, "k").select("fid", "name")
    salted = salted_join(facts, dim, on="k", salts=8, salt_by="fid").select(
        "fid", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    facts, dim = _skewed(spark)
    facts = facts.union(
        facts.sparkSession.createDataFrame([(99, 10**6, 0.0)], facts.schema)
    )
    plain = facts.join(dim, "k", "left").select("fid", "name")
    salted = salted_join(
        facts, dim, on="k", salts=4, salt_by="fid", how="left"
    ).select("fid", "name")
    assert sorted(
        map(tuple, salted.collect()), key=str
    ) == sorted(map(tuple, plain.collect()), key=str)


def test_salted_join_spreads_hot_key(spark):
    """The hot key's fact rows land in every salt bucket, each bounded
    well under the unsalted size (900 rows -> ~112 per bucket at S=8)."""
    facts, dim = _skewed(spark)
    facts_s = facts.withColumn(
        "s", F.pmod(F.xxhash64(F.col("fid")), F.lit(8)).cast("int")
    )
    sizes = (
        facts_s.filter(F.col("k") == 1)
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(sizes) == 8
    assert max(r["count"] for r in sizes) < 300


def test_salted_join_key_includes_salt_in_plan(spark):
    facts, dim = _skewed(spark)
    out = salted_join(facts, dim, on="k", salts=8, salt_by="fid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, plan


def test_salted_join_default_salt_is_deterministic_and_correct(spark):
    """The no-salt_by default must be a pure function of row content
    (round-6 advisor: partition-id/monotonic-id salts re-assign rows on
    task retry, dropping/duplicating join rows). Content-hash default:
    same results as the plain join, and re-evaluating the salted frame
    yields identical row assignments."""
    facts, dim = _skewed(spark)
    plain = facts.join(dim, "k").select("fid", "name")
    salted = salted_join(facts, dim, on="k", salts=8).select("fid", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # Determinism: two independent evaluations of the salt expression
    # agree row-for-row (nondeterministic sources would not).
    s = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(8))
    a = facts.withColumn("s", s).collect()
    b = facts.withColumn("s", s).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # And the hot key still spreads across buckets.
    spread = (
        facts.withColumn("s", s.cast("int"))
        .filter(F.col("k") == 1)
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(spread) == 8


def test_salted_join_validates_args(spark):
    facts, dim = _skewed(spark)
    import pytest

    with pytest.raises(ValueError):
        salted_join(facts, dim, on="k", salts=0)
    with pytest.raises(ValueError):
        salted_join(facts, dim, on="k", how="full")
