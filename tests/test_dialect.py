"""QuestDB SQL dialect front-end: dialect strings run verbatim and lower
onto the library operators (sql/dialect.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.sql import QuestDBSQLError, questdb_sql


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades(spark):
    rows = [
        (_ts(f"2024-01-0{d} {h:02d}:15:00"), s, float(10 * d + h), d * 100 + h)
        for d in (1, 2)
        for h in (0, 1, 3)
        for s in ("AAA", "BBB")
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, sym string, price double, qty long"
    )
    df.createOrReplaceTempView("trades")
    return df


def test_reference_readme_query_verbatim(spark, trades):
    """The reference README's own console query (README.md:366) runs as
    written (standard SQL → spark.sql passthrough)."""
    trades.createOrReplaceTempView("purchases")
    out = questdb_sql(
        spark, "SELECT * FROM purchases ORDER BY ts;", {"purchases": "ts"}
    )
    assert [r.ts for r in out.collect()] == sorted(r.ts for r in trades.collect())


def test_latest_on_partition_by(spark, trades):
    out = questdb_sql(
        spark,
        "SELECT * FROM trades LATEST ON ts PARTITION BY sym",
        {"trades": "ts"},
    )
    got = {r.sym: r.ts for r in out.collect()}
    assert got == {
        "AAA": _ts("2024-01-02 03:15:00"),
        "BBB": _ts("2024-01-02 03:15:00"),
    }


def test_sample_by_with_first_last(spark, trades):
    out = questdb_sql(
        spark,
        "SELECT ts, sym, first(price) open, last(price) close, "
        "sum(qty) volume FROM trades SAMPLE BY 1d",
        {"trades": "ts"},
    )
    rows = {(r.ts, r.sym): (r.open, r.close, r.volume) for r in out.collect()}
    # day 1, AAA: hours 0,1,3 -> first 10.0, last 13.0, qty 100+101+103
    assert rows[(_ts("2024-01-01 00:00:00"), "AAA")] == (10.0, 13.0, 304)
    assert rows[(_ts("2024-01-02 00:00:00"), "BBB")] == (20.0, 23.0, 604)


def test_sample_by_fill_null_densifies(spark, trades):
    out = questdb_sql(
        spark,
        "SELECT ts, sym, avg(price) p FROM trades "
        "WHERE ts IN '2024-01-01' SAMPLE BY 1h FILL(NULL)",
        {"trades": "ts"},
    )
    rows = out.collect()
    # hours 0..3 densified per sym: the empty hour 2 exists with NULL.
    by_key = {(r.ts.hour, r.sym): r.p for r in rows}
    assert by_key[(2, "AAA")] is None
    assert by_key[(0, "AAA")] == 10.0
    assert len(rows) == 8  # 4 hours x 2 syms


def test_interval_search_rewrite(spark, trades):
    out = questdb_sql(
        spark,
        "SELECT sym, qty FROM trades WHERE ts IN '2024-01-02' "
        "ORDER BY qty DESC LIMIT 2",
        {"trades": "ts"},
    )
    assert [r.qty for r in out.collect()] == [203, 203]


def test_asof_join_lowering(spark, trades):
    quotes = spark.createDataFrame(
        [
            (_ts("2024-01-01 00:00:00"), "AAA", 1.0),
            (_ts("2024-01-01 02:00:00"), "AAA", 2.0),
            (_ts("2024-01-01 00:30:00"), "BBB", 5.0),
        ],
        "qts timestamp, sym string, bid double",
    )
    quotes.createOrReplaceTempView("quotes")
    out = questdb_sql(
        spark,
        "SELECT * FROM trades ASOF JOIN quotes ON sym "
        "WHERE ts IN '2024-01-01'",
        {"trades": "ts", "quotes": "qts"},
    )
    got = {(r.sym, r.ts.hour): r.bid for r in out.collect()}
    assert got[("AAA", 0)] == 1.0   # 00:15 -> 00:00 quote
    assert got[("AAA", 1)] == 1.0   # 01:15 -> still 00:00
    assert got[("AAA", 3)] == 2.0   # 03:15 -> 02:00 quote
    assert got[("BBB", 0)] is None  # 00:15 precedes BBB's 00:30 quote


def test_negative_limit_is_tail(spark, trades):
    out = questdb_sql(
        spark,
        "SELECT ts, sym, qty FROM trades WHERE sym = 'AAA' LIMIT -2",
        {"trades": "ts"},
    )
    got = [r.qty for r in out.collect()]
    assert got == [201, 203]  # last two rows in ts order, ascending


def test_unsupported_fragment_raises(spark, trades):
    with pytest.raises(QuestDBSQLError, match="unsupported fragment"):
        questdb_sql(
            spark,
            "SELECT * FROM trades LATEST ON ts PARTITION BY sym "
            "UNION ALL SELECT * FROM trades",
            {"trades": "ts"},
        )


def test_sample_by_needs_designated_ts(spark, trades):
    with pytest.raises(QuestDBSQLError, match="designated"):
        questdb_sql(spark, "SELECT ts, sum(qty) q FROM trades SAMPLE BY 1h")


def test_sample_by_calendar_time_zone(spark, trades):
    """Daily buckets in America/New_York: 2024-01-01 00:15 UTC is still
    2023-12-31 wall-clock in NY (UTC-5), so it buckets with the previous
    NY day — boundaries shift relative to UTC daily buckets."""
    out = questdb_sql(
        spark,
        "SELECT ts, count(*) n FROM trades "
        "SAMPLE BY 1d ALIGN TO CALENDAR TIME ZONE 'America/New_York'",
        {"trades": "ts"},
    )
    got = {r.ts: r.n for r in out.collect()}
    # NY day starts at 05:00 UTC: hours 00,01,03 of each UTC day fall in
    # the PREVIOUS NY day. 2 syms x 3 hours = 6 rows per UTC day.
    assert got == {
        _ts("2023-12-31 05:00:00"): 6,  # Jan 1 00/01/03 UTC
        _ts("2024-01-01 05:00:00"): 6,  # Jan 2 00/01/03 UTC
    }


def test_lt_join_is_strict(spark, trades):
    quotes = spark.createDataFrame(
        [(_ts("2024-01-01 00:15:00"), "AAA", 9.0)],
        "qts timestamp, sym string, bid double",
    )
    quotes.createOrReplaceTempView("quotes")
    out = questdb_sql(
        spark,
        "SELECT * FROM trades LT JOIN quotes ON sym "
        "WHERE ts IN '2024-01-01T00'",
        {"trades": "ts", "quotes": "qts"},
    )
    got = {(r.sym, r.ts): r.bid for r in out.collect()}
    # AAA trade at exactly 00:15 must NOT see the equal-ts quote (strict <).
    assert got[("AAA", _ts("2024-01-01 00:15:00"))] is None
