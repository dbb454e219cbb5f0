"""Distributed purchase-data generator: the reference's entry point 2.

The reference ships a driver-side random generator
(`reference data_generator.py:39-78`): N rows of (lowercase email
@example.com, item id 100–500, quantity 1–10, per-item price 1–200,
current-hour timestamp with random minute/second), sorted by purchase
date, written as a headerless CSV. Two properties matter and are kept:
item→price is a CONSISTENT mapping (the reference draws items from a
pre-generated list, so one item always carries one price), and the
output is time-sorted (QuestDB's append-only ingest order,
`data_generator.py:68-70`).

This twin differs in two deliberate ways:

- **Distributed**: rows derive from ``spark.range(n)`` — the generator
  scales to any N across executors with zero driver materialization,
  and composes with ``write_sorted_csv`` / the streaming fixtures.
- **Deterministic**: every field is a pure codegen derivation of the
  row index via chained ``xxhash64`` (Spark's fixed-seed-42 hash;
  chaining a salt literal yields independent streams) — the same rows
  every run, on any partitioning, under task retry. The CPython mirror
  (`queries/_xxhash.py`) reproduces each field bit-for-bit, so the
  whole generator sits under the differential oracle (q163) instead of
  being unverifiable noise like real randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _salted(id_col: Column, salt: str) -> Column:
    """Independent 64-bit hash stream per salt: Spark chains multi-arg
    xxhash64 as hash(e2, seed=hash(e1, 42))."""
    return F.xxhash64(id_col, F.lit(salt))


def generate_purchases(
    spark: SparkSession,
    n: int,
    hour_start: str,
) -> DataFrame:
    """``n`` deterministic purchase rows for the hour at ``hour_start``
    (ISO, e.g. ``'2021-03-21T11:00:00'``), reference column order:
    (email, item_id, quantity, price, purchase_date), sorted by
    purchase_date. All derivations are integer/pmod codegen off the row
    index — no UDF, no driver loop, no RNG state."""
    from questdb_etl_jobs_spark.operators.sample_by import _parse_utc_us

    base_us = _parse_utc_us(hour_start)
    df = spark.range(n)
    i = F.col("id")
    # Email local part: 6-12 lowercase chars, 5 bits per position from
    # one salted hash (60 of 64 bits used).
    h_len = _salted(i, "len")
    h_chars = _salted(i, "chars")
    length = (F.pmod(h_len, F.lit(7)) + F.lit(6)).cast("int")
    parts = [
        F.when(
            F.lit(j) < length,
            F.substring(
                F.lit(_ALPHABET),
                (F.pmod(F.shiftright(h_chars, 5 * j), F.lit(26)) + 1)
                .cast("int"),
                1,
            ),
        ).otherwise(F.lit(""))
        for j in range(12)
    ]
    email = F.concat(*parts, F.lit("@example.com"))
    item_id = (F.pmod(_salted(i, "item"), F.lit(401)) + F.lit(100)).cast("int")
    # Consistent item->price: price hashes the ITEM ID, not the row.
    price = (
        F.pmod(F.xxhash64(item_id.cast("long"), F.lit("price")), F.lit(200))
        + F.lit(1)
    ).cast("int")
    quantity = (F.pmod(_salted(i, "qty"), F.lit(10)) + F.lit(1)).cast("int")
    offset_s = F.pmod(_salted(i, "min"), F.lit(60)) * 60 + F.pmod(
        _salted(i, "sec"), F.lit(60)
    )
    ts = F.timestamp_micros(
        (F.lit(base_us) + offset_s * F.lit(1_000_000)).cast("long")
    )
    return (
        df.select(
            email.alias("email"),
            item_id.alias("item_id"),
            quantity.alias("quantity"),
            price.alias("price"),
            ts.alias("purchase_date"),
        )
        .orderBy("purchase_date", "email")
    )


def mirror_purchases(n: int, hour_start: str) -> list[tuple]:
    """CPython bit-for-bit mirror of :func:`generate_purchases` — the
    oracle's source of truth (and the proof the derivation is exactly
    what the docstring claims)."""
    import datetime
    import struct

    from questdb_etl_jobs_spark.operators.sample_by import _parse_utc_us
    from questdb_etl_jobs_spark.queries._xxhash import xxh64_signed

    def salted(i: int, salt: str) -> int:
        seed = xxh64_signed(struct.pack("<q", i)) % (1 << 64)
        return xxh64_signed(salt.encode(), seed=seed)

    base = datetime.datetime.fromtimestamp(
        _parse_utc_us(hour_start) / 1e6, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    rows = []
    for i in range(n):
        length = 6 + salted(i, "len") % 7
        h_chars = salted(i, "chars")
        local = "".join(
            _ALPHABET[(h_chars >> (5 * j)) % 26] for j in range(length)
        )
        item_id = 100 + salted(i, "item") % 401
        item_seed = xxh64_signed(struct.pack("<q", item_id)) % (1 << 64)
        price = 1 + xxh64_signed(b"price", seed=item_seed) % 200
        quantity = 1 + salted(i, "qty") % 10
        offset = (salted(i, "min") % 60) * 60 + salted(i, "sec") % 60
        ts = base + datetime.timedelta(seconds=offset)
        rows.append(
            (f"{local}@example.com", item_id, quantity, price, ts)
        )
    rows.sort(key=lambda r: (r[4], r[0]))
    return rows
