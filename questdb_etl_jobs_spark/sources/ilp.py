"""QuestDB ILP (InfluxDB Line Protocol) sink — text over TCP.

QuestDB's high-throughput ingest path is ILP on port 9009 (the reference
deploys QuestDB with the PG-wire INSERT path instead — cloud_function.py:81-95
via DSN README.md:107 — which this repo covers in sources/jdbc.py; ILP is the
path QuestDB itself documents for bulk loads, and unlike JDBC it needs no
driver jar, so it is fully testable here against a loopback socket server).

Spark-first split of the work:

- **Line formatting is a Column expression** (:func:`ilp_line`): escaping,
  integer/float/string/bool field encoding, and the nanosecond designated
  timestamp are all built from ``concat``/``regexp_replace``/``unix_micros``
  — whole-stage-codegen JVM work, vectorized, no Python in the formatting
  hot path. At 100 TB the expensive part of ILP export is string assembly,
  and it stays JVM-side.
- **Only the socket write is Python** (:func:`write_ilp`):
  ``foreachPartition`` opens ONE connection per partition and streams the
  pre-rendered lines in buffered chunks. ``num_partitions`` caps concurrent
  connections (coalesce first — a 1000-executor cluster must not open 1000
  sockets against one QuestDB).

Wire-format rules implemented (public QuestDB ILP docs):

- ``table,sym1=v1,sym2=v2 field1=1i,field2=2.5,field3="s" <ts_ns>\\n``
- symbol values escape ``\\`` `` `` ``,`` ``=``; string fields are
  double-quoted escaping ``\\`` ``"`` and newline (as ``\\n``);
- integer fields carry an ``i`` suffix, booleans are ``t``/``f``, floats
  are plain decimal, non-designated timestamp fields are micros + ``t``;
- the trailing designated timestamp is integer NANOSECONDS since epoch;
  a NULL designated ts omits the trailing field (server assigns);
- NULL symbols/fields are omitted from the line (ILP has no null literal).

Delivery semantics (documented, matching QuestDB behavior): ILP is
fire-and-forget — the server reports no per-line ack and disconnects on
malformed input, so a single connection delivers at-most-once. Under
Spark's DEFAULT task retries, though, the SINK is at-least-once: a
mid-partition socket failure fails the task, the retry re-opens a
connection and re-sends the partition from the start, duplicating the
already-delivered prefix. When duplicates matter, either create the
target with ``DEDUP UPSERT KEYS`` (plans/designated.py renders the DDL;
QuestDB then makes the re-send idempotent) or set
``spark.task.maxFailures=1`` and treat a failed job as a partial load.
"""

from __future__ import annotations

import socket
from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

DEFAULT_ILP_PORT = 9009

_SYMBOL_ESCAPES = (("\\", "\\\\"), (",", "\\,"), ("=", "\\="), (" ", "\\ "))
_STRING_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"))


def _escaped(col: Column, rules) -> Column:
    # plain replace (not regexp) — literal, order matters: backslash first
    for old, new in rules:
        col = F.replace(col, F.lit(old), F.lit(new))
    return col


def escape_symbol(col: Column) -> Column:
    """Escape a symbol (tag) value for the ILP tag set."""
    return _escaped(col.cast("string"), _SYMBOL_ESCAPES)


def escape_measurement(name: str) -> str:
    """Escape a table (measurement) name — driver-side, it's a literal."""
    out = name
    for old, new in (("\\", "\\\\"), (",", "\\,"), (" ", "\\ ")):
        out = out.replace(old, new)
    return out


def _field_fragment(name: str, col: Column, dtype: T.DataType) -> Column:
    """``name=value`` fragment encoded per the column's Spark type, NULL
    when the value is NULL (concat_ws then drops it from the line)."""
    key = F.lit(escape_measurement(name) + "=")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        val = F.concat(col.cast("string"), F.lit("i"))
    elif isinstance(dtype, (T.FloatType, T.DoubleType)):
        # double->string gives Java shortest-repr, which switches to
        # E-notation outside [1e-3, 1e7) ("1.0E7") and spells non-finite
        # values "NaN"/"Infinity" — both malformed ILP that makes the
        # server drop the connection (and, fire-and-forget, every
        # subsequent line on it). Non-finite: omit the field, the NULL
        # path — ILP has no NaN literal and QuestDB stores missing as
        # null. Out-of-range magnitudes: printf %f renders plain decimal
        # with an exact integer part; >=1e7 keeps >=8 integer digits so
        # 10 fraction digits preserve the 17 significant digits a double
        # round-trip needs, and <1e-3 gets 345 fraction digits (enough
        # for the smallest subnormal, 4.9e-324). All Column expressions —
        # the hot path (in-range values) stays the cheap cast.
        d = col.cast("double")
        finite = ~F.isnan(d) & (F.abs(d) != F.lit(float("inf")))
        in_plain = (F.abs(d) < 1e7) & ((F.abs(d) >= 1e-3) | (d == 0.0))
        val = F.when(
            in_plain, col.cast("string")
        ).when(
            F.abs(d) >= 1e7, F.format_string("%.10f", d)
        ).otherwise(F.format_string("%.345f", d))
        return F.when(col.isNotNull() & finite, F.concat(key, val))
    elif isinstance(dtype, T.BooleanType):
        val = F.when(col, F.lit("t")).otherwise(F.lit("f"))
    elif isinstance(dtype, T.TimestampType):
        val = F.concat(F.unix_micros(col).cast("string"), F.lit("t"))
    elif isinstance(dtype, (T.StringType, T.VarcharType, T.CharType)):
        val = F.concat(F.lit('"'), _escaped(col, _STRING_ESCAPES), F.lit('"'))
    else:
        raise TypeError(f"ILP cannot encode field {name!r} of type {dtype}")
    return F.when(col.isNotNull(), F.concat(key, val))


def ilp_line(
    df: DataFrame,
    table: str,
    symbol_cols: Iterable[str] = (),
    ts_col: str | None = None,
) -> Column:
    """One ILP line per row as a single string Column (no trailing newline).

    ``symbol_cols`` become the ILP tag set (QuestDB SYMBOL columns);
    ``ts_col`` (TimestampType) becomes the trailing designated timestamp in
    nanoseconds; every remaining column is a typed field (see module doc).
    """
    symbol_cols = tuple(symbol_cols)
    field_names = [
        f.name
        for f in df.schema.fields
        if f.name not in symbol_cols and f.name != ts_col
    ]
    schema = {f.name: f.dataType for f in df.schema.fields}

    head = F.lit(escape_measurement(table))
    for s in symbol_cols:
        frag = F.when(
            F.col(s).isNotNull(),
            F.concat(F.lit("," + escape_measurement(s) + "="), escape_symbol(F.col(s))),
        )
        head = F.concat(head, F.coalesce(frag, F.lit("")))

    fields = F.concat_ws(
        ",", *[_field_fragment(n, F.col(n), schema[n]) for n in field_names]
    )
    line = F.when(fields != "", F.concat(head, F.lit(" "), fields)).otherwise(head)

    if ts_col is not None:
        if not isinstance(schema[ts_col], T.TimestampType):
            raise TypeError(f"designated ts column {ts_col!r} must be TimestampType")
        ns = (F.unix_micros(F.col(ts_col)) * F.lit(1000)).cast("string")
        line = F.concat(
            line,
            F.coalesce(
                F.when(F.col(ts_col).isNotNull(), F.concat(F.lit(" "), ns)),
                F.lit(""),
            ),
        )
    return line


def _partition_sender(host: str, port: int, buffer_bytes: int):
    """Build the per-partition socket writer (self-contained closure —
    serialized to executors; no driver state captured beyond host/port)."""

    def send(rows: Iterator) -> None:
        buf = bytearray()
        sock: socket.socket | None = None
        for row in rows:
            if sock is None:  # lazy: empty partitions open no connection
                sock = socket.create_connection((host, port))
            buf += row[0].encode("utf-8")
            buf += b"\n"
            if len(buf) >= buffer_bytes:
                sock.sendall(buf)
                buf.clear()
        if sock is not None:
            if buf:
                sock.sendall(buf)
            sock.close()

    return send


def write_ilp(
    df: DataFrame,
    table: str,
    host: str = "localhost",
    port: int = DEFAULT_ILP_PORT,
    symbol_cols: Iterable[str] = (),
    ts_col: str | None = None,
    num_partitions: int | None = None,
    buffer_bytes: int = 64 * 1024,
) -> None:
    """Stream ``df`` to a QuestDB ILP endpoint.

    One TCP connection and one buffered byte stream per partition; line
    rendering happens JVM-side before the rows reach Python (the iterator
    yields already-formatted strings — Python only concatenates and
    ``sendall``s ``buffer_bytes`` chunks).
    """
    lines = df.select(ilp_line(df, table, symbol_cols, ts_col).alias("line"))
    if num_partitions is not None:
        lines = lines.coalesce(num_partitions)
    lines.foreachPartition(_partition_sender(host, port, buffer_bytes))


def write_purchases_ilp(df: DataFrame, host: str = "localhost",
                        port: int = DEFAULT_ILP_PORT, **kwargs) -> None:
    """ILP twin of sources/jdbc.py:write_purchases — typed purchase rows to
    the ``purchases`` table (reference sql/create-table.sql:1: buyer STRING,
    int fields, purchase_date designated ts). ``buyer`` rides as a SYMBOL:
    it is a repeated dimension value, QuestDB's symbol dictionary is the
    right encoding, and it keeps the field set purely numeric."""
    write_ilp(
        df,
        "purchases",
        host=host,
        port=port,
        symbol_cols=("buyer",),
        ts_col="purchase_date",
        **kwargs,
    )
