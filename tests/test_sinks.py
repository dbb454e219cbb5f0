"""Sinks: sorted CSV export (S5) and multimodal decode plumbing (U2)."""

from __future__ import annotations

import csv
from datetime import datetime
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from questdb_etl_jobs_spark.operators.multimodal import (
    attach_media,
    decode_media,
    sample_frames,
)
from questdb_etl_jobs_spark.sources.csv_source import write_sorted_csv


def test_write_sorted_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("b", 2, datetime.fromisoformat("2024-01-01 11:00:00")),
            ("a", 1, datetime.fromisoformat("2024-01-01 10:00:00")),
            ("c", 3, datetime.fromisoformat("2024-01-01 09:00:00")),
        ],
        "name string, n long, ts timestamp",
    )
    out = tmp_path / "export"
    write_sorted_csv(df, str(out), ts_col="ts", single_file=True)
    files = list(Path(out).glob("part-*.csv"))
    assert len(files) == 1  # single_file reproduces the reference export
    with open(files[0], newline="") as fh:
        rows = list(csv.reader(fh))
    assert [r[0] for r in rows] == ["c", "a", "b"]  # time-sorted
    assert rows[0][2] == "2024-01-01T09:00:00"  # reference wire pattern


def test_jdbc_writer_options(spark):
    # No JDBC driver/DB in this environment: cover option construction
    # (batched inserts, bounded connections) without connecting.
    from questdb_etl_jobs_spark.sources.jdbc import jdbc_options, jdbc_writer

    opts = jdbc_options("purchases", batchsize=5000)
    assert opts["dbtable"] == "purchases"
    assert opts["batchsize"] == "5000"
    assert opts["url"].startswith("jdbc:postgresql://")
    assert opts["isolationLevel"] == "NONE"
    # The writer builds without touching the network.
    df = spark.createDataFrame([(1,)], "id long")
    writer = jdbc_writer(df, "purchases", batchsize=5000, num_partitions=2)
    assert writer is not None


class _LoopbackIlpServer:
    """Minimal QuestDB-shaped ILP endpoint: accepts N concurrent TCP
    connections, accumulates every byte until each client closes."""

    def __init__(self):
        import socket as _socket
        import threading

        self._sock = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
        self._sock.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(16)
        self.port = self._sock.getsockname()[1]
        self.chunks: list[bytes] = []
        self._lock = threading.Lock()
        self._threads: list[threading.Thread] = []
        self._accepting = threading.Thread(target=self._accept_loop, daemon=True)
        self._accepting.start()

    def _accept_loop(self):
        import threading

        while True:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._drain, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _drain(self, conn):
        data = bytearray()
        while chunk := conn.recv(65536):
            data += chunk
        conn.close()
        with self._lock:
            self.chunks.append(bytes(data))

    def close(self) -> bytes:
        self._sock.close()
        self._accepting.join(timeout=5)
        for t in self._threads:
            t.join(timeout=5)
        return b"".join(self.chunks)


def test_ilp_sink_golden_against_loopback_server(spark):
    """S4 made verifiable: stream the reference fixture through the full
    pipeline (anonymize/cast) into the ILP sink over a real loopback TCP
    socket, and byte-compare every received line against a CPython oracle
    that recomputes the expected ILP from the raw CSV (sha1 + epoch-ns)."""
    import csv as _csv
    import hashlib
    from datetime import datetime, timezone

    from questdb_etl_jobs_spark.pipeline import anonymize_and_cast, split_quarantine
    from questdb_etl_jobs_spark.sources.csv_source import read_purchases_csv
    from questdb_etl_jobs_spark.sources.ilp import write_purchases_ilp

    from conftest import FIXTURES

    small = str(FIXTURES / "purchases_small.csv")
    good, _bad = split_quarantine(anonymize_and_cast(read_purchases_csv(spark, small)))

    server = _LoopbackIlpServer()
    try:
        # 2 partitions → 2 concurrent connections: order across connections
        # is not defined, so the golden comparison is a multiset of lines.
        write_purchases_ilp(
            good, host="127.0.0.1", port=server.port, num_partitions=2
        )
    finally:
        received = server.close()

    got = sorted(received.decode().splitlines())

    expected = []
    with open(small, newline="") as fh:
        for email, item_id, quantity, price, ts in _csv.reader(fh):
            digest = hashlib.sha1(email.encode()).hexdigest()
            dt = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S").replace(
                tzinfo=timezone.utc
            )
            ns = int(dt.timestamp()) * 1_000_000_000
            expected.append(
                f"purchases,buyer={digest} "
                f"item_id={int(item_id)}i,quantity={int(quantity)}i,"
                f"price={int(price)}i {ns}"
            )
    assert got == sorted(expected)
    assert received.endswith(b"\n")


def test_ilp_line_escaping_and_types(spark):
    """Wire-format unit coverage: symbol escaping, string quoting, float/
    bool/timestamp field encodings, NULL omission, no-designated-ts form."""
    from datetime import datetime

    from questdb_etl_jobs_spark.sources.ilp import ilp_line

    df = spark.createDataFrame(
        [
            ("host a,b=c\\d", 'say "hi"\nthere', 1.5, True,
             datetime.fromisoformat("2021-03-21 09:00:10"),
             datetime.fromisoformat("2021-03-21 09:00:10")),
            (None, None, None, None, None,
             datetime.fromisoformat("2021-03-21 09:00:11")),
        ],
        "tag string, msg string, x double, ok boolean, seen timestamp, "
        "ts timestamp",
    )
    lines = [
        r[0]
        for r in df.select(
            ilp_line(df, "t 1", symbol_cols=("tag",), ts_col="ts")
        ).collect()
    ]
    base_us = 1616317210_000000
    assert lines[0] == (
        "t\\ 1,tag=host\\ a\\,b\\=c\\\\d "
        f'msg="say \\"hi\\"\\nthere",x=1.5,ok=t,seen={base_us}t '
        f"{base_us * 1000}"
    )
    # all-null symbols/fields: bare measurement + designated ts only
    assert lines[1] == f"t\\ 1 {(base_us + 1_000_000) * 1000}"


def test_ilp_float_rendering_plain_decimal_and_nonfinite(spark):
    """Doubles outside Java shortest-repr's plain range ([1e-3, 1e7))
    must render plain decimal (no 'E'), non-finite doubles must be
    OMITTED (malformed ILP would drop the whole connection), and every
    rendered value must round-trip to the exact input double."""
    from questdb_etl_jobs_spark.sources.ilp import ilp_line

    vals = [1.5, 0.0, -0.0, 1e7, 1.2345678901234567e18, -4.9e-324,
            1e-4, 12345678.9, float("nan"), float("inf"), float("-inf")]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, x double")
    lines = {r["i"]: r["l"] for r in df.select(
        "i", ilp_line(df, "t", symbol_cols=("i",)).alias("l")).collect()}
    for i, v in enumerate(vals):
        if v != v or v in (float("inf"), float("-inf")):
            assert lines[i] == f"t,i={i}", (i, v, lines[i])  # field omitted
            continue
        rendered = lines[i].split("x=", 1)[1]
        assert "e" not in rendered.lower(), (v, rendered)
        assert float(rendered) == v, (v, rendered)
    # in-range values keep the compact shortest repr
    assert lines[0].endswith("x=1.5")


def test_multimodal_decode_quarantines_bad_payload(spark):
    df = spark.createDataFrame(
        [(1, b"payload-bytes"), (2, b"")],  # empty payload = corrupt media
        "doc_id long, payload binary",
    )
    decoded = decode_media(attach_media(df, "payload"), "doc_id", "payload")
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert rows[1]["width"] is not None and len(rows[1]["feature"]) == 8
    assert rows[2]["width"] is None  # bad media → NULLs, not a dead batch
    assert rows[2]["n_bytes"] == 0


def test_resize_decoded(spark):
    from questdb_etl_jobs_spark.operators.multimodal import resize_decoded

    df = spark.createDataFrame(
        [(1, b"payload-bytes"), (2, b"")],
        "doc_id long, payload binary",
    )
    decoded = decode_media(attach_media(df, "payload"), "doc_id", "payload")
    orig = {r["doc_id"]: r for r in decoded.collect()}
    resized = {
        r["doc_id"]: r for r in resize_decoded(decoded, 128, 128).collect()
    }
    ok = resized[1]
    assert (ok["width"], ok["height"]) == (128, 128)
    scale = (128 * 128) / (orig[1]["width"] * orig[1]["height"])
    assert ok["feature"][0] == pytest.approx(orig[1]["feature"][0] * scale, rel=1e-6)
    # Quarantined decode (NULL attrs) passes through untouched.
    assert resized[2]["width"] is None and resized[2]["feature"] is None


def test_sample_frames_stride(spark):
    df = spark.createDataFrame([(1, 10), (2, 1)], "doc_id long, n_frames int")
    out = sample_frames(df, "n_frames", every=4)
    got = sorted((r["doc_id"], r["frame_idx"]) for r in out.collect())
    assert got == [(1, 0), (1, 4), (1, 8), (2, 0)]


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from questdb_etl_jobs_spark.sources.json_source import read_jsonl, write_jsonl

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "v": "a"}\n'
        "this is not json\n"
        '{"id": "NaNope", "v": "c"}\n'  # wrong type -> corrupt under schema
        '{"id": 4, "v": "d"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    # Cache before corrupt-only queries: Spark disallows plans that read
    # ONLY _corrupt_record from a raw JSON scan (see read_jsonl docstring).
    df = read_jsonl(spark, str(src), schema).cache()
    good = df.filter(df._corrupt_record.isNull()).select("id", "v")
    bad = df.filter(df._corrupt_record.isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    assert bad.count() == 2  # the non-JSON line and the mistyped id
    out = tmp_path / "out"
    write_jsonl(good, str(out), mode="overwrite")
    back = read_jsonl(spark, str(out), schema)
    assert sorted(r["id"] for r in back.collect()) == [1, 4]


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    """S3 family, second columnar format: ORC write/read round-trips the
    engine's typed rows (incl. timestamp + array) byte-for-byte."""
    df = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 1, 12, 0, 5), [0.5, 1.5]),
         (2, "b", datetime(2024, 1, 2, 3, 4, 5), [2.0])],
        "id long, s string, ts timestamp, v array<double>",
    )
    path = str(tmp_path / "orc")
    df.write.format("orc").save(path)
    back = spark.read.format("orc").load(path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A long-lived 100 TB table gains columns over time: old files lack
    the new column, mergeSchema unions the footers and backfills NULL."""
    path = str(tmp_path / "t")
    spark.range(0, 3).select(F.col("id")).write.parquet(path)
    spark.range(3, 5).select(
        F.col("id"), (F.col("id") * 10).alias("score")
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {0: None, 1: None, 2: None, 3: 30, 4: 40}


def test_compact_designated_one_sorted_file_per_partition(spark, tmp_path):
    """Many small appends -> compaction leaves exactly one parquet file
    per partition dir, rows intact and time-sorted within each file."""
    from questdb_etl_jobs_spark.plans.designated import (
        compact_designated,
        write_designated_ts,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # 4 appends x 2 days, deliberately unsorted within each append.
    for i in range(4):
        df = spark.createDataFrame(
            [(i * 10 + j, datetime(2024, 1, 1 + (j % 2), 12, 59 - i, j))
             for j in range(6)],
            "id long, ts timestamp",
        )
        write_designated_ts(df, src, "ts")
    compact_designated(spark, src, dst, "ts")

    per_dir = {}
    for d in Path(dst).glob("ts_pdate=*"):
        per_dir[d.name] = [f for f in d.glob("*.parquet")]
    assert set(per_dir) == {"ts_pdate=2024-01-01", "ts_pdate=2024-01-02"}
    assert all(len(files) == 1 for files in per_dir.values())
    before = sorted(map(tuple, spark.read.parquet(src).drop("ts_pdate").collect()))
    after = sorted(map(tuple, spark.read.parquet(dst).drop("ts_pdate").collect()))
    assert before == after and len(after) == 24
    for files in per_dir.values():  # each file internally time-ordered
        ts = [r["ts"] for r in spark.read.parquet(str(files[0])).collect()]
        assert ts == sorted(ts)


def test_write_designated_ts_files_time_ordered(spark, tmp_path):
    """Regression: with partitionBy, the file writer injects a sort on
    the partition column alone unless the task ordering already leads
    with it — which silently destroyed within-file ts order. Each
    written file must be time-sorted."""
    from questdb_etl_jobs_spark.plans.designated import write_designated_ts

    df = spark.createDataFrame(
        [(j, datetime(2024, 1, 1 + (j % 2), 23 - j % 24, j % 60, 0))
         for j in range(50)],
        "id long, ts timestamp",
    ).coalesce(1)
    path = str(tmp_path / "t")
    write_designated_ts(df, path, "ts")
    for f in Path(path).glob("ts_pdate=*/*.parquet"):
        ts = [r["ts"] for r in spark.read.parquet(str(f)).collect()]
        assert ts == sorted(ts), f


def test_upsert_designated_ts_merge_semantics(spark, tmp_path):
    """QuestDB DEDUP UPSERT KEYS semantics: batch rows replace stored
    rows with matching (ts, keys), new rows append, untouched date
    partitions are not rewritten (their files stay byte-identical)."""
    from questdb_etl_jobs_spark.plans.designated import (
        upsert_designated_ts,
        write_designated_ts,
    )

    def ts(d, h):
        return datetime(2024, 1, d, h, 0, 0)

    initial = spark.createDataFrame(
        [
            ("a", ts(1, 10), 100.0),
            ("b", ts(1, 11), 110.0),
            ("a", ts(2, 10), 200.0),
            ("a", ts(3, 10), 300.0),  # untouched partition
        ],
        "sym string, ts timestamp, px double",
    )
    path = str(tmp_path / "t")
    write_designated_ts(initial, path, "ts")
    d3_files = {
        (p.name, p.stat().st_mtime_ns, p.stat().st_size)
        for p in Path(path).glob("ts_pdate=2024-01-03/*.parquet")
    }
    assert d3_files

    batch = spark.createDataFrame(
        [
            ("a", ts(1, 10), 101.0),   # replaces stored day-1 row
            ("c", ts(1, 12), 120.0),   # new key day 1
            ("b", ts(2, 10), 210.0),   # new key day 2
            # within-batch duplicate (ts, key): max value wins
            ("d", ts(2, 11), 4.0),
            ("d", ts(2, 11), 7.0),
        ],
        "sym string, ts timestamp, px double",
    )
    upsert_designated_ts(spark, batch, path, "ts", keys=["sym"])

    from questdb_etl_jobs_spark.plans.designated import read_designated_ts

    got = {
        (r.sym, r.ts, r.px)
        for r in read_designated_ts(spark, path, "ts").collect()
    }
    assert got == {
        ("a", ts(1, 10), 101.0),
        ("b", ts(1, 11), 110.0),
        ("c", ts(1, 12), 120.0),
        ("a", ts(2, 10), 200.0),
        ("b", ts(2, 10), 210.0),
        ("d", ts(2, 11), 7.0),
        ("a", ts(3, 10), 300.0),
    }
    # untouched day-3 partition: identical files, not rewritten
    assert {
        (p.name, p.stat().st_mtime_ns, p.stat().st_size)
        for p in Path(path).glob("ts_pdate=2024-01-03/*.parquet")
    } == d3_files
    # idempotence: re-upserting the same batch changes nothing
    upsert_designated_ts(spark, batch, path, "ts", keys=["sym"])
    again = {
        (r.sym, r.ts, r.px)
        for r in read_designated_ts(spark, path, "ts").collect()
    }
    assert again == got


def test_jdbc_sink_executes_against_embedded_derby(spark):
    """Round-9 verdict task #3: the JDBC sink path had never EXECUTED
    (no driver jar / DB in the sandbox). Spark's own distribution ships
    Apache Derby for its Hive metastore, so jdbc:derby:memory: runs
    df.write.format("jdbc") for real, in-JVM, zero new dependencies:
    batched partition-parallel append → read back → value equality vs
    the input. The QuestDB deployment swaps url+driver (PG wire); the
    Spark writer machinery being exercised is identical."""
    from questdb_etl_jobs_spark.sources.jdbc import jdbc_writer

    url = "jdbc:derby:memory:qdbsink;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    rows = [
        ("alice@example.com", 3, 19.99, datetime(2024, 1, 1, 10, 0, 0)),
        ("bob@example.com", 1, 5.25, datetime(2024, 1, 1, 11, 30, 0)),
        ("carol@example.com", 7, 123.0, datetime(2024, 1, 2, 9, 15, 42)),
        ("dave@example.com", 2, 0.5, datetime(2024, 1, 3, 23, 59, 59)),
    ]
    df = spark.createDataFrame(
        rows, "email string, qty int, price double, ts timestamp"
    ).repartition(2)  # partition-parallel append: 2 concurrent writers

    jdbc_writer(
        df, "purchases_t", num_partitions=2,
        url=url, driver=driver, user="app", password="app", batchsize=2,
    ).save()
    # Second append on the existing table (the reference's hourly-run
    # model appends forever; mode must not recreate or truncate).
    extra = [("eve@example.com", 9, 42.0, datetime(2024, 1, 4, 0, 0, 0))]
    jdbc_writer(
        spark.createDataFrame(
            extra, "email string, qty int, price double, ts timestamp"
        ),
        "purchases_t", url=url, driver=driver, user="app", password="app",
    ).save()

    back = (
        spark.read.format("jdbc")
        .options(url=url, dbtable="purchases_t", driver=driver,
                 user="app", password="app")
        .load()
    )
    assert [f.name.lower() for f in back.schema.fields] == [
        "email", "qty", "price", "ts",
    ]
    got = sorted(
        (r.email, r.qty, r.price, r.ts) for r in back.collect()
    )
    assert got == sorted(rows + extra)
