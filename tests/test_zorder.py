"""Z-order layout: bit-exact curve + the file-skipping payoff on real
parquet footers (plans/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from questdb_etl_jobs_spark.plans.zorder import (
    file_minmax,
    write_zordered,
    z_value,
    z_value_py,
)

SF = "/root/testdata/sf0.01"
BOX = {"l_partkey": (100, 140), "l_suppkey": (10, 14)}


def test_z_value_matches_python_mirror(spark):
    rows = (
        spark.range(0, 500, 7)
        .select(
            F.col("id").alias("x"),
            (F.col("id") * 13 % 997).alias("y"),
            z_value("id", (F.col("id") * 13 % 997)).alias("z"),
        )
        .collect()
    )
    assert rows, "empty probe set"
    for r in rows:
        assert r["z"] == z_value_py(r["x"], r["y"])


def test_z_value_interleaves_bits(spark):
    # z(1,0)=1, z(0,1)=2, z(3,3)=15, z(2**30, 2**30) = 3 << 60.
    row = spark.range(1).select(
        z_value(F.lit(1), F.lit(0)).alias("a"),
        z_value(F.lit(0), F.lit(1)).alias("b"),
        z_value(F.lit(3), F.lit(3)).alias("c"),
        z_value(F.lit(2**30), F.lit(2**30)).alias("d"),
    ).first()
    assert (row["a"], row["b"], row["c"], row["d"]) == (1, 2, 15, 3 << 60)


def _files_touching_box(stats: list[dict]) -> int:
    n = 0
    for st in stats:
        if all(
            c in st and st[c][0] <= hi and st[c][1] >= lo
            for c, (lo, hi) in BOX.items()
        ):
            n += 1
    return n


def test_zorder_layout_prunes_box_queries(spark, tmp_path):
    """A 2-D box touches few z-ordered files but ~all time-ordered files —
    measured on the footer min/max stats a skipping scan consults."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(li, zpath, ("l_partkey", "l_suppkey"), n_files=16)
    # Contrast layout: clustered by the orderkey (arrival/time order).
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(lpath)
    )

    cols = list(BOX)
    z_touch = _files_touching_box(file_minmax(zpath, cols))
    lin_touch = _files_touching_box(file_minmax(lpath, cols))
    n_z = len(file_minmax(zpath, cols))
    assert n_z >= 8, "range partitioner collapsed the layout"

    # The box spans ~1/500 of each key domain: the curve isolates it to a
    # handful of files, while the time layout leaves every file touching.
    assert z_touch <= n_z // 2, (z_touch, n_z)
    assert lin_touch >= len(file_minmax(lpath, cols)) - 1, lin_touch
    assert z_touch < lin_touch

    # Same data either way: the box query agrees across layouts.
    pred = (
        (F.col("l_partkey").between(*BOX["l_partkey"]))
        & (F.col("l_suppkey").between(*BOX["l_suppkey"]))
    )
    a = spark.read.parquet(zpath).filter(pred).agg(
        F.count("*"), F.sum("l_extendedprice")
    ).first()
    b = spark.read.parquet(lpath).filter(pred).agg(
        F.count("*"), F.sum("l_extendedprice")
    ).first()
    assert a[0] == b[0] and a[0] > 0


def test_z_value_n_matches_naive_reference(spark):
    """3-way and 4-way interleave: Spark column == per-bit reference."""
    from questdb_etl_jobs_spark.plans.zorder import z_value_n, z_value_py_naive

    rows = (
        spark.range(0, 400, 11)
        .select(
            F.col("id").alias("x"),
            (F.col("id") * 13 % 997).alias("y"),
            (F.col("id") * 7 % 463).alias("w"),
            z_value_n("id", (F.col("id") * 13 % 997), (F.col("id") * 7 % 463))
            .alias("z3"),
            z_value_n(
                "id", (F.col("id") * 13 % 997), (F.col("id") * 7 % 463),
                (F.col("id") % 31),
            ).alias("z4"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["z3"] == z_value_py_naive(r["x"], r["y"], r["w"])
        assert r["z4"] == z_value_py_naive(r["x"], r["y"], r["w"], r["x"] % 31)


def test_zorder_3d_layout_prunes_box_queries(spark, tmp_path):
    """A 3-D box touches few files under the 3-column z layout but ~all
    files under the 1-D time layout — footer min/max evidence."""
    box = {
        "l_partkey": (100, 160),
        "l_suppkey": (10, 16),
        "l_linenumber": (1, 2),
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_extendedprice",
    )
    zpath, lpath = str(tmp_path / "z3"), str(tmp_path / "linear")
    write_zordered(
        li, zpath, ("l_partkey", "l_suppkey", "l_linenumber"), n_files=16
    )
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(lpath)
    )

    cols = list(box)

    def touching(stats):
        return sum(
            1
            for st in stats
            if all(
                c in st and st[c][0] <= hi and st[c][1] >= lo
                for c, (lo, hi) in box.items()
            )
        )

    zstats, lstats = file_minmax(zpath, cols), file_minmax(lpath, cols)
    assert len(zstats) >= 8, "range partitioner collapsed the layout"
    assert touching(zstats) <= len(zstats) // 2, (touching(zstats), len(zstats))
    assert touching(lstats) >= len(lstats) - 1
    assert touching(zstats) < touching(lstats)

    pred = (
        F.col("l_partkey").between(*box["l_partkey"])
        & F.col("l_suppkey").between(*box["l_suppkey"])
        & F.col("l_linenumber").between(*box["l_linenumber"])
    )
    a = spark.read.parquet(zpath).filter(pred).agg(
        F.count("*"), F.sum("l_extendedprice")
    ).first()
    b = spark.read.parquet(lpath).filter(pred).agg(
        F.count("*"), F.sum("l_extendedprice")
    ).first()
    assert a[0] == b[0] and a[0] > 0
