"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

The designated-timestamp convention (plans/designated.py) gives 1-D
locality on time. A query that box-filters on two *non-time* dimensions
(part × supplier, user × day, lat × lon) gets nothing from a time
layout: every file's [min, max] for both columns spans the whole domain,
so parquet row-group stats prune zero files. Interleaving the key bits
(the Z-order / Morton curve) makes each file cover a contiguous curve
segment — a small rectangle-ish region of the 2-D key space — so a box
predicate intersects only a few files and min/max stats become an
effective two-dimensional index.

Scale shape: the z-write is one range shuffle (``repartitionByRange`` on
the z-value, sampled range boundaries → balanced files) plus an
in-partition sort — the cost of any global sort, paid once — and every
subsequent box query drops from O(table) to O(matching curve segments)
scanned. This is the standard lakehouse layout move (Delta/Iceberg
``OPTIMIZE ... ZORDER BY``) expressed in open Spark: an expression and a
writer convention, no table format required.

The bit-spreading uses the classic 5-step shift-and-mask ladder, pure
integer codegen (no UDF, no string ops); the DuckDB oracle for the
declared query replays the identical ladder so the z-values are verified
bit-for-bit cross-engine (queries/training.py::q95).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Shift/mask ladder spreading the low 32 bits of a long to the even bit
#: positions (bit i → bit 2i). Shared with the SQL oracle generator.
SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(v: Column) -> Column:
    """Spread bits 0..31 of ``v`` to even positions 0,2,..,62."""
    for shift, mask in SPREAD_STEPS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def z_value(x: Column | str, y: Column | str) -> Column:
    """Morton z-value of two non-negative integer keys (bigint Column).

    Bit i of ``x`` lands at position 2i, bit i of ``y`` at 2i+1. Keys
    must fit in 31 bits (the curve then fits in a positive 63-bit long);
    wider domains should be bucketed first (e.g. ``F.shiftright`` or a
    quantile bucketizer) — skipping only needs *locality*, not identity.
    """
    xs = _spread_bits(F.col(x).cast("long") if isinstance(x, str) else x.cast("long"))
    ys = _spread_bits(F.col(y).cast("long") if isinstance(y, str) else y.cast("long"))
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def z_value_py(x: int, y: int) -> int:
    """CPython mirror of ``z_value`` (same ladder) for tests/oracles."""

    def spread(v: int) -> int:
        for shift, mask in SPREAD_STEPS:
            v = (v | (v << shift)) & mask
        return v

    return spread(x) | (spread(y) << 1)


def z_value_sql(x_expr: str, y_expr: str) -> str:
    """ANSI-SQL expression computing ``z_value`` — the identical ladder,
    for DuckDB oracles. All arithmetic stays in BIGINT."""

    def spread(expr: str) -> str:
        for shift, mask in SPREAD_STEPS:
            expr = f"(({expr} | ({expr} << {shift})) & {mask})"
        return expr

    return f"({spread(f'CAST({x_expr} AS BIGINT)')} | ({spread(f'CAST({y_expr} AS BIGINT)')} << 1))"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of ``cols``.

    ``repartitionByRange`` on the z-value gives each output file a
    contiguous curve segment (range boundaries come from a sampled sort,
    so files are balanced even on skewed keys); the in-partition sort
    tightens row-group min/max stats inside each file. The z column is
    layout-only and is not written.
    """
    z = z_value(cols[0], cols[1]).alias("__z")
    parts = (
        df.select("*", z)
        .repartitionByRange(*( [n_files] if n_files else [] ), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    parts.write.mode(mode).parquet(path)


def file_minmax(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per-file [min, max] of ``cols`` from parquet footers (no data read).

    This is exactly the metadata a scan's stats-based skipping consults;
    tests use it to count how many files a box predicate could touch.
    """
    import pyarrow.parquet as pq
    import os

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, name)).metadata
        ranges: dict[str, tuple] = {}
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                cname = col.path_in_schema
                if cname not in cols or col.statistics is None:
                    continue
                st = col.statistics
                lo, hi = ranges.get(cname, (st.min, st.max))
                ranges[cname] = (min(lo, st.min), max(hi, st.max))
        out.append({"file": name, **ranges})
    return out
