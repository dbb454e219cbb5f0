"""Z-order (Morton-curve) clustering for multi-dimensional data skipping.

The designated-timestamp convention (plans/designated.py) gives 1-D
locality on time. A query that box-filters on two or more *non-time*
dimensions (part × supplier, user × day × hour, lat × lon) gets nothing
from a time layout: every file's [min, max] for those columns spans the
whole domain, so parquet row-group stats prune zero files. Interleaving
the key bits (the Z-order / Morton curve) makes each file cover a
contiguous curve segment — a small box-ish region of the n-D key
space — so a box predicate intersects only a few files and min/max
stats become an effective n-dimensional index.

Scale shape: the z-write is one range shuffle (``repartitionByRange`` on
the z-value, sampled range boundaries → balanced files) plus an
in-partition sort — the cost of any global sort, paid once — and every
subsequent box query drops from O(table) to O(matching curve segments)
scanned. This is the standard lakehouse layout move (Delta/Iceberg
``OPTIMIZE ... ZORDER BY``) expressed in open Spark: an expression and a
writer convention, no table format required.

The bit-spreading uses the classic shift-and-mask ladder generalized to
n dimensions (stride-n spreading; the 2-D masks below are the familiar
``0x0000FFFF0000FFFF…`` family), pure integer codegen — no UDF, no
string ops. The DuckDB oracles for the declared queries replay the
identical ladder so z-values are verified bit-for-bit cross-engine
(queries/training.py::q95 for 2-D, ::q102 for 3-D).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_bits(n_dims: int) -> int:
    """Bits available per key so the interleaved value stays a positive
    63-bit long: 31 for 2-D, 21 for 3-D, 15 for 4-D, …"""
    return 63 // n_dims


def spread_steps(n_dims: int) -> tuple[tuple[int, int], ...]:
    """Shift/mask ladder spreading the low ``key_bits(n)`` bits of a long
    to stride-``n`` positions (bit i → bit n·i).

    Step s (descending powers of two) moves the upper half of each
    contiguous s·2-bit group ``s·(n-1)`` positions left, then masks to
    the pattern "s bits set, s·(n-1) bits clear, repeated" — the
    inductive scheme behind the classic 2-D constants, parameterized on
    the stride. Verified bit-for-bit against a naive per-bit mirror in
    tests for n = 2, 3, 4.
    """
    bits = key_bits(n_dims)
    steps = []
    s = 1
    while s < bits:
        s <<= 1
    ladder = []
    while s >= 1:
        group = (1 << s) - 1
        mask = 0
        pos = 0
        while pos < 64:
            mask |= group << pos
            pos += s * n_dims
        # Bit 63 is never data (max data bit = n·key_bits − 1 ≤ 62);
        # clearing it keeps every intermediate positive, which lets the
        # SQL oracle mirror avoid DuckDB's checked-shift overflow error.
        mask &= (1 << 63) - 1
        ladder.append((s * (n_dims - 1), mask))
        s >>= 1
    return tuple(ladder[1:]) if ladder and ladder[0][0] >= 64 else tuple(ladder)


#: 2-D ladder (back-compat export; equals spread_steps(2) restricted to
#: the classic 5 steps). Shared with the SQL oracle generator.
SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _signed64(mask: int) -> int:
    """Spark BIGINT literals are signed; re-express a 64-bit mask."""
    return mask - (1 << 64) if mask >= (1 << 63) else mask


def _spread_bits_n(v: Column, n_dims: int) -> Column:
    for shift, mask in spread_steps(n_dims):
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(
            F.lit(_signed64(mask))
        )
    return v


def z_value_n(*cols: Column | str) -> Column:
    """Morton z-value of n non-negative integer keys (bigint Column).

    Bit i of column j lands at position n·i + j. Each key must fit in
    ``key_bits(n)`` bits (the curve then fits in a positive 63-bit
    long); wider domains should be bucketed first (``F.shiftright`` or
    a quantile bucketizer) — skipping only needs *locality*, not
    identity.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z_value_n needs at least 2 columns")
    out = None
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        spread = _spread_bits_n(col.cast("long"), n)
        part = F.shiftleft(spread, j) if j else spread
        out = part if out is None else out.bitwiseOR(part)
    return out


def z_value(x: Column | str, y: Column | str) -> Column:
    """2-D Morton z-value (see :func:`z_value_n`)."""
    return z_value_n(x, y)


def z_value_py(*keys: int) -> int:
    """CPython mirror of ``z_value_n`` (same ladder) for tests/oracles."""
    n = len(keys)

    def spread(v: int) -> int:
        for shift, mask in spread_steps(n):
            v = (v | (v << shift)) & mask
        return v

    out = 0
    for j, k in enumerate(keys):
        out |= spread(k) << j
    return out


def z_value_py_naive(*keys: int) -> int:
    """Per-bit reference implementation (no ladder) — test oracle only."""
    n = len(keys)
    out = 0
    for j, k in enumerate(keys):
        for i in range(key_bits(n)):
            out |= ((k >> i) & 1) << (n * i + j)
    return out


def z_value_sql(*exprs: str) -> str:
    """ANSI-SQL expression computing ``z_value_n`` — the identical
    ladder, for DuckDB oracles. All arithmetic stays in BIGINT.

    Algebraically restated as ``(v & M) | ((v & (M >> s)) << s)`` —
    identical result to the post-mask form, but the operand is masked
    BEFORE the shift so no intermediate overflows the signed 63-bit
    range (DuckDB's ``<<`` is checked and errors on overflow; Spark's
    wraps)."""
    n = len(exprs)

    def spread(expr: str) -> str:
        for shift, mask in spread_steps(n):
            pre = mask >> shift
            expr = (
                f"(({expr} & {mask}) | "
                f"((({expr} & {pre}) << {shift})))"
            )
        return expr

    parts = [
        f"({spread(f'CAST({e} AS BIGINT)')} << {j})" if j
        else spread(f"CAST({e} AS BIGINT)")
        for j, e in enumerate(exprs)
    ]
    return "(" + " | ".join(parts) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    n_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of ``cols``
    (any number ≥ 2 of integer columns).

    ``repartitionByRange`` on the z-value gives each output file a
    contiguous curve segment (range boundaries come from a sampled sort,
    so files are balanced even on skewed keys); the in-partition sort
    tightens row-group min/max stats inside each file. The z column is
    layout-only and is not written.
    """
    z = z_value_n(*cols).alias("__z")
    parts = (
        df.select("*", z)
        .repartitionByRange(*([n_files] if n_files else []), F.col("__z"))
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
