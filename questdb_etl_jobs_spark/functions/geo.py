"""Geo functions: QuestDB's haversine distance aggregate, Spark-first.

QuestDB ships ``haversine_dist_deg(lat, lon, ts)`` — an aggregate over a
designated-timestamp series that sums the great-circle distance between
CONSECUTIVE points per group (public QuestDB function reference; the
classic fleet/track-mileage query). There is no Spark builtin; the
Spark-first spelling is a keyed lag window (one exchange, pure codegen
trig — no UDF) producing per-segment distances, then an ordinary hash
aggregate over them. Both faces stay whole-stage-codegen; at 100 TB the
only shuffle is the per-key window exchange, which the final group-by
reuses (same key, no second exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Mean Earth radius, km (IUGG R1). QuestDB's constant differs in the
#: decimals; the value is part of this engine's documented contract and
#: of every oracle, so cross-engine results match exactly.
EARTH_RADIUS_KM = 6371.0088

#: Degrees→radians as ONE explicit multiply by the double nearest π/180.
#: Deliberately not F.radians: Java's Math.toRadians computes x/180·π
#: (divide first), DuckDB's radians computes x·(π/180) — up to an ulp
#: apart, which breaks bit-exact cross-engine oracles. One shared
#: constant, one IEEE multiply, one answer in both engines.
DEG_TO_RAD = 0.017453292519943295


def _rad(x: Column) -> Column:
    return x * F.lit(DEG_TO_RAD)


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) points.

    Pure codegen: degree→radian multiply → haversine → ``2R·asin(√h)``.
    The conditional clamp guards the asin domain against rounding on
    antipodal points — spelled ``when(h > 1, 1)``, NOT ``least(h, 1)``:
    least/greatest IGNORE nulls (both engines), so a NULL operand (the
    lag-window first row) would clamp to 1.0 and turn "no previous
    point" into a silent half-circumference; the conditional propagates
    the NULL.
    """
    dlat = _rad(lat2 - lat1) / 2
    dlon = _rad(lon2 - lon1) / 2
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(_rad(lat1))
        * F.cos(_rad(lat2))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    clamped = F.when(h > 1.0, F.lit(1.0)).otherwise(h)
    return 2 * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(clamped))


def haversine_segments(
    df: DataFrame,
    lat: str,
    lon: str,
    ts: str,
    keys: list[str],
    tiebreak: list[str] | None = None,
    out: str = "segment_km",
) -> DataFrame:
    """Append ``out``: km from the PREVIOUS point of the same key group
    (ordered by ``ts`` then ``tiebreak``) to this row; NULL on each
    group's first row. One keyed window exchange, codegen throughout.
    ``tiebreak`` columns keep the path deterministic when two points
    share a timestamp — pass the table's unique id.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c) for c in (ts, *(tiebreak or []))]
    )
    plat, plon = F.lag(lat).over(w), F.lag(lon).over(w)
    return df.withColumn(
        out, haversine_km(plat, plon, F.col(lat), F.col(lon))
    )


def haversine_dist_deg(
    df: DataFrame,
    lat: str,
    lon: str,
    ts: str,
    keys: list[str],
    tiebreak: list[str] | None = None,
    out: str = "distance_km",
) -> DataFrame:
    """QuestDB ``haversine_dist_deg`` per key group: total km traveled
    along the ts-ordered point sequence. Groups with one point (no
    segment) report 0.0, matching the empty-path reading."""
    segs = haversine_segments(df, lat, lon, ts, keys, tiebreak)
    return segs.groupBy(*keys).agg(
        F.coalesce(F.sum("segment_km"), F.lit(0.0)).alias(out)
    )


# ---------------------------------------------------------------------------
# Geohash encoding (QuestDB's first-class geohash type, encode direction)
# ---------------------------------------------------------------------------

#: Standard geohash base-32 alphabet (no a/i/l/o).
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_plan(chars: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a ``chars``-character geohash: 5 bits per
    character, longitude first, so longitude gets the extra bit on odd
    lengths."""
    if not 1 <= chars <= 12:
        raise ValueError(f"geohash length must be 1..12, got {chars}")
    total = 5 * chars
    return (total + 1) // 2, total // 2


def geohash_encode(lat: Column, lon: Column, chars: int) -> Column:
    """Standard geohash of a (degree) point at ``chars`` characters —
    QuestDB's ``make_geohash(lon, lat, bits)`` / geohash column type,
    encode direction, as PURE CODEGEN.

    The textbook per-bit bisection loop is closed-form: the lat/lon
    bisection paths ARE the binary expansions of the scaled fractions
    ``floor((lat+90)/180·2^latbits)`` / ``floor((lon+180)/360·2^lonbits)``,
    so the hash is two scale-and-floors, a fixed bit interleave (built
    here as a Python-generated tree of shift/mask adds over disjoint
    bits — no loop survives into the plan), and a base-32 table lookup
    per character. Zero UDF, zero shuffle; Catalyst constant-folds the
    alphabet lookups' shifts. :func:`geohash_sql` emits the same
    arithmetic as portable SQL so cross-engine oracles match exactly
    (same IEEE ops in the same order).
    """
    lon_bits, lat_bits = _geohash_plan(chars)
    # Explicit DOUBLE inputs: a DECIMAL-typed operand (Spark SQL decimal
    # literals, exact-decimal derivations) would silently switch the
    # scale-and-floor to exact decimal arithmetic, whose floor can
    # differ from the IEEE-double path at exact cell boundaries — and
    # oracles must replicate ONE arithmetic. Both faces cast first.
    lat, lon = lat.cast("double"), lon.cast("double")
    # Conditional clamp, NOT least(): least/LEAST skip NULL operands in
    # both engines, so a NULL coordinate would clamp to the max cell
    # index and fabricate a corner-cell hash. CASE propagates the NULL
    # (same pattern as haversine_km's domain clamp above).
    lat_raw = F.floor(
        (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))
    )
    lat_s = (
        F.when(lat_raw > F.lit((1 << lat_bits) - 1), F.lit((1 << lat_bits) - 1))
        .otherwise(lat_raw)
        .cast("long")
    )
    lon_raw = F.floor(
        (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))
    )
    lon_s = (
        F.when(lon_raw > F.lit((1 << lon_bits) - 1), F.lit((1 << lon_bits) - 1))
        .otherwise(lon_raw)
        .cast("long")
    )
    total = lon_bits + lat_bits
    v = F.lit(0).cast("long")
    # Interleave: MSB is longitude's top bit; disjoint-bit adds, no ORs
    # needed. Positions count down from total-1.
    for i in range(lon_bits):
        v = v + F.shiftleft(
            F.shiftright(lon_s, lon_bits - 1 - i).bitwiseAND(F.lit(1)),
            total - 1 - 2 * i,
        )
    for i in range(lat_bits):
        v = v + F.shiftleft(
            F.shiftright(lat_s, lat_bits - 1 - i).bitwiseAND(F.lit(1)),
            total - 2 - 2 * i,
        )
    parts = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (
                F.shiftright(v, 5 * (chars - 1 - g)).bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
            F.lit(1),
        )
        for g in range(chars)
    ]
    return F.concat(*parts)


def geohash_sql(lat_expr: str, lon_expr: str, chars: int) -> str:
    """DuckDB-SQL mirror of :func:`geohash_encode` — the identical
    arithmetic (same constants, same op order) so a differential oracle
    reproduces the Spark face bit for bit."""
    lon_bits, lat_bits = _geohash_plan(chars)
    # CAST ... AS DOUBLE first, mirroring geohash_encode: decimal
    # literals/derivations must not switch DuckDB to exact-decimal
    # scale-and-floor (see the Spark face's comment).
    # CASE, not LEAST: DuckDB's LEAST also skips NULLs (see the Spark
    # face) — the clamp must propagate a NULL coordinate, not fabricate
    # the max cell index.
    lat_raw = (
        f"CAST(FLOOR((CAST({lat_expr} AS DOUBLE) + 90.0) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT)"
    )
    lat_s = (
        f"(CASE WHEN {lat_raw} > {(1 << lat_bits) - 1} "
        f"THEN {(1 << lat_bits) - 1} ELSE {lat_raw} END)"
    )
    lon_raw = (
        f"CAST(FLOOR((CAST({lon_expr} AS DOUBLE) + 180.0) / 360.0 * "
        f"{float(1 << lon_bits)!r}) AS BIGINT)"
    )
    lon_s = (
        f"(CASE WHEN {lon_raw} > {(1 << lon_bits) - 1} "
        f"THEN {(1 << lon_bits) - 1} ELSE {lon_raw} END)"
    )
    total = lon_bits + lat_bits
    terms = []
    for i in range(lon_bits):
        terms.append(
            f"((({lon_s} >> {lon_bits - 1 - i}) & 1) << {total - 1 - 2 * i})"
        )
    for i in range(lat_bits):
        terms.append(
            f"((({lat_s} >> {lat_bits - 1 - i}) & 1) << {total - 2 - 2 * i})"
        )
    v = "(" + " + ".join(terms) + ")"
    chars_sql = [
        f"substring('{GEOHASH_ALPHABET}', "
        f"CAST((({v} >> {5 * (chars - 1 - g)}) & 31) + 1 AS INTEGER), 1)"
        for g in range(chars)
    ]
    return "(" + " || ".join(chars_sql) + ")"
