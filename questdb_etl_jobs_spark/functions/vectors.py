"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Dot products and norms are folds over the array (``zip_with`` +
``aggregate``), evaluated inside codegen with a DOUBLE accumulator:
float inputs are widened before multiply so every product is exact and
the sequential double accumulation matches the DuckDB oracle bit-for-bit
(both fold left-to-right over 64 elements).

For top-k similarity search shapes see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    products = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def squared_norm(a: Column | str) -> Column:
    return dot(a, a)


def norm(a: Column | str) -> Column:
    return F.sqrt(squared_norm(a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denominator = norm(a) * norm(b)
    return F.when(denominator != 0, dot(a, b) / denominator)


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Symmetric int8 quantization: round-half-up(v · scale) per element.

    ``floor(x + 0.5)`` instead of ROUND: floor is exact IEEE and
    identical across engines, where ROUND-on-double diverges on
    exact-repr halves (Spark rounds the shortest repr, DuckDB the
    binary value). With ``scale = 127 / max|v|`` the extremes land on
    ±127.5 → floor stays in int8 range by construction.
    """
    return F.transform(
        _c(a),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("byte"),
    )


def max_abs(a: Column | str) -> Column:
    """max|v| over a float array (float-exact, no widening needed)."""
    return F.array_max(F.transform(_c(a), F.abs))
