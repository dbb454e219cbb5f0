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


def projection_signs(in_dim: int, out_dim: int, seed: int) -> list[list[int]]:
    """Deterministic ±1 sign matrix for :func:`sign_project` — seeded
    CPython PRNG so the oracle replays the identical matrix."""
    import random

    rng = random.Random(seed)
    return [
        [1 if rng.random() < 0.5 else -1 for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


def sign_project(vec: Column | str, signs: list[list[int]]) -> Column:
    """Johnson-Lindenstrauss sign projection: ``y_j = (1/√d) Σ_i
    R[j][i]·x_i`` with ``R`` a ±1 matrix (Achlioptas 2003's database-
    friendly form — no Gaussian sampling, exact-IEEE arithmetic). The
    dimensionality-reduction step before ANN indexing / dedup over
    embeddings: pairwise distances are preserved within (1±ε) w.h.p.
    for d = O(log n / ε²).

    Evaluation is a whole-stage-codegen expression — each output
    coordinate is a left-to-right chain of signed adds over
    ``element_at`` terms, so the float result is reproducible and
    oracle-replayable (no BLAS reassociation). The plan holds
    out_dim × in_dim literal signs: right for sketch-sized projections
    (≤ a few thousand cells); swap to a pandas-UDF matmul when
    projecting to hundreds of dims.
    """
    import functools
    import math

    out_dim = len(signs)
    scale = 1.0 / math.sqrt(out_dim)
    v = _c(vec)

    def coord(row: list[int]) -> Column:
        terms = [
            v[i].cast("double") if s == 1 else -v[i].cast("double")
            for i, s in enumerate(row)
        ]
        return F.lit(scale) * functools.reduce(lambda a, b: a + b, terms)

    return F.array(*[coord(row) for row in signs])
