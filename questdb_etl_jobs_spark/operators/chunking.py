"""Token-window document chunking (RAG / context-window preparation).

Splits each document into overlapping fixed-size token windows — the
standard preparation step before embedding or packing text into a model
context window. Pure built-in expressions end to end: ``split`` →
``sequence`` (chunk starts) → ``posexplode`` → ``slice``, so the whole
operator stays inside whole-stage codegen with no Python boundary and no
shuffle (chunking is embarrassingly row-parallel; output partitioning
inherits the input's).

Scale posture (100 TB): the explode multiplies rows by ~n_tokens/stride
but each output row is a narrow (id, idx, text) tuple; downstream
aggregations partial-aggregate map-side. For chunk-level dedup the only
shuffle is the groupBy on the chunk digest — identical shape to
document-level exact dedup (operators/dedup.py), just at finer grain,
which is how C4/RefinedWeb-style pipelines remove boilerplate that
document-level dedup cannot see.

Reference parity: the reference repo has no sub-document operators; this
extends the engine's LLM-pipeline surface (SURVEY.md §2 EXT) alongside
exact/near dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text_col: str | Column, lower: bool = False) -> Column:
    """Whitespace tokens of ``text_col`` as an array<string> column."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    if lower:
        col = F.lower(col)
    return F.split(col, " ")


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 24,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Output: one row per (document, chunk) with

    - ``chunk_idx`` — 0-based window index (start token = idx * stride),
    - ``n_chunk_tokens`` — window length (< chunk_size only for the
      final, clamped window),
    - ``chunk_text`` — the window's tokens re-joined with single spaces.

    A document with n tokens yields ceil(n / stride) windows; every token
    is covered, consecutive windows overlap by ``chunk_size - stride``
    tokens (the usual RAG-embedding overlap so no span straddles a
    boundary unseen).

    ``passthrough`` columns are carried onto every chunk row in-plan —
    cheaper at any scale than re-joining chunk rows back to a
    corpus-sized document dimension afterwards.

    NULL ``text_col`` rows produce no chunks (the explode drops them) —
    filter-and-quarantine upstream if they must be accounted for.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    extra = list(passthrough or [])
    toks = F.col("__toks")
    start = F.col("__start")
    return (
        df.withColumn("__toks", tokenize(text_col))
        .select(
            id_col,
            *extra,
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(toks) - 1, F.lit(0)),
                    F.lit(stride),
                )
            ).alias("chunk_idx", "__start"),
            "__toks",
        )
        .select(
            id_col,
            *extra,
            F.col("chunk_idx").cast("int"),
            F.size(F.slice(toks, start + 1, chunk_size))
            .cast("int")
            .alias("n_chunk_tokens"),
            F.array_join(F.slice(toks, start + 1, chunk_size), " ").alias(
                "chunk_text"
            ),
        )
    )


def chunk_dedup_stats(
    chunks: DataFrame, group_col: str, chunk_col: str = "chunk_text"
) -> DataFrame:
    """Per-group chunk duplication profile.

    Counts total windows, distinct window digests (md5 — collision-free
    at any realistic corpus size), and the duplicate fraction. One
    map-side-combined shuffle on ``group_col``; the distinct count is
    Spark's partial-distinct aggregate, not a self-join.
    """
    return chunks.groupBy(group_col).agg(
        F.count("*").alias("n_chunks"),
        F.count_distinct(F.md5(chunk_col)).alias("n_distinct"),
        (F.count("*") - F.count_distinct(F.md5(chunk_col)))
        .cast("int")
        .alias("n_dup"),
    )
