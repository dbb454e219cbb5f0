"""Benchmark decontamination: flag corpus documents that share any
token n-gram with an evaluation/benchmark set.

The standard pre-training hygiene step (n-gram overlap decontamination,
as popularized by the GPT-3/PaLM data papers): a training document is
contaminated if any of its n-grams (n≈8..13 tokens) appears verbatim in
a benchmark document. This generalizes the reference's validation-gate
idea (reference cloud_function.py:29-50 — drop records failing a
predicate) from per-record field checks to corpus-vs-corpus content
checks.

Scale posture (the whole point of the design):

- The benchmark side is SMALL (eval sets are MBs, the corpus is TBs).
  Its distinct-gram set is aggregated once and **broadcast**, so the
  100 TB corpus side never shuffles its grams: the plan is
  scan → gram explode → broadcast-semi-join → per-doc count (one
  shuffle, on doc_id, of the *matched* grams only — a tiny fraction).
- Grams explode ×(tokens-n+1) per doc, but the explode is streamed
  through the broadcast join inside one stage — never materialized.
- At extreme benchmark sizes (beyond broadcast), swap the broadcast
  semi-join for a bloom-filter pushdown (build over benchmark grams,
  `might_contain` prefilter, exact semi-join to confirm): same plan
  shape with the shuffle bounded by the false-positive rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (mirrors the DuckDB
    oracle: list_filter(string_split_regex(lower(t),'\\s+'), x->x<>''))."""
    return F.filter(
        F.split(F.lower(text), r"\s+"), lambda x: x != F.lit("")
    )


def token_ngrams(text: Column | str, n: int = 8) -> Column:
    """Distinct space-joined token n-grams of ``text`` (array<string>).

    Documents shorter than ``n`` tokens yield an empty array (they can
    only be exact-substring contaminated, which shorter n catches).
    """
    t = _tokens(F.col(text) if isinstance(text, str) else text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.array_join(F.slice(t, i + 1, n), " "),
    )
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _gram_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, gram) rows over a MATERIALIZED tokens attribute.

    Building grams straight off ``token_ngrams`` re-inlines the
    tokenization into the slice lambda (CollapseProject + no CSE inside
    higher-order functions → O(tokens²) re-splitting per doc, the same
    trap functions/text.py:text_profile documents). The explode-of-one-
    element-struct Generate barrier binds the token array as a real
    row-local attribute first — measured ~5× on the sf0.1 corpus.
    """
    with_toks = df.select(
        F.col(id_col),
        F.explode(
            F.array(F.struct(_tokens(F.col(text_col)).alias("toks")))
        ).alias("__m"),
    )
    toks = F.col("__m.toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select(F.col(id_col), F.explode(grams).alias("__gram"))


def _hashed_gram_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, gram-hash long) rows — gram identity as xxhash64 over the
    n-token window, string gram never materialized.

    Only usable when the caller consumes gram IDENTITY (membership,
    counts), not gram text — contamination flagging qualifies, the
    repeated-grams report does not. Same trick and same 64-bit collision
    bound as operators/dedup.hashed_shingled: a collision can only merge
    two grams (~s²/2⁶⁵ per document), and halves the gram-production
    cost while shrinking the broadcast set to 8 bytes per gram.
    """
    with_toks = df.select(
        F.col(id_col),
        F.explode(
            F.array(F.struct(_tokens(F.col(text_col)).alias("toks")))
        ).alias("__m"),
    )
    toks = F.col("__m.toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.xxhash64(
                    *[F.try_element_at(toks, i + j + 1) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    return with_toks.select(F.col(id_col), F.explode(grams).alias("__gram"))


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Corpus documents sharing ≥1 token ``n``-gram with ``benchmark``.

    Returns (id_col, n_shared_grams) — the distinct-gram overlap count
    per contaminated document. Drop these ids (anti-join) to clean the
    corpus; the count supports thresholded policies (e.g. ≥2 grams).

    Gram identity is hashed (:func:`_hashed_gram_rows`): membership and
    counts survive, the broadcast benchmark set is 8 bytes/gram, and the
    corpus side never builds a gram string.
    """
    bench_grams = _hashed_gram_rows(benchmark, text_col, id_col, n).select(
        "__gram"
    ).distinct()
    corpus_grams = _hashed_gram_rows(corpus, text_col, id_col, n)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "__gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def repeated_ngrams(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Token n-grams appearing in ≥ ``min_docs`` distinct documents.

    The memorization-risk sweep (the approximate, gram-granular face of
    exact-substring dedup à la "Deduplicating Training Data Makes
    Language Models Better"): high-multiplicity grams are boilerplate /
    templates a model will memorize. Returns (gram, n_docs) for
    thresholded removal or masking.

    One shuffle (groupBy gram) with map-side partial counts; per-doc
    grams are pre-distinct'd so a doc repeating its own boilerplate
    counts once. At 100 TB, cap the output with a count threshold (the
    long tail of singleton grams never leaves the partial aggregate
    when min_docs ≥ 2 — the final filter runs post-agg but the partial
    combine already collapsed duplicates).
    """
    return (
        _gram_rows(corpus, text_col, id_col, n)
        .groupBy(F.col("__gram").alias("gram"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
