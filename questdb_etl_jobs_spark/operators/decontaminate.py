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
  semi-join for the bloom-filter pushdown implemented below
  (:func:`contaminated_docs_bloom`): build a bloom over benchmark grams,
  prefilter corpus grams with a vectorized membership test, exact
  semi-join to confirm — same plan shape with every post-filter shuffle
  bounded by true matches + the false-positive rate.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil, log

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


@dataclass(frozen=True)
class GramBloom:
    """A bloom filter over hashed benchmark grams, built distributed.

    ``words`` is the m-bit bitmap as ``m/64`` int64 words (numpy array on
    the driver; shipped to executors as a Spark broadcast variable by
    :func:`contaminated_docs_bloom`). Bit positions come from re-mixing
    the 8-byte gram hash with ``xxhash64(gram, j)`` for j in 0..k-1 —
    computed JVM-side on BOTH build and probe, so no Python reimplements
    the hash and build/probe cannot disagree.
    """

    words: "object"  # np.ndarray[int64], length m_bits // 64
    m_bits: int
    k: int


def _bit_positions(gram: Column, m_bits: int, k: int) -> list[Column]:
    """k bloom bit positions for a hashed gram — JVM expressions only.

    Seeds are IntegerType literals on both build and probe sides (the
    xxhash64 of (long, int) must byte-match between the two plans).
    """
    return [
        F.pmod(F.xxhash64(gram, F.lit(j)), F.lit(m_bits)) for j in range(k)
    ]


def build_gram_bloom(
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fpp: float = 0.01,
    n_items: int | None = None,
) -> GramBloom:
    """Build a :class:`GramBloom` over ``benchmark``'s distinct gram hashes.

    Fully distributed build: grams explode map-side, each contributes k
    (word-index, bit-mask) rows, and one ``groupBy(idx).agg(bit_or)``
    shuffle collapses them to at most ``m/64`` word rows — the ONLY thing
    the driver collects is the finished bitmap (8 bytes per word, e.g.
    ~120 MB for 10⁸ grams at 1% fpp, vs. gigabytes for the exact distinct
    gram set that outgrew broadcast in the first place).

    ``n_items`` (distinct-gram estimate) sizes the filter; when None it
    is measured with one approx_count_distinct job (±2% is irrelevant to
    sizing). Standard sizing: m = -n·ln(fpp)/ln²2, k = (m/n)·ln2.
    """
    import numpy as np

    grams = _hashed_gram_rows(benchmark, text_col, id_col, n).select(
        "__gram"
    ).distinct()
    if n_items is None:
        n_items = grams.agg(
            F.approx_count_distinct("__gram").alias("n")
        ).collect()[0]["n"]
    n_items = max(int(n_items), 1)
    m_bits = max(1024, ceil(-n_items * log(fpp) / (log(2) ** 2)))
    m_bits = ((m_bits + 63) // 64) * 64
    k = max(1, round((m_bits / n_items) * log(2)))

    pos = F.explode(F.array(*_bit_positions(F.col("__gram"), m_bits, k)))
    word_rows = (
        grams.select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("long").alias("__idx"),
            F.expr("shiftleft(1L, cast(pmod(__pos, 64) as int))").alias("__mask"),
        )
        .groupBy("__idx")
        .agg(F.bit_or("__mask").alias("__word"))
        .collect()
    )
    words = np.zeros(m_bits // 64, dtype=np.int64)
    for r in word_rows:
        words[r["__idx"]] = r["__word"]
    return GramBloom(words=words, m_bits=m_bits, k=k)


def contaminated_docs_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    fpp: float = 0.01,
    confirm: str = "broadcast",
    bloom: GramBloom | None = None,
) -> DataFrame:
    """:func:`contaminated_docs` for benchmark sets beyond broadcast reach.

    Identical output contract — (id_col, n_shared_grams) — different
    scale posture: instead of broadcasting the exact benchmark gram set,
    a :class:`GramBloom` (compact bitmap) rides to executors and an
    Arrow-vectorized membership test drops non-matching corpus grams IN
    THE SCAN STAGE, before any exchange. Survivors (true matches + ~fpp
    false positives) are confirmed with an exact semi-join so the result
    is exactly equal to the broadcast path — the bloom only bounds how
    much data reaches the confirm join, never what the answer is.

    ``confirm="broadcast"`` keeps the confirm join broadcast (right when
    the gram set fits after all — e.g. this sandbox); ``"shuffle"``
    hash-partitions both sides, where the corpus side is now only the
    bloom survivors instead of every gram in the corpus — the property
    that makes a 100 TB corpus vs. multi-GB benchmark run feasible.

    The probe is k numpy gathers per Arrow batch (``(w[pos>>6] >> (pos &
    63)) & 1``), fully vectorized; bit positions are computed JVM-side by
    the same expressions the build used (see :func:`_bit_positions`).
    """
    import numpy as np
    import pandas as pd

    if confirm not in ("broadcast", "shuffle"):
        raise ValueError(f"confirm must be 'broadcast' or 'shuffle', got {confirm!r}")
    if bloom is None:
        bloom = build_gram_bloom(benchmark, text_col, id_col, n, fpp)

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(bloom.words)

    def _might_contain(*pos_cols):
        w = bc.value.view(np.uint64)
        hit = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pv = p.to_numpy(dtype=np.uint64)
            hit &= ((w[pv >> np.uint64(6)] >> (pv & np.uint64(63)))
                    & np.uint64(1)).astype(bool)
        return pd.Series(hit)

    # functional form: varargs signatures can't use type-hint inference.
    # asNondeterministic stops InferFiltersFromConstraints from cloning the
    # probe onto the benchmark branch through the semi-join key (the clone
    # is harmless but re-evaluates the UDF over every benchmark gram).
    might_contain = F.pandas_udf(_might_contain, "boolean").asNondeterministic()

    corpus_grams = _hashed_gram_rows(corpus, text_col, id_col, n)
    probed = corpus_grams.filter(
        might_contain(*_bit_positions(F.col("__gram"), bloom.m_bits, bloom.k))
    )

    bench_grams = _hashed_gram_rows(benchmark, text_col, id_col, n).select(
        "__gram"
    ).distinct()
    if confirm == "broadcast":
        bench_grams = F.broadcast(bench_grams)
    return (
        probed.join(bench_grams, "__gram", "left_semi")
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
