"""Declared queries: training-pipeline curation surface (sampling,
packing, PII scrub) — the operations a 100 TB pre-training data pipeline
runs between raw corpus and tokenizer.

All three queries are pure integer / string transforms expressed
identically in both engines (no float protocol needed): content-keyed
sampling is a CASE over a multiplicative hash, packing is one cumulative
window, redaction is a shared-regex-subset regexp_replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from questdb_etl_jobs_spark.functions.sampling import (
    RESOLUTION,
    sample_bucket,
    stratified_sample,
)
from questdb_etl_jobs_spark.functions.text import (
    EMAIL_PATTERN,
    LONG_NUMBER_PATTERN,
    pii_counts,
    redact_pii,
)
from questdb_etl_jobs_spark.operators.packing import pack_sequences
from questdb_etl_jobs_spark.queries import dq
from questdb_etl_jobs_spark.queries._protocol import (
    PURCHASES_SMALL,
    duck_purchases,
)
from questdb_etl_jobs_spark.sources.csv_source import read_purchases_csv
from questdb_etl_jobs_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# q68 — deterministic stratified sampling (corpus mixing)
# ---------------------------------------------------------------------------
#
# Downsample the dominant strata, keep the rare one whole — decided by a
# content-keyed multiplicative hash, not an RNG, so the sample is
# identical across engines, partitionings, and reruns. Verified by
# per-stratum kept-count AND the exact BIGINT sum of kept keys (a value-
# level check on WHICH rows were kept, not just how many).

_Q68_FRACTIONS = {"F": 0.10, "O": 0.05}
_Q68_DEFAULT = 1.0


@dq(
    "q68_stratified_sample",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_kept,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
    FROM orders
    WHERE (o_orderkey * 2654435761) % {RESOLUTION} <
          CASE o_orderstatus
            WHEN 'O' THEN {int(0.05 * RESOLUTION)}
            WHEN 'F' THEN {int(0.10 * RESOLUTION)}
            ELSE {int(RESOLUTION)} END
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    covers="EXT,P1,A1",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    kept = stratified_sample(
        orders,
        key="o_orderkey",
        strata_col="o_orderstatus",
        fractions=_Q68_FRACTIONS,
        default=_Q68_DEFAULT,
    )
    return (
        kept.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("o_orderkey").alias("sum_keys"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# q69 — sequence packing (concat-then-chunk into 512-token windows)
# ---------------------------------------------------------------------------

_Q69_BUDGET = 512
_Q69_SHARDS = 4


@dq(
    "q69_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             doc_id % {_Q69_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), s AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING)
                  - n_tokens AS BIGINT) AS strt
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           strt // {_Q69_BUDGET} AS bin,
           strt % {_Q69_BUDGET} AS bin_offset,
           (strt + n_tokens - 1) // {_Q69_BUDGET} - strt // {_Q69_BUDGET}
             AS n_spans
    FROM s ORDER BY doc_id
    """,
    covers="EXT,W3,U4",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % _Q69_SHARDS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(
        sized, id_col="doc_id", tokens_col="n_tokens",
        budget=_Q69_BUDGET, shard_col="shard",
    )
    return packed.select(
        "doc_id", "shard", "n_tokens", "bin", "bin_offset", "n_spans"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q70 — PII redaction (emails, long digit runs) with match counts
# ---------------------------------------------------------------------------
#
# The note column is synthesized from the purchases fixture (the corpus
# tables deliberately contain no PII) so the redaction runs over real
# email shapes. Patterns live in the Java-regex ∩ RE2 common subset —
# both engines execute the byte-identical pattern.

@dq(
    "q70_pii_redact",
    oracle=f"""
    WITH t AS (
      SELECT email,
             'contact ' || email || ' account ' || item_id || quantity
               || price || ' done' AS note
      FROM {duck_purchases(PURCHASES_SMALL)}
    )
    SELECT email,
           regexp_replace(regexp_replace(note, '{EMAIL_PATTERN}', '<EMAIL>',
                                         'g'),
                          '{LONG_NUMBER_PATTERN}', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(note, '{EMAIL_PATTERN}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(
                  regexp_replace(note, '{EMAIL_PATTERN}', '<EMAIL>', 'g'),
                  '{LONG_NUMBER_PATTERN}')) AS INT) AS n_nums
    FROM t ORDER BY email
    """,
    covers="EXT,F6",
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = read_purchases_csv(spark, PURCHASES_SMALL)
    noted = raw.select(
        "email",
        F.concat(
            F.lit("contact "), F.col("email"), F.lit(" account "),
            F.col("item_id"), F.col("quantity"), F.col("price"),
            F.lit(" done"),
        ).alias("note"),
    )
    n_emails, n_nums = pii_counts(F.col("note"))
    return noted.select(
        "email",
        redact_pii(F.col("note")).alias("redacted"),
        n_emails.cast("int").alias("n_emails"),
        n_nums.cast("int").alias("n_nums"),
    ).orderBy("email")


# ---------------------------------------------------------------------------
# q73 — token-length histogram (corpus profiling before packing/filtering)
# ---------------------------------------------------------------------------
#
# Fixed-width binning by integer arithmetic (bin = n_tokens DIV width) —
# no width_bucket dialect differences, all-integer output. The per-bin
# token sum is what sizes a packing run; the count is the length
# distribution quality gates read.

_Q73_BIN_WIDTH = 8


@dq(
    "q73_token_histogram",
    oracle=f"""
    WITH t AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT n_tokens // {_Q73_BIN_WIDTH} AS bin,
           CAST(n_tokens // {_Q73_BIN_WIDTH} * {_Q73_BIN_WIDTH} AS BIGINT)
             AS bin_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_total,
           CAST(MIN(n_tokens) AS BIGINT) AS tok_min,
           CAST(MAX(n_tokens) AS BIGINT) AS tok_max
    FROM t GROUP BY bin ORDER BY bin
    """,
    covers="EXT,F7,A1",
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    binned = sized.withColumn(
        "bin", F.expr(f"n_tokens DIV {_Q73_BIN_WIDTH}")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tok_total"),
            F.min("n_tokens").alias("tok_min"),
            F.max("n_tokens").alias("tok_max"),
        )
        .select(
            "bin",
            (F.col("bin") * _Q73_BIN_WIDTH).alias("bin_lo"),
            "n_docs",
            "tok_total",
            "tok_min",
            "tok_max",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q80 — benchmark decontamination (n-gram overlap vs eval slice)
# ---------------------------------------------------------------------------
#
# The GPT-3/PaLM-style hygiene pass: a training doc is contaminated if
# it shares any 8-token n-gram with the benchmark set. The benchmark
# slice (doc_id % 17 = 0 — standing in for a held-out eval set) is
# gram-aggregated once and BROADCAST, so the corpus side never shuffles
# its exploded grams; only matched grams reach the per-doc count.

@dq(
    "q80_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 6)) AS r(i)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0)
    SELECT c.doc_id, COUNT(*) AS n_shared_grams
    FROM (SELECT doc_id, g FROM grams WHERE doc_id % 17 <> 0) c
    JOIN bench USING (g)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
    covers="EXT,J4,F6,U4",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.decontaminate import (
        contaminated_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return contaminated_docs(corpus, benchmark, "text", "doc_id", n=8).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# q101 — bloom-filter decontamination (beyond-broadcast benchmark variant)
# ---------------------------------------------------------------------------
#
# Same contract (and same oracle) as q80, different 100 TB posture: a
# compact bloom bitmap over benchmark grams rides to executors and an
# Arrow-vectorized membership probe drops non-matching corpus grams in
# the scan stage, before any exchange; survivors are confirmed with the
# exact semi-join so the answer is identical to q80's broadcast path.

@dq(
    "q101_decontaminate_bloom",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 6)) AS r(i)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 0)
    SELECT c.doc_id, COUNT(*) AS n_shared_grams
    FROM (SELECT doc_id, g FROM grams WHERE doc_id % 17 <> 0) c
    JOIN bench USING (g)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
    covers="EXT,J4,F6,U2",
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.decontaminate import (
        contaminated_docs_bloom,
    )

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    return contaminated_docs_bloom(
        corpus, benchmark, "text", "doc_id", n=8, confirm="broadcast"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q81 — deterministic corpus shuffle + shard assignment (training export)
# ---------------------------------------------------------------------------
#
# The pre-tokenization global shuffle: order documents by
# xxhash64(doc_id) so adjacent training examples decorrelate, split into
# 16 writer shards by pmod(hash), position = rank within shard. Pure
# hash math — rerunning on the same corpus gives byte-identical shards
# (resumable exports). One shuffle (partition by shard); each shard's
# order check is compressed into (n_docs, first_doc, Σ pos·doc_id) —
# any dropped/reordered doc changes the checksum. Oracle: the CPython
# XXH64 mirror recomputes the full assignment (sf-parametric: the 10×
# differential rebuilds it over its own tier).

_Q81_SHARDS = 16


def _q81_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str:
    import struct

    import duckdb

    from questdb_etl_jobs_spark.queries._xxhash import xxh64_signed

    rows = duckdb.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    hashed = sorted(
        (xxh64_signed(struct.pack("<q", d)), d) for (d,) in rows
    )
    shards: dict[int, list[int]] = {}
    for h, d in hashed:  # global (hash, doc_id) order → per-shard order
        shards.setdefault(h % _Q81_SHARDS, []).append(d)
    out = []
    for s in sorted(shards):
        docs = shards[s]
        checksum = sum(pos * d for pos, d in enumerate(docs, start=1))
        out.append(f"({s}, {len(docs)}, {docs[0]}, {checksum})")
    values = ",\n      ".join(out)
    return f"""
    SELECT CAST(shard AS BIGINT) AS shard, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(first_doc AS BIGINT) AS first_doc,
           CAST(checksum AS BIGINT) AS checksum
    FROM (VALUES
      {values}
    ) AS t(shard, n_docs, first_doc, checksum)
    ORDER BY shard
    """


# Cheap XXH64 mirror over the tier's own doc ids: sf-parametric.
_q81_oracle.sf_parametric = True


@dq("q81_shard_shuffle", oracle=_q81_oracle, covers="EXT,W1,A1")
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.xxhash64("doc_id").alias("__h")
    )
    sharded = docs.withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(_Q81_SHARDS)).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("__h", "doc_id")
    positioned = sharded.withColumn("pos", F.row_number().over(w))
    return (
        positioned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min_by("doc_id", F.struct("__h", "doc_id")).alias("first_doc"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("checksum"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q85 — repeated n-gram mining (memorization-risk sweep)
# ---------------------------------------------------------------------------
#
# Gram-granular exact-substring dedup signal: 6-token grams shared by
# ≥3 distinct documents. One shuffle; singleton grams die in the
# map-side partial aggregate.

@dq(
    "q85_repeated_ngrams",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+5], ' ') AS g
      FROM toks, unnest(range(1, len(t) - 4)) AS r(i)
    )
    SELECT g AS gram, COUNT(*) AS n_docs
    FROM grams
    GROUP BY g
    HAVING COUNT(*) >= 3
    ORDER BY gram
    """,
    covers="EXT,F6,A1",
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.decontaminate import (
        repeated_ngrams,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repeated_ngrams(docs, "text", "doc_id", n=6, min_docs=3).orderBy(
        "gram"
    )


# ---------------------------------------------------------------------------
# q88 — token-window chunking with overlap (RAG / context preparation)
# ---------------------------------------------------------------------------
#
# Every document becomes ceil(n_tokens / 24) windows of up to 32 tokens
# (8-token overlap). The oracle recomputes the identical windows with
# DuckDB list slicing; value-level equality of chunk_text verifies the
# start arithmetic, the clamped final window, and the join order.

@dq(
    "q88_token_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             CAST(unnest(generate_series(0, len(toks) - 1, 24)) AS INT)
               AS start
      FROM t
    )
    SELECT doc_id,
           start // 24 AS chunk_idx,
           CAST(len(toks[start + 1 : start + 32]) AS INT)
             AS n_chunk_tokens,
           array_to_string(toks[start + 1 : start + 32], ' ')
             AS chunk_text
    FROM s
    WHERE doc_id % 10 = 0
    ORDER BY doc_id, chunk_idx
    """,
    covers="EXT,F8,U4,F6",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.chunking import chunk_tokens

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    return chunk_tokens(
        docs, "doc_id", "text", chunk_size=32, stride=24
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# q89 — chunk-level exact dedup profile (sub-document boilerplate)
# ---------------------------------------------------------------------------
#
# Document-level exact dedup (q46) can't see boilerplate spans shared
# between distinct documents; window-level digesting can. Per source:
# total windows, distinct window digests, duplicate count. The duplicate
# count is non-zero on this corpus (the near-dup construction shares
# spans across documents), so the query verifies real collisions.

@dq(
    "q89_chunk_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, source, toks,
             CAST(unnest(generate_series(0, len(toks) - 1, 24)) AS INT)
               AS start
      FROM t
    ),
    c AS (
      SELECT source,
             md5(array_to_string(toks[start + 1 : start + 32], ' '))
               AS digest
      FROM s
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT digest) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT digest) AS INT) AS n_dup
    FROM c
    GROUP BY source
    ORDER BY source
    """,
    covers="EXT,F2,A2,U4",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.operators.chunking import (
        chunk_dedup_stats,
        chunk_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_tokens(
        docs,
        "doc_id",
        "text",
        chunk_size=32,
        stride=24,
        passthrough=["source"],
    )
    return chunk_dedup_stats(chunks, "source").orderBy("source")


# ---------------------------------------------------------------------------
# q91 — token-budget corpus mixing (per-language budget allocation)
# ---------------------------------------------------------------------------
#
# Mixture targets in training pipelines are token budgets, not keep
# fractions: cap each language at N tokens, decided by the deterministic
# content hash so the kept set is reproducible across engines and
# reruns. The verified face is the exact-prefix operator; the
# stratum-scalable bucket-cutoff variant is equivalence-tested against
# it in tests/test_operators.py.

@dq(
    "q91_token_budget_mix",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             (doc_id * 2654435761) % {RESOLUTION} AS h
      FROM documents
    ),
    c AS (
      SELECT *, SUM(n_tokens) OVER (
          PARTITION BY lang ORDER BY h, doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM c
    WHERE cum <= 2500
    GROUP BY lang
    ORDER BY lang
    """,
    covers="EXT,W3,A1,F7",
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.functions.sampling import token_budget_take

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    kept = token_budget_take(
        docs, "doc_id", "lang", "n_tokens", budget=2500
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q93 — deterministic train/val/test split (dataset versioning)
# ---------------------------------------------------------------------------
#
# The 80/10/10 split every training run needs, as a pure function of the
# document key: bucket = content hash in [0, RESOLUTION); train < 8000,
# val in [8000, 9000), test >= 9000. Disjoint and exhaustive by
# construction — verified by per-split counts, token totals, AND the
# exact sum of member ids (which rows, not just how many). No RNG, no
# state file: re-running on a grown corpus never moves an old row
# between splits.

@dq(
    "q93_train_val_test_split",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             (doc_id * 2654435761) % {RESOLUTION} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM t
    GROUP BY split
    ORDER BY split
    """,
    covers="EXT,F10,A1",
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = sample_bucket("doc_id")
    split = (
        F.when(bucket < 8000, "train")
        .when(bucket < 9000, "val")
        .otherwise("test")
        .alias("split")
    )
    return (
        docs.select(
            split,
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q94 — fixed-size deterministic sample (k per stratum)
# ---------------------------------------------------------------------------
#
# Completes the sampling triad: fraction (q68), token budget (q91),
# exact count (here) — eval sets want exactly k rows per language, not
# "about 1%". Priority = content hash, so membership is reproducible;
# verified by per-language counts and exact member-id sums.

@dq(
    "q94_fixed_size_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 2654435761) % {RESOLUTION}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM ranked
    WHERE rk <= 25
    GROUP BY lang
    ORDER BY lang
    """,
    covers="EXT,W1,A1",
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.functions.sampling import fixed_size_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = fixed_size_sample(docs, "doc_id", "lang", k=25)
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q95 — z-order (Morton) curve key (EXT: multi-dimensional data skipping)
# ---------------------------------------------------------------------------
#
# Verifies the bit-interleave ladder plans/zorder.py uses to cluster
# files for 2-D box pruning: per lineitem status group, COUNT plus the
# exact BIGINT min/max/sum of z(l_partkey, l_suppkey). Sum-of-z is a
# value-level check on every row's z-value (any single bit flipped in
# any row changes it); the DuckDB oracle replays the identical
# shift-and-mask ladder via z_value_sql, so the curve is verified
# bit-for-bit cross-engine. The layout payoff (files = curve segments →
# box queries touch few files) is pinned by tests/test_zorder.py on
# real parquet footers.

def _q95_oracle() -> str:
    from questdb_etl_jobs_spark.plans.zorder import z_value_sql

    z = z_value_sql("l_partkey", "l_suppkey")
    return f"""
    SELECT l_returnflag,
           l_linestatus,
           COUNT(*) AS n_rows,
           MIN({z}) AS z_min,
           MAX({z}) AS z_max,
           CAST(SUM({z}) AS BIGINT) AS z_sum
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """


#: Pure SQL generator (no sf0.01 data baked in) — safe at any scale.
_q95_oracle.sf_invariant = True


@dq("q95_zorder_key", oracle=_q95_oracle, covers="EXT,F7,A1")
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.plans.zorder import z_value

    li = load_table(spark, sf_dir, "lineitem")
    z = z_value("l_partkey", "l_suppkey").alias("__z")
    return (
        li.select("l_returnflag", "l_linestatus", z)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("__z").alias("z_min"),
            F.max("__z").alias("z_max"),
            F.sum("__z").alias("z_sum"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q102 — n-D z-order curve key (EXT: 3-column interleave, round 6)
# ---------------------------------------------------------------------------
#
# The 3-D face of plans/zorder.py's generalized ladder (bit i of column
# j → position 3·i + j; 21 bits per key): per order-priority group, the
# exact BIGINT min/max/sum of z(l_partkey, l_suppkey, l_linenumber) over
# lineitem. Sum-of-z is a value-level check on EVERY row's 3-way
# interleave; the DuckDB oracle replays the identical ladder through
# z_value_sql's overflow-safe pre-masked form, so the n-D curve is
# verified bit-for-bit cross-engine. The 3-D layout payoff is pinned by
# tests/test_zorder.py::test_zorder_3d_layout_prunes_box_queries.

def _q102_oracle() -> str:
    from questdb_etl_jobs_spark.plans.zorder import z_value_sql

    z = z_value_sql("l_partkey", "l_suppkey", "l_linenumber")
    return f"""
    SELECT l_linestatus,
           COUNT(*) AS n_rows,
           MIN({z}) AS z_min,
           MAX({z}) AS z_max,
           CAST(SUM({z}) AS BIGINT) AS z_sum
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """


#: Pure SQL generator (no sf0.01 data baked in) — safe at any scale.
_q102_oracle.sf_invariant = True


@dq("q102_zorder_3d_key", oracle=_q102_oracle, covers="EXT,F7,A1")
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.plans.zorder import z_value_n

    li = load_table(spark, sf_dir, "lineitem")
    z = z_value_n("l_partkey", "l_suppkey", "l_linenumber").alias("__z")
    return (
        li.select("l_linestatus", z)
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("__z").alias("z_min"),
            F.max("__z").alias("z_max"),
            F.sum("__z").alias("z_sum"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q103 — repetition metrics (EXT: Gopher-style quality-filter rules)
# ---------------------------------------------------------------------------
#
# The repetition family of quality filters (Rae et al. "Gopher" §A1.1,
# reused by RefinedWeb/Dolma): a document dominated by one repeated
# n-gram, or whose n-gram occurrences are mostly repeats, is boilerplate
# and gets filtered before training. Per (doc, n) for n = 1,2,3:
# top_frac = occurrences of the most frequent n-gram / total n-grams;
# dup_frac = 1 − distinct/total (fraction of occurrences that are
# repeats). Complements q49's length/punct/stopword profile.
#
# Scale shape: ONE scan builds all three gram arrays as column
# expressions (zip_with/transform — no UDF), a two-step explode turns
# them into (doc, n, gram) rows, and two hash aggregations collapse to
# (doc, n, gram) counts then (doc, n) metrics — everything partial-
# aggregates map-side, nothing is per-doc state bigger than a row.

def _q103_oracle() -> str:
    from questdb_etl_jobs_spark.queries._protocol import spark_round4

    top = spark_round4("top_cnt / CAST(total AS DOUBLE)", "top_frac")
    dup = spark_round4(
        "1.0::DOUBLE - dist / CAST(total AS DOUBLE)", "dup_frac"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, 1 AS gram_n, unnest(t) AS gram FROM toks
      UNION ALL
      SELECT doc_id, 2, unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i + 1]))
      FROM toks
      UNION ALL
      SELECT doc_id, 3, unnest(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
      FROM toks
    ),
    c AS (
      SELECT doc_id, gram_n, gram, COUNT(*) AS cnt
      FROM g GROUP BY doc_id, gram_n, gram
    ),
    a AS (
      SELECT doc_id, gram_n, MAX(cnt) AS top_cnt, SUM(cnt) AS total,
             COUNT(*) AS dist
      FROM c GROUP BY doc_id, gram_n
    )
    SELECT doc_id, gram_n, {top}, {dup}
    FROM a
    ORDER BY doc_id, gram_n
    """


_q103_oracle.sf_invariant = True


@dq("q103_repetition_metrics", oracle=_q103_oracle, covers="EXT,F6,F8,A1")
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    from questdb_etl_jobs_spark.sources.tables import fan_out

    # r18: gram construction + explode + map-side partial agg is the
    # heavy part of this query and runs inside the scan stage; on an
    # unsplittable source (the local single-row-group file) that is one
    # core. fan_out spreads the (doc_id, text) rows first — a no-op at
    # deployment scale where the scan has many splits. Measured 1.59 →
    # 0.85 s at sf0.1/local[32]; per-doc counts are partition-independent.
    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    t = F.split("text", " ")
    n_t = F.size(t)
    bi = F.zip_with(
        F.slice(t, 1, n_t - 1),
        F.slice(t, 2, n_t - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    tri = F.when(
        n_t >= 3,
        F.zip_with(
            F.zip_with(
                F.slice(t, 1, n_t - 2),
                F.slice(t, 2, n_t - 2),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice(t, 3, n_t - 2),
            lambda ab, c: F.concat_ws(" ", ab, c),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tagged = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("gram_n"), t.alias("grams")),
                F.struct(F.lit(2).alias("gram_n"), bi.alias("grams")),
                F.struct(F.lit(3).alias("gram_n"), tri.alias("grams")),
            )
        ).alias("gset"),
    )
    grams = tagged.select(
        "doc_id",
        F.col("gset.gram_n").alias("gram_n"),
        F.explode("gset.grams").alias("gram"),
    )
    # Count by the gram's xxhash64 identity, not the string: the metrics
    # only need multiplicities, so the shuffle key shrinks to 8 bytes
    # (bigrams/trigrams average ~3x that) — measured 2.2 -> 1.7 s at
    # sf0.1. Collision bound: distinct grams per (doc, n) <= doc length
    # L, so P[any within-doc collision] <= L^2/2^65 (~1e-14 at L=600) —
    # the same hashed-identity contract operators/dedup.hashed_shingled
    # documents. A collision would merge two gram counts within one doc.
    counts = grams.groupBy(
        "doc_id", "gram_n", F.xxhash64("gram").alias("gram")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per = counts.groupBy("doc_id", "gram_n").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("dist"),
    )
    return per.select(
        "doc_id",
        "gram_n",
        F.round(F.col("top_cnt") / F.col("total"), 4).alias("top_frac"),
        F.round(
            F.lit(1.0) - F.col("dist") / F.col("total"), 4
        ).alias("dup_frac"),
    ).orderBy("doc_id", "gram_n")
