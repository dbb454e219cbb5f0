"""10× scale stress: do the headline plans scale linearly past sf0.1?

sf0.1 timings are overhead-dominated (see tools/scaling_report.py), so
they cannot distinguish a linear plan from a quadratic one. This tool
synthesizes 10×-sized copies of the hot tables (≈ sf1: lineitem 6M,
orders 1.5M, events 1M, documents 50k) into /tmp and times the headline
queries at both scales. A plan that survives 100 TB must grow ≈ data ×
(time ratio ≪ 10 is overhead amortizing; ratio ≈ 10 is linear compute;
ratio ≫ 10 means a superlinear term — a scale bug).

Synthesis keeps the join/skew SHAPE honest rather than cloning rows:

- lineitem/orders: replica i remaps the order key (k*16+i) so the fact-
  to-fact join fans out 10× while per-order lineitem cardinality stays
  the reference's; customer/nation dims are untouched, so per-customer
  order counts grow 10× (the realistic dimension-skew direction).
- events: replica i shifts user ids (u*16+i) and timestamps (+i s) —
  key cardinality scales, per-key event density stays constant, the
  100 TB shape for window/as-of/sessionize operators.
- documents: replica i rewrites every token via
  vocab[xxhash64(tok, pos, i) % |vocab|] — fresh word soup with the
  corpus's vocabulary and length distribution, so near-dup density does
  not collapse into degenerate 10-way clone clusters (which would
  measure pair-explosion, not scaling).

Usage: python tools/stress_scale.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_sf1"
FACTOR = 10

#: Output files per synthesized fact table. A single coalesced write makes
#: one file with 1-3 row groups, and parquet readers (Spark AND DuckDB)
#: parallelize at row-group granularity — so a 15M-row single-row-group
#: orders file serializes BOTH engines' scans to ~1 core and the
#: differential measures file decode, not engine compute. Real deployments
#: shard into many files (100 TB ≈ thousands); 32 range-partitioned files
#: (key- or time-sorted, the designated-ts layout) restore honest scan
#: parallelism for both engines.
FILES = 32

#: fact table -> range-partition key for the sharded write.
_SHARD_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "ts",
    "documents": "doc_id",
}


def _sharded(df, name: str):
    key = _SHARD_KEY.get(name)
    return df.repartitionByRange(FILES, key) if key else df


def _replicate(df, i: int, key_shifts: dict[str, int], ts_shift: str | None):
    out = df
    for col, mult in key_shifts.items():
        out = out.withColumn(col, F.col(col) * mult + F.lit(i))
    if ts_shift is not None:
        out = out.withColumn(
            ts_shift, F.col(ts_shift) + F.expr(f"INTERVAL {i} SECONDS")
        )
    return out


def synthesize(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_DONE")):
        # Self-heal stale tiers: a _DONE left by a pre-round-11 run
        # lacks documents.n_chars, and the schema-complete headline
        # queries would crash instead of re-synthesizing.
        names = spark.read.parquet(f"{OUT}/documents.parquet").schema.names
        if "n_chars" in names:
            return
        print(
            "# stale 10x tier (documents lacks n_chars) - resynthesizing",
            file=sys.stderr,
        )
        os.remove(os.path.join(OUT, "_DONE"))
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    # A prior in-session load of OUT (e.g. a _DONE marker removed to force
    # re-synthesis) pinned stale file listings — drop them before rewriting.
    invalidate_tables(spark, OUT)

    def write(name, build):
        parts = [build(load_table(spark, BASE, name), i) for i in range(FACTOR)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        _sharded(df, name).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )

    write("lineitem", lambda df, i: _replicate(df, i, {"l_orderkey": 16}, None))
    write("orders", lambda df, i: _replicate(df, i, {"o_orderkey": 16}, None))
    write(
        "events",
        lambda df, i: _replicate(
            df, i, {"event_id": 16, "user_id": 16}, "ts"
        ),
    )

    docs = load_table(spark, BASE, "documents")
    vocab = [
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().collect()
        if r["w"]
    ]
    vlit = F.array(*[F.lit(w) for w in sorted(vocab)])

    def remix(df, i):
        # n_chars mirrors the base table's invariant (== length(text),
        # verified on the driver data) so schema-complete queries run
        # against the tier unchanged.
        if i == 0:
            return df.select(
                "doc_id", "lang", "source", "text",
                F.length("text").cast("long").alias("n_chars"),
            )
        toks = F.split("text", " ")
        remixed = F.array_join(
            F.transform(
                toks,
                lambda t, p: F.element_at(
                    vlit,
                    (
                        F.pmod(F.xxhash64(t, p, F.lit(i)), F.lit(len(vocab)))
                        + 1
                    ).cast("int"),
                ),
            ),
            " ",
        )
        return df.select(
            (F.col("doc_id") + 100_000 * i).alias("doc_id"),
            "lang",
            "source",
            remixed.alias("text"),
            F.length(remixed).cast("long").alias("n_chars"),
        )

    write("documents", remix)
    # Dims pass through unchanged so every query runs against OUT alone.
    for name in ("customer", "nation", "region", "supplier", "part",
                 "embeddings"):
        load_table(spark, BASE, name).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )
    open(os.path.join(OUT, "_DONE"), "w").close()


def synthesize_embeddings(spark) -> None:
    """10× embeddings for the clustering family's scale check: replica i
    rotates each vector's components left by i positions (pure codegen
    slice+concat — distinct vectors with the same norm and coordinate
    distribution, so centroid geometry stays honest instead of
    collapsing into 10-way exact clones) and remaps vec_id (k·16+i).
    Guarded by its own ``_DONE_EMB`` marker so a pre-existing tier
    self-heals without a full re-synthesis."""
    marker = os.path.join(OUT, "_DONE_EMB")
    if os.path.exists(marker):
        return
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, OUT)
    base = load_table(spark, BASE, "embeddings")
    dim = len(base.select("embedding").first()["embedding"])
    parts = []
    for i in range(FACTOR):
        emb = F.col("embedding")
        rot = (
            emb
            if i == 0
            else F.concat(F.slice(emb, i + 1, dim - i), F.slice(emb, 1, i))
        )
        parts.append(
            base.select(
                (F.col("vec_id") * 16 + F.lit(i)).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(8).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet"
    )
    open(marker, "w").close()


OUT_DOCS100 = "/tmp/spark_graft_docs100"


def synthesize_documents_100x(spark) -> None:
    """100× documents tier (≈500k remixed docs) for the dedup family's
    third scaling point: same vocab-preserving xxhash remix as the 10×
    tier (replica i rewrites token (t, p) → vocab[xxh(t, p, i)]), 100
    replicas, so near-dup density stays corpus-like instead of
    collapsing into clone clusters. Own ``_DONE`` marker; 32 sharded
    files (row-group parallelism for the scan)."""
    marker = os.path.join(OUT_DOCS100, "_DONE")
    if os.path.exists(marker):
        return
    shutil.rmtree(OUT_DOCS100, ignore_errors=True)
    os.makedirs(OUT_DOCS100, exist_ok=True)
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, OUT_DOCS100)
    docs = load_table(spark, BASE, "documents")
    vocab = [
        r["w"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).distinct().collect()
        if r["w"]
    ]
    vlit = F.array(*[F.lit(w) for w in sorted(vocab)])
    replicas = F.explode(F.sequence(F.lit(0), F.lit(100 - 1))).alias("__r")
    base = docs.select("doc_id", "lang", "source", "text", replicas)
    toks = F.split("text", " ")
    remixed = F.array_join(
        F.transform(
            toks,
            lambda t, p: F.element_at(
                vlit,
                (
                    F.pmod(F.xxhash64(t, p, F.col("__r")), F.lit(len(vocab)))
                    + 1
                ).cast("int"),
            ),
        ),
        " ",
    )
    out = base.select(
        (F.col("doc_id") + F.col("__r") * F.lit(100_000)).alias("doc_id"),
        "lang",
        "source",
        F.when(F.col("__r") == 0, F.col("text")).otherwise(remixed).alias(
            "text"
        ),
    )
    out = out.select(
        "doc_id", "lang", "source", "text",
        F.length("text").cast("long").alias("n_chars"),
    )
    out.repartitionByRange(FILES, "doc_id").write.mode("overwrite").parquet(
        f"{OUT_DOCS100}/documents.parquet"
    )
    open(marker, "w").close()


def synthesize_big(spark, out: str, factor: int, mult: int) -> None:
    """Relational-table synthesis at arbitrary ``factor`` (e.g. 100 ≈ sf10).

    Same shape-honest key remapping as :func:`synthesize` (replica r maps
    key k → k·mult + r, with ``mult`` ≥ next power of two above factor so
    replicas never collide; fact-to-fact joins match replica-to-replica,
    per-key cardinality stays the reference's, per-dim fan-in grows
    ``factor``×). Implementation differs: one ``crossJoin(range(factor))``
    expansion instead of a ``factor``-way union — one scan branch in the
    plan regardless of factor. Documents are NOT synthesized here (the
    headline DQs are relational; the 10× documents remix stays in
    :func:`synthesize`).
    """
    if os.path.exists(os.path.join(out, "_DONE")):
        return
    assert mult >= factor, "replica multiplier must exceed factor"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, out)
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")

    def write(name, key_cols, ts_col=None):
        df = load_table(spark, BASE, name).select("*", replicas)
        for c in key_cols:
            df = df.withColumn(c, F.col(c) * mult + F.col("__r"))
        if ts_col is not None:
            df = df.withColumn(
                ts_col,
                F.col(ts_col)
                + F.make_interval(secs=F.col("__r").cast("double")),
            )
        _sharded(df.drop("__r"), name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    write("lineitem", ["l_orderkey"])
    write("orders", ["o_orderkey"])
    write("events", ["event_id", "user_id"], ts_col="ts")
    for name in ("customer", "nation", "region", "supplier", "part",
                 "embeddings"):
        load_table(spark, BASE, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    open(os.path.join(out, "_DONE"), "w").close()


def synthesize_events_only(spark, out: str, factor: int, mult: int) -> None:
    """Events-only tier at ``factor``× BASE (factor=1000 ≈ sf100).

    The time-bucket dashboard's scale demonstration needs a tier where
    the raw rescan cost dominates EVERY engine's per-query fixed cost —
    at sf10 the whole dq25 answer fits in ~50 ms of embedded-engine scan,
    so a maintained view's flat serving cost can't show its asymptote. A
    full relational synthesis at 1000× would burn disk on tables the
    measurement never reads; this writes just ``events`` with the same
    shape-honest remapping as :func:`synthesize_big` (replica r maps
    key k → k·mult + r; per-hour bucket set unchanged, so the bucket
    store the view maintains stays the same size while raw history grows
    ``factor``×— exactly the 100 TB regime)."""
    if os.path.exists(os.path.join(out, "_DONE")):
        return
    assert mult >= factor, "replica multiplier must exceed factor"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, out)
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    df = load_table(spark, BASE, "events").select("*", replicas)
    for c in ("event_id", "user_id"):
        df = df.withColumn(c, F.col(c) * mult + F.col("__r"))
    df = df.withColumn(
        "ts",
        F.col("ts") + F.make_interval(secs=F.col("__r").cast("double") / 2.0),
    )
    _sharded(df.drop("__r"), "events").write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    open(os.path.join(out, "_DONE"), "w").close()


def synthesize_lineitem_only(spark, out: str, factor: int, mult: int) -> None:
    """Lineitem-only tier at ``factor``× BASE (factor=1000 ≈ sf100,
    600M rows, ~10 GB parquet across 32 range-partitioned files).

    dq20's committed two-point fit (sf1→sf10) put its data-proportional
    marginal at 2.09× DuckDB's — but at sf10 the whole DuckDB answer is
    ~0.2 s, so the slope's numerator is only ~0.35 s of Spark time over
    ~0.17 s of DuckDB time and single-boot noise moves the ratio by
    tenths. This tier gives the fit a third point where the scan term
    dominates both engines' fixed costs by >10× (DuckDB ~2 s, Spark
    ~4 s), so the [sf10, sf100] slope is measured in whole seconds.
    Only ``lineitem`` is written — dq20 and dq34 read nothing else, and
    a full relational synthesis at 1000× would burn disk the
    measurement never reads (same argument as
    :func:`synthesize_events_only`). Same shape-honest remapping:
    replica r maps l_orderkey → k·mult + r, so keys stay unique across
    replicas (dq34's tie-break ordering stays total) and per-order
    lineitem cardinality stays the reference's; l_shipdate is
    untouched, so dq20's filter keeps its selectivity."""
    if os.path.exists(os.path.join(out, "_DONE")):
        return
    assert mult >= factor, "replica multiplier must exceed factor"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, out)
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    df = load_table(spark, BASE, "lineitem").select("*", replicas)
    df = df.withColumn("l_orderkey", F.col("l_orderkey") * mult + F.col("__r"))
    _sharded(df.drop("__r"), "lineitem").write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    open(os.path.join(out, "_DONE"), "w").close()


def synthesize_orders_into(spark, out: str, factor: int, mult: int) -> None:
    """Add ``orders`` (plus the BASE ``customer``/``nation`` dims) to an
    existing lineitem-only tier so dq10/dq30 get the same third fit
    point dq20/dq34 already have (factor=1000 ≈ sf100: 150M orders).

    Key remapping MUST mirror :func:`synthesize_lineitem_only` — replica
    r maps o_orderkey → k·mult + r with the SAME mult — so the sf100
    lineitem⋈orders equi-join matches replica-to-replica exactly as the
    base data does (per-order lineitem cardinality preserved).
    o_custkey is untouched: per-customer order fan-in grows ``factor``×,
    the realistic dimension-skew direction (same convention as
    :func:`synthesize_big`), and customer/nation stay BASE-sized so the
    dim joins remain broadcastable — the 100 TB shape. dq30 reads only
    orders; its per-custkey window partitions deepen ``factor``× while
    the rn<=3 output stays fixed per key.

    Guarded by its own ``_DONE_ORDERS`` marker (the lineitem tier's
    ``_DONE`` already exists in ``out``); writes nothing else."""
    if os.path.exists(os.path.join(out, "_DONE_ORDERS")):
        return
    assert mult >= factor, "replica multiplier must exceed factor"
    assert os.path.exists(os.path.join(out, "_DONE")), (
        "synthesize the lineitem tier first — orders must share its "
        "key remapping"
    )
    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, out)
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    df = load_table(spark, BASE, "orders").select("*", replicas)
    df = df.withColumn("o_orderkey", F.col("o_orderkey") * mult + F.col("__r"))
    _sharded(df.drop("__r"), "orders").write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    for name in ("customer", "nation"):
        load_table(spark, BASE, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    open(os.path.join(out, "_DONE_ORDERS"), "w").close()


def _headline():
    from questdb_etl_jobs_spark.operators.dedup import (
        dup_clusters,
        near_dup_pairs,
    )
    from questdb_etl_jobs_spark.queries import spark_queries
    from questdb_etl_jobs_spark.queries.relational import q10_plain, q20_plain
    from questdb_etl_jobs_spark.sources.tables import load_table

    registry = spark_queries()

    def near_dup(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return near_dup_pairs(
            docs.select("doc_id", "text"), "doc_id", "text", threshold=0.7
        )

    def clusters(spark, sf_dir):
        edges = near_dup(spark, sf_dir)
        return dup_clusters(edges, "doc_id_a", "doc_id_b")

    return {
        "dq20_pricing_summary": q20_plain,
        "dq10_join_revenue": q10_plain,
        "dq30_window_rank": registry["q30_rank_top3_orders"],
        "dq34_topk": registry["q34_topk_lineitems"],
        "asof_join": registry["q16_asof_join"],
        "sessionize": registry["q38_sessionize"],
        "exact_dedup": registry["q46_exact_dedup"],
        "near_dup_pairs": near_dup,
        "dup_clusters": clusters,
        # Round-6 operators (round-7 verdict: scaling evidence was
        # missing): keyed-window SCD2 build, latest-op-wins CDC apply,
        # conditional-min funnel, distributed histogram quantile,
        # mergeable-sketch rolling distinct. Events-based ones see 10x
        # user cardinality at constant per-user density; the quantile
        # sees 10x rows into the same 3 groups.
        "scd2_build": registry["q113_scd2_intervals"],
        "cdc_apply": registry["q128_cdc_apply"],
        "funnel": registry["q104_funnel_steps"],
        "exact_quantile": registry["q126_exact_quantile_histogram"],
        "rolling_hll": registry["q130_rolling_distinct_hll"],
        # Round-8 operators: keyed-window trig aggregate (events, 10x
        # user keys), codegen geohash rollup (pure scan+agg), and the
        # mapInPandas+applyInPandas t-digest (sketch-space shuffle —
        # the Python-per-batch path under 10x rows).
        "haversine_track": registry["q153_haversine_track"],
        "geohash_cells": registry["q155_geohash_cells"],
        "tdigest": registry["q157_tdigest_quantiles"],
        # Round-11 operators: the grouped threshold prune (orders grow
        # 10x at constant customer keys -> 10x deeper groups, the shape
        # the prune exists for), dq30's full rank family on that prune,
        # and the per-stratum weighted race over 10x documents.
        "topk_per_key": registry["q172_topk_per_key_prune"],
        "rank_family_pruned": registry["q175_rank_family_pruned"],
        "weighted_sample_per_key": registry["q174_weighted_sample_per_lang"],
        # Round-11 wave 2: the full distributed Lloyd fit (3 iterations
        # + final assignment) over 10x embeddings (rotation remix, 20k
        # vectors) - per-iteration cost is one assignment projection +
        # a partitions x k x dim exchange, so the ratio reads the
        # assignment scan's growth.
        "kmeans_fit": registry["q177_kmeans_clusters"],
    }


def docs100_main(spark) -> None:
    """Third scaling point for the dedup family: 1× / 10× / 100×
    documents (5k / 50k / ~500k). Prints one JSON line with per-tier
    best-of-2 times and step ratios (a linear pipeline reads ≈10 per
    decade once the fixed cost amortizes; a pair-explosion reads ≫10)."""
    from questdb_etl_jobs_spark.operators.dedup import (
        dup_clusters,
        exact_dedup,
        near_dup_pairs,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table

    t0 = time.perf_counter()
    synthesize(spark)
    synthesize_documents_100x(spark)
    print(f"# synthesis: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def near_dup(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return near_dup_pairs(
            docs.select("doc_id", "text"), "doc_id", "text", threshold=0.7
        )

    def clusters(spark, sf_dir):
        return dup_clusters(near_dup(spark, sf_dir), "doc_id_a", "doc_id_b")

    def exact(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return exact_dedup(docs, on=["lang", "source"], id_col="doc_id")

    ops = {
        "near_dup_pairs": near_dup,
        "dup_clusters": clusters,
        "exact_dedup": exact,
    }
    tiers = (("1x", BASE), ("10x", OUT), ("100x", OUT_DOCS100))
    results: dict[str, dict] = {}
    for label, fn in ops.items():
        per = {}
        for tag, sf_dir in tiers:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            per[tag] = round(best, 3)
        per["ratio_10x"] = round(per["10x"] / per["1x"], 2)
        per["ratio_100x_step"] = round(per["100x"] / per["10x"], 2)
        results[label] = per
        print(
            f"{label:18s} 1x={per['1x']:7.3f}s 10x={per['10x']:7.3f}s "
            f"100x={per['100x']:8.3f}s step={per['ratio_100x_step']}",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "docs100_dedup_scale", "queries": results}))


def kmeans_init_quality_main(spark) -> None:
    """Fit-quality cell for the k-means|| init (round-12 VERDICT task
    #5): at 1× and 10× embeddings, fit k=8 Lloyd (3 iterations) from
    the naive lowest-id seed and from kmeans_parallel_init, and report
    both inertias (sum of squared distances — the k-means objective)
    plus wall times. The oracle face keeps the naive init (CPython-
    mirrorable); this cell documents what the quality path buys."""
    from questdb_etl_jobs_spark.operators.clustering import (
        kmeans_fit,
        kmeans_inertia,
        kmeans_parallel_init,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table

    t0 = time.perf_counter()
    synthesize(spark)
    synthesize_embeddings(spark)
    print(f"# synthesis: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    results: dict[str, dict] = {}
    for tag, sf_dir in (("1x", BASE), ("10x", OUT)):
        emb = load_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        naive = kmeans_fit(emb, k=8, iterations=3)
        t_naive = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        init = kmeans_parallel_init(emb, k=8)
        seeded = kmeans_fit(emb, k=8, iterations=3, init_centroids=init)
        t_pll = round(time.perf_counter() - t0, 3)
        i_naive = kmeans_inertia(emb, naive.centroids)
        i_pll = kmeans_inertia(emb, seeded.centroids)
        results[tag] = {
            "inertia_naive_init": round(i_naive, 2),
            "inertia_pll_init": round(i_pll, 2),
            "inertia_ratio_pll_vs_naive": round(i_pll / i_naive, 4),
            "fit_sec_naive": t_naive,
            "fit_sec_pll": t_pll,
        }
        print(
            f"kmeans-init {tag}: naive inertia={i_naive:.1f} "
            f"({t_naive}s) k-means|| inertia={i_pll:.1f} ({t_pll}s) "
            f"ratio={i_pll / i_naive:.4f}",
            file=sys.stderr,
        )
    # CLUSTERED adversarial cell (round-13 task #8): the unit test's
    # shape — every lowest id inside ONE blob, the pathological
    # ordering for the naive seed — at tier scale (100k rows, 8 blobs,
    # 8 dims), so the init's quality win is MEASURED where it matters,
    # not only asserted on 48 rows. Ids come in per-blob blocks, so the
    # k lowest ids all sit in blob 0; blob centers are axis-aligned 100
    # apart with content-keyed jitter (deterministic, layout-free).
    n, kk, dim = 100_000, 8, 8
    blob = (F.col("id") * kk / n).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda p: (
            F.when(
                p == F.pmod(blob, F.lit(dim)),
                blob.cast("double") * 100.0,
            ).otherwise(0.0)
            + F.pmod(F.xxhash64(F.col("id"), p), F.lit(1000)).cast(
                "double"
            )
            / 2000.0
        ),
    )
    clustered = spark.range(n).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    ).cache()
    clustered.count()
    t0 = time.perf_counter()
    naive = kmeans_fit(clustered, k=kk, iterations=3)
    t_naive = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    init = kmeans_parallel_init(clustered, k=kk)
    seeded = kmeans_fit(clustered, k=kk, iterations=3, init_centroids=init)
    t_pll = round(time.perf_counter() - t0, 3)
    i_naive = kmeans_inertia(clustered, naive.centroids)
    i_pll = kmeans_inertia(clustered, seeded.centroids)
    clustered.unpersist()
    results["clustered_100k"] = {
        "rows": n,
        "blobs": kk,
        "inertia_naive_init": round(i_naive, 2),
        "inertia_pll_init": round(i_pll, 2),
        "inertia_ratio_pll_vs_naive": round(i_pll / i_naive, 4),
        "fit_sec_naive": t_naive,
        "fit_sec_pll": t_pll,
    }
    print(
        f"kmeans-init clustered_100k: naive inertia={i_naive:.1f} "
        f"({t_naive}s) k-means|| inertia={i_pll:.1f} ({t_pll}s) "
        f"ratio={i_pll / i_naive:.4f}",
        file=sys.stderr,
    )
    print(json.dumps({"metric": "kmeans_init_quality", "k": 8,
                      "iterations": 3, "tiers": results}))


def main() -> None:
    from questdb_etl_jobs_spark.session import get_spark

    spark = get_spark(app_name="stress-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if "--docs100" in sys.argv:
        docs100_main(spark)
        return
    if "--kmeans-init" in sys.argv:
        kmeans_init_quality_main(spark)
        return
    t0 = time.perf_counter()
    synthesize(spark)
    synthesize_embeddings(spark)
    print(f"# synthesis: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    only = {a for a in sys.argv[1:] if not a.endswith(".json")}
    heads = _headline()
    unknown = only - set(heads)
    if unknown:
        # A positional arg that is neither a .json output path nor a
        # registry label benches nothing — say so instead of silently
        # writing an empty artifact (the pre-round-11 CLI treated any
        # non-.json arg as an output path).
        print(
            f"# WARNING: filter labels match no headline entry and are "
            f"ignored: {sorted(unknown)} (known: {sorted(heads)})",
            file=sys.stderr,
        )
    results: dict[str, dict] = {}
    for label, fn in heads.items():
        if only and label not in only:
            continue
        per_sf = {}
        for tag, sf_dir in (("1x", BASE), ("10x", OUT)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            per_sf[tag] = round(best, 3)
        per_sf["ratio"] = round(per_sf["10x"] / per_sf["1x"], 2)
        results[label] = per_sf
        print(f"{label:22s} 1x={per_sf['1x']:7.3f}s 10x={per_sf['10x']:7.3f}s "
              f"ratio={per_sf['ratio']}", file=sys.stderr)

    out = json.dumps({"factor": FACTOR, "queries": results})
    print(out)
    json_args = [a for a in sys.argv[1:] if a.endswith(".json")]
    if json_args:
        with open(json_args[0], "w") as fh:
            fh.write(out + "\n")


if __name__ == "__main__":
    main()


def synthesize_signups_into(spark, out: str, factor: int, mult: int) -> None:
    """Add a right-side ``signups`` table to an existing events tier for
    the as-of join cell (factor=1000 ≈ sf100: ~10M rows over the SAME
    remapped user space as events — each user keeps the BASE stratum's
    ~10 prior rows, the latest-prior-signup shape).

    Derived from the BASE events' ``event_id % 10 == 0`` stratum,
    deduped to one row per (user_id, ts) — the as-of operator's and
    DuckDB ASOF JOIN's shared determinism caveat — then replicated with
    the SAME key/ts remapping as :func:`synthesize_events_only`, so
    replica r's signups precede replica r's events exactly as the base
    data does (match density is scale-invariant; ~13% of left rows stay
    unmatched and exercise the left-join NULL path). Guarded by its own
    ``_DONE_SIGNUPS`` marker."""
    if os.path.exists(os.path.join(out, "_DONE_SIGNUPS")):
        return
    assert mult >= factor, "replica multiplier must exceed factor"
    assert os.path.exists(os.path.join(out, "_DONE")), (
        "synthesize the events tier first — signups must share its "
        "key remapping"
    )
    from pyspark.sql import Window

    from questdb_etl_jobs_spark.sources.tables import invalidate_tables, load_table

    invalidate_tables(spark, out)
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    base = (
        load_table(spark, BASE, "events")
        .filter(F.col("event_id") % 10 == 0)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("event_id").alias("signup_id"),
            "user_id",
            "ts",
            F.col("value").alias("plan_value"),
        )
    )
    replicas = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    df = base.select("*", replicas)
    for c in ("signup_id", "user_id"):
        df = df.withColumn(c, F.col(c) * mult + F.col("__r"))
    df = df.withColumn(
        "ts",
        F.col("ts") + F.make_interval(secs=F.col("__r").cast("double") / 2.0),
    )
    df.drop("__r").repartitionByRange(FILES, "ts").write.mode(
        "overwrite"
    ).parquet(f"{out}/signups.parquet")
    open(os.path.join(out, "_DONE_SIGNUPS"), "w").close()
