"""Operator semantics: as-of boundaries, interval edges, latest-on
tiebreaks, dedup winners, sketches, similarity."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from questdb_etl_jobs_spark.operators.asof import asof_join
from questdb_etl_jobs_spark.operators.dedup import (
    exact_dedup,
    hamming,
    hashed_shingled,
    jaccard,
    near_dup_pairs,
    ngram_jaccard_pairs,
    shingled,
    simhash_bits,
    word_shingles,
)
from questdb_etl_jobs_spark.operators.interval import interval_join
from questdb_etl_jobs_spark.operators.latest import latest_on
from questdb_etl_jobs_spark.operators.similarity import cosine_topk


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# As-of join (J7)
# ---------------------------------------------------------------------------

def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "exact")],
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(left, right, on="ts", by=["user_id"]).collect()
    assert out[0]["tag"] == "exact"  # right.ts == left.ts matches (<=)
    strict = asof_join(left, right, on="ts", by=["user_id"], strict=True).collect()
    assert strict[0]["tag"] is None  # < excludes the equal row


def test_asof_picks_latest_prior_and_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00")), (2, _ts("2024-01-01 12:00:00"))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "early"),
            (1, _ts("2024-01-01 11:00:00"), "late"),
            (1, _ts("2024-01-01 13:00:00"), "future"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    rows = {
        r["user_id"]: r
        for r in asof_join(left, right, on="ts", by=["user_id"]).collect()
    }
    assert rows[1]["tag"] == "late"  # latest at-or-before, not first, not future
    assert rows[2]["tag"] is None  # left-outer: no right rows for key 2
    inner = asof_join(left, right, on="ts", by=["user_id"], how="inner")
    assert [r["user_id"] for r in inner.collect()] == [1]


def test_asof_carries_legit_null_payload(spark):
    # A right row whose payload VALUE is NULL must still count as a match.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), None)],
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(left, right, on="ts", by=["user_id"], how="inner").collect()
    assert len(out) == 1 and out[0]["tag"] is None


def test_asof_bucketed_equals_single_window(spark):
    # Hot-key mitigation path: identical results to the single-window plan
    # across strict/how variants, including buckets with no right rows and
    # carries across several empty buckets.
    import random
    from datetime import timedelta

    rng = random.Random(7)
    base = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame(
        [
            (rng.randrange(3), base + timedelta(minutes=rng.randrange(0, 600)))
            for _ in range(300)
        ],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (
                rng.randrange(3),
                base + timedelta(minutes=rng.randrange(0, 600)),
                rng.randrange(1000),
            )
            for _ in range(40)  # sparse: many 1-hour buckets are empty
        ],
        "user_id long, ts timestamp, v long",
    )
    for strict in (False, True):
        for how in ("left", "inner"):
            plain = sorted(
                map(tuple, asof_join(left, right, on="ts", by=["user_id"],
                                     strict=strict, how=how).collect())
            )
            bucketed = sorted(
                map(tuple, asof_join(left, right, on="ts", by=["user_id"],
                                     strict=strict, how=how,
                                     bucket="1 hour").collect())
            )
            assert bucketed == plain, (strict, how)


def test_splice_join_both_sides_and_ties(spark):
    # SPLICE = full as-of: every row of both sides appears once; equal-ts
    # rows see each other in BOTH directions; earlier rows carry NULLs.
    from questdb_etl_jobs_spark.operators.asof import splice_join

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),
            (1, _ts("2024-01-01 12:00:00"), "l2"),
        ],
        "user_id long, ts timestamp, l_tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "r1"),  # ties with l1
            (1, _ts("2024-01-01 11:00:00"), "r2"),
            (2, _ts("2024-01-01 09:00:00"), "r3"),  # no left rows for key 2
        ],
        "user_id long, ts timestamp, r_tag string",
    )
    out = splice_join(left, right, on="ts", by=["user_id"]).collect()
    assert len(out) == 5  # 2 left + 3 right rows, nothing dropped
    by_tag = {r["l_tag"] or r["r_tag"]: r for r in out}
    l1 = next(r for r in out if r["side"] == "L" and r["l_tag"] == "l1")
    assert l1["r_tag"] == "r1"  # equal ts visible L←R
    r1 = next(r for r in out if r["side"] == "R" and r["r_tag"] == "r1")
    assert r1["l_tag"] == "l1"  # equal ts visible R←L
    l2 = next(r for r in out if r["l_tag"] == "l2")
    assert l2["r_tag"] == "r2"  # latest at-or-before, not the tie row
    r3 = by_tag["r3"]
    assert r3["l_tag"] is None and r3["side"] == "R"  # no left row precedes


def test_splice_join_single_exchange(spark):
    # The two directional carries must share ONE hash Exchange on the key.
    from questdb_etl_jobs_spark.operators.asof import splice_join

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")],
        "user_id long, ts timestamp, l_tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), "y")],
        "user_id long, ts timestamp, r_tag string",
    )
    from questdb_etl_jobs_spark.plans.inspect import plan_string

    explained = plan_string(
        splice_join(left, right, on="ts", by=["user_id"]), "simple"
    )
    assert explained.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# Interval join (J6)
# ---------------------------------------------------------------------------

def test_interval_join_tolerance_boundary(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "lid long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:10:00")),  # exactly +tol: inclusive
            (11, _ts("2024-01-01 09:50:00")),  # exactly -tol: inclusive
            (12, _ts("2024-01-01 10:10:00.000001")),  # 1µs over: excluded
        ],
        "rid long, r_ts timestamp",
    )
    got = sorted(
        r["rid"]
        for r in interval_join(
            left, right, left_ts="l_ts", right_ts="r_ts", tolerance="10 minutes"
        ).collect()
    )
    assert got == [10, 11]


# ---------------------------------------------------------------------------
# LATEST ON (W4)
# ---------------------------------------------------------------------------

def test_latest_on_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 5),
            (1, _ts("2024-01-01 10:00:00"), 9),  # same ts: higher id wins
            (1, _ts("2024-01-01 09:00:00"), 7),
        ],
        "k long, ts timestamp, id long",
    )
    out = latest_on(df, ts="ts", key=["k"], tiebreak=["id"]).collect()
    assert len(out) == 1 and out[0]["id"] == 9


def test_latest_on_strategies_bit_identical(spark):
    """Round-13: latest_on's three physical faces — the deployed
    max_by aggregate, the grouped threshold prune (topk_per_key k=1,
    desc tiebreak), and the plain ranking window — must return the
    SAME rows bit-for-bit: under ties at the max (desc tiebreak
    decides), NULL timestamps (they lose to any real timestamp on
    every face), all-null-ts groups (the tiebreak alone decides), and
    multi-partition inputs. Column order is preserved too."""
    import datetime as _dt
    import random

    rng = random.Random(13)
    base = _dt.datetime(2024, 1, 1)
    rows = []
    for g in range(25):
        depth = rng.choice([1, 2, 7, 60])
        for _ in range(depth):
            ts = (
                None
                if rng.random() < 0.12
                else base + _dt.timedelta(seconds=rng.randrange(20))
            )
            rows.append((g, len(rows), ts, rng.random()))
    # One all-null-ts group: the winner comes from the tiebreak alone.
    rows += [(99, 10_001, None, 1.0), (99, 10_000, None, 2.0)]
    df = spark.createDataFrame(rows, "k int, id long, ts timestamp, v double")
    for parts in (1, 7):
        d = df.repartition(parts)
        faces = {
            s: sorted(
                (
                    tuple(r)
                    for r in latest_on(
                        d, ts="ts", key=["k"], tiebreak=["id"], strategy=s
                    ).collect()
                ),
            )
            for s in ("agg", "prune", "window")
        }
        assert faces["agg"] == faces["window"], f"parts={parts}"
        assert faces["prune"] == faces["window"], f"parts={parts}"
        winners = {t[0]: t[1] for t in faces["agg"]}
        assert winners[99] == 10_001
    assert latest_on(df, "ts", ["k"]).columns == df.columns
    with pytest.raises(ValueError):
        latest_on(df, "ts", ["k"], strategy="bogus")


def test_latest_on_streaming_frame_uses_window_fallback(spark):
    """A streaming frame can take neither the max_by whole-row
    aggregate (append-mode restrictions) nor the prune's self-join:
    the default (strategy=None) must fall back to the ranking window."""
    s = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    out = latest_on(s, ts="timestamp", key=["value"])
    assert out.isStreaming
    logical = out._jdf.queryExecution().logical().toString()
    assert "Join" not in logical and "max_by" not in logical


def test_topk_per_key_desc_tiebreak(spark):
    """(col, 'desc') tiebreak entries order descending inside the exact
    window — the LATEST ON contract (higher id wins on a timestamp
    tie) — bit-identical to the plain window spelled the same way."""
    from pyspark.sql import Window

    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    df = spark.createDataFrame(
        [(1, 5.0, 10), (1, 5.0, 20), (1, 3.0, 30), (2, 1.0, 1), (2, 1.0, 2)],
        "g int, v double, id long",
    ).repartition(3)
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.desc("id"))
    plain = sorted(
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= 2)
        .drop("__r")
        .collect(),
        key=lambda r: (r.g, r.id),
    )
    pruned = sorted(
        topk_per_key(df, ["g"], "v", 2, tiebreak=[("id", "desc")]).collect(),
        key=lambda r: (r.g, r.id),
    )
    assert pruned == plain
    assert {(r.g, r.id) for r in pruned} == {(1, 10), (1, 20), (2, 1), (2, 2)}
    with pytest.raises(ValueError):
        topk_per_key(df, ["g"], "v", 1, tiebreak=[("id", "down")])


# ---------------------------------------------------------------------------
# Dedup family (EXT)
# ---------------------------------------------------------------------------

def test_exact_dedup_min_id_winner(spark):
    df = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "a"), (7, "b")], "id long, v string"
    )
    out = {r["v"]: r["id"] for r in exact_dedup(df, on=["v"], id_col="id").collect()}
    assert out == {"a": 1, "b": 7}


def test_jaccard_and_shingles(spark):
    df = spark.createDataFrame([("the cat sat on the mat",)], "t string")
    row = df.select(
        jaccard(word_shingles("t", 3), word_shingles("t", 3)).alias("self"),
        F.size(word_shingles("t", 3)).alias("n"),
    ).collect()[0]
    assert row["self"] == 1.0
    assert row["n"] == 4  # 6 tokens → 4 distinct 3-grams


def test_hashed_shingles_mirror_string_shingles(spark):
    # The sketch path's hashed shingle sets must have exactly the string
    # sets' cardinalities (identity-preserving modulo the documented
    # 64-bit collision bound), including short-document edge cases where
    # the window runs past the end of the token array.
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat the cat sat"),  # repeats → distinct
            (3, "one two"),   # shorter than the 3-token window
            (4, "solo"),      # single token
            (5, ""),          # empty text → one empty-ish shingle
        ],
        "id long, text string",
    )
    joined = (
        shingled(docs, "id", "text", 3, out_col="__str")
        .join(hashed_shingled(docs, "id", "text", 3, out_col="__hashed"), "id")
        .select("id", F.size("__str").alias("ns"), F.size("__hashed").alias("nh"))
        .collect()
    )
    for row in joined:
        assert row["ns"] == row["nh"], row


def test_near_dup_pairs_finds_known_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate of 1 → jaccard 1.0, must be found
            (3, "completely different words entirely unrelated content here "
                "nothing shared at all with the others one two three four"),
        ],
        "id long, text string",
    )
    pairs = near_dup_pairs(docs, "id", "text", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0


def test_lsh_bucket_cap_bounds_hot_bucket_pairs(spark):
    """Adversarial boilerplate corpus: 1k identical docs land in ONE bucket
    per band. Uncapped that is 1000*999/2 = 499500 pairs; bucket_cap=K must
    bound output to ~n*K while keeping the bucket transitively connected
    (and exact verification still passes, since all docs are identical).
    """
    from questdb_etl_jobs_spark.operators.dedup import (
        dup_clusters,
        lsh_candidate_pairs,
        signature_and_shingles,
    )

    n, cap = 1000, 4
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 2
    docs = spark.createDataFrame([(i, base) for i in range(n)], "id long, text string")
    fused = signature_and_shingles(docs, "id", "text", n_hashes=16)
    cands = lsh_candidate_pairs(
        fused.select("id", "signature"), "id", n_bands=4, bucket_cap=cap
    )
    rows = cands.collect()
    # identical docs → identical signatures → every band maps all n ids to
    # one bucket; capped enumeration emits the window chain (j-i <= cap)
    # plus the star to the bucket head (i == 0) — linear, not quadratic.
    assert len(rows) <= n * (cap + 1)
    assert all(
        0 < r["id_b"] - r["id_a"] <= cap or r["id_a"] == 0 for r in rows
    )
    # the capped path must never materialize a bucket as one aggregation
    # row: plan is window-based (spillable partition buffer), collect_set
    # only exists on the uncapped exact path.
    capped_plan = cands._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_set" not in capped_plan and "window" in capped_plan.lower()

    # chain connectivity survives for clustering: one component, min label 0
    clusters = dup_clusters(cands, "id_a", "id_b")
    assert clusters.select("cluster").distinct().collect()[0][0] == 0
    assert clusters.count() == n

    # end-to-end capped near_dup_pairs still finds the known duplicate and
    # nothing across unrelated docs
    small = spark.createDataFrame(
        [(1, base), (2, base),
         (3, "totally different unrelated words nothing shared one two three "
             "four five six seven eight nine ten")],
        "id long, text string",
    )
    pairs = near_dup_pairs(small, "id", "text", threshold=0.9, bucket_cap=8).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_ngram_jaccard_exact_pair_and_df_cap(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact duplicate → jaccard 1.0
            (3, "completely different words entirely unrelated content here "
                "nothing shared at all with the others one two three four"),
        ],
        "id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, "id", "text").collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["n_inter"] == pairs[0]["n_union"]
    # Every shared shingle has DF 2 here; df_cap=1 removes all postings,
    # so the pair never becomes a candidate (the documented recall trade).
    capped = ngram_jaccard_pairs(docs, "id", "text", df_cap=1).collect()
    assert capped == []


def test_lang_guess_tiebreak_and_und(spark):
    from questdb_etl_jobs_spark.functions.text import lang_guess

    df = spark.createDataFrame(
        # "de la" → es score 1 (la), fr score 1 (le? no) — craft exact ties:
        # "the el" hits en(the)=1 and es(el)=1 → tie resolves to 'en'
        # (first max in LANG_MARKERS order); no hits at all → 'und'.
        [(1, "the el"), (2, "zzz qqq")],
        "id long, text string",
    )
    rows = {r["id"]: r["g"] for r in df.select("id", lang_guess("text").alias("g")).collect()}
    assert rows == {1: "en", 2: "und"}


def test_python_xxh64_matches_spark(spark):
    # Golden parity for the oracle-side XXH64 mirror: empty, 1/4/8-byte
    # tails, and the >=32-byte stripe path.
    from questdb_etl_jobs_spark.queries._xxhash import xxh64_signed

    samples = ["", "a", "abcd", "abcdefgh", "hello world", "x" * 31, "y" * 32,
               "key agg row scan slow fast table value part hash"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r[0] for r in df.select(F.xxhash64("t")).collect()]
    assert got == [xxh64_signed(s.encode()) for s in samples]


def test_simhash_identical_and_perturbed(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(base, base, base.replace("kappa", "xi"))],
                               "a string, b string, c string")
    row = df.select(
        hamming(simhash_bits("a"), simhash_bits("b")).alias("same"),
        hamming(simhash_bits("a"), simhash_bits("c")).alias("near"),
    ).collect()[0]
    assert row["same"] == 0
    assert 0 < row["near"] < 32  # one word changed: close, not identical


# ---------------------------------------------------------------------------
# Text metrics: ANSI-mode edge cases
# ---------------------------------------------------------------------------

def test_text_profile_ansi_edge_cases(spark):
    # Empty / whitespace / punct-only docs must score, not raise
    # DIVIDE_BY_ZERO under ANSI mode (Spark 4 default).
    from questdb_etl_jobs_spark.functions.text import text_profile

    df = spark.createDataFrame(
        [(1, ""), (2, " "), (3, "!!!"), (4, "the quick brown fox")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_profile(df, "text").collect()}
    assert rows[1]["punct_ratio"] == 0.0 and rows[1]["lang_guess"] == "und"
    assert rows[3]["punct_ratio"] == 1.0
    assert rows[4]["lang_guess"] == "en" and rows[4]["n_tokens"] == 4


# ---------------------------------------------------------------------------
# Skew mitigation
# ---------------------------------------------------------------------------

def test_salted_join_equals_plain_join(spark):
    # Default (no salt_by) round-robin salting path; the deterministic
    # hash-salted path and plan shape live in tests/test_skew.py.
    from questdb_etl_jobs_spark.operators.skew import salted_join

    # 1000 rows of one hot key + a long tail.
    big = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(k, k) for k in range(2, 30)],
        "k long, payload long",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b")], "k long, v string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["payload"], r["v"])
            for r in salted_join(big, small, on="k", salts=8, how=how).collect()
        )
        expected = sorted(
            (r["k"], r["payload"], r["v"])
            for r in big.join(small, on=["k"], how=how).collect()
        )
        assert got == expected


# ---------------------------------------------------------------------------
# Similarity search (EXT)
# ---------------------------------------------------------------------------

def test_cosine_topk_matches_bruteforce(spark):
    import random

    rng = random.Random(1)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    probe = [rng.gauss(0, 1) for _ in range(8)]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    expected = sorted(vecs, key=lambda v: (-cos(v[1], probe), v[0]))[:5]
    got = cosine_topk(df, probe, k=5).collect()
    assert [r["vec_id"] for r in got] == [v[0] for v in expected]
    for r, (vid, v) in zip(got, expected):
        assert r["cosine"] == pytest.approx(cos(v, probe), abs=1e-12)


def test_approx_distinct_within_declared_error(spark):
    """A3's sketch is rows-only in the driver gate (DuckDB can't replay
    Spark's HLL++); this pins the accuracy contract instead: every group
    estimate within 5x the declared 1% relative error of the exact count
    (HLL++ rsd is a standard deviation, not a hard bound)."""
    from questdb_etl_jobs_spark.sources.tables import load_table

    events = load_table(spark, SF_SMALL, "events")
    approx = {
        r["event_type"]: r["a"]
        for r in events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["e"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("e"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, e in exact.items():
        assert abs(approx[etype] - e) <= max(1, 0.05 * e), (etype, approx[etype], e)


def test_ngram_jaccard_capped_path_exact_counts(spark):
    """df_cap path: a boilerplate shingle over the cap is dropped from
    candidate generation, but a pair connected by ANY rare shingle is
    still found — and its n_inter/n_union come from the FULL shingle
    sets (verify join), not the capped postings."""
    boiler = "end of document footer text"  # appears in every doc
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " + boiler),
            (2, "alpha beta gamma delta " + boiler),  # near-dup of 1
            (3, "one two three four five " + boiler),
            (4, "six seven eight nine ten " + boiler),
            (5, "eleven twelve thirteen fourteen " + boiler),
        ],
        "id long, text string",
    )
    # cap=3: every shingle wholly inside the shared footer has DF 5 → capped;
    # the pair (1,2) still surfaces via its rare 'alpha beta gamma' shingles.
    pairs = ngram_jaccard_pairs(
        docs, "id", "text", threshold_num=4, threshold_den=5, df_cap=3
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    row = pairs[0]
    # identical docs: full sets equal → inter == union (includes the
    # capped footer shingles, proving the verify join used full arrays)
    # 9 tokens → 7 distinct 3-gram shingles, including the capped footer
    # ones — proving the verify join used full arrays.
    assert row["n_inter"] == row["n_union"] == 7


def test_fill_gaps_modes(spark):
    """FILL semantics on a hand-built sparse bucketed aggregate: value-0,
    prev carry-forward, linear interpolation, and NULL edges (QuestDB
    FILL(NULL) behavior outside the first/last observed bucket)."""
    from questdb_etl_jobs_spark.operators.sample_by import fill_gaps

    agg = spark.createDataFrame(
        [
            (_ts("2024-01-01T01:00:00"), "a", 2, 10.0),
            (_ts("2024-01-01T04:00:00"), "a", 4, 40.0),
            (_ts("2024-01-01T02:00:00"), "b", 1, 5.0),
        ],
        "bucket_ts timestamp, k string, n long, v double",
    ).withColumn("v_prev", F.col("v"))
    out = fill_gaps(
        agg, "bucket_ts", "hour", keys=["k"],
        fill={"n": ("value", 0), "v_prev": "prev", "v": "linear"},
    )
    rows = {
        (r["k"], r["bucket_ts"].hour): (r["n"], r["v_prev"], r["v"])
        for r in out.collect()
    }
    # Grid spans the GLOBAL [min, max] = 01:00..04:00 for both keys.
    assert len(rows) == 8
    # Key a: gap hours 2 and 3 interpolate 10 -> 40 linearly.
    assert rows[("a", 2)] == (0, 10.0, 20.0)
    assert rows[("a", 3)] == (0, 10.0, 30.0)
    assert rows[("a", 1)] == (2, 10.0, 10.0)
    # Key b: observed only at 02:00 — leading hour has no prev (NULL),
    # trailing hours carry prev forward but linear stays NULL (no next).
    assert rows[("b", 1)] == (0, None, None)
    assert rows[("b", 3)] == (0, 5.0, None)
    assert rows[("b", 4)] == (0, 5.0, None)


def test_dup_clusters_transitive_chain(spark):
    """A~B, B~C, D~E merges {A,B,C} via transitivity even with no A~C
    edge; min node id wins as the cluster label."""
    from questdb_etl_jobs_spark.operators.dedup import dup_clusters

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (3, 7)], "a long, b long"
    )
    got = {
        r["node"]: r["cluster"]
        for r in dup_clusters(edges, "a", "b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dup_clusters_deep_chain_dup_edges_vs_union_find(spark):
    """r19 restructure pin (fused round 1, per-occurrence self-loops, no
    per-round renames): a diameter-8 chain forces MULTIPLE join rounds
    past the fused first one, duplicate and reversed edges exercise the
    min-idempotence argument for the occurrence-level self-loops, and
    the ground truth is an independent union-find."""
    from questdb_etl_jobs_spark.operators.dedup import dup_clusters

    pairs = (
        [(i + 1, i) for i in range(1, 9)]      # 1-2-…-9 chain (reversed)
        + [(2, 3), (2, 3), (3, 2)]             # duplicate + both directions
        + [(20, 21), (21, 20), (30, 30)]       # 2-cycle dup; self-edge
    )
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = min(find(a), find(b))
        parent[find(b)] = find(find(a))
    want = {
        n: min(m for m in parent if find(m) == find(n)) for n in parent
    }
    edges = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r["node"]: r["cluster"]
        for r in dup_clusters(edges, "a", "b").collect()
    }
    assert got == want


def test_stratified_sample_content_keyed(spark):
    """The sample is a pure function of the key: repartitioning doesn't
    change membership, fraction 1.0 keeps everything, 0.0 drops all,
    and distinct salts give different (decorrelated) samples."""
    from questdb_etl_jobs_spark.functions.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    df = spark.range(0, 2000).withColumn(
        "stratum", F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    )
    kept = stratified_sample(
        df, "id", "stratum", {"a": 0.2}, default=1.0
    )
    ids = {r["id"] for r in kept.collect()}
    ids_repart = {
        r["id"]
        for r in stratified_sample(
            df.repartition(13), "id", "stratum", {"a": 0.2}, default=1.0
        ).collect()
    }
    assert ids == ids_repart
    assert all(i in ids for i in range(1, 2000, 2))  # stratum b kept whole
    n_a = sum(1 for i in ids if i % 2 == 0)
    assert 0 < n_a < 1000  # stratum a thinned
    s0 = {r["id"] for r in deterministic_sample(df, "id", 0.5, salt=0).collect()}
    s1 = {r["id"] for r in deterministic_sample(df, "id", 0.5, salt=1).collect()}
    assert s0 != s1 and len(s0) > 0 and len(s1) > 0


def test_pack_sequences_boundaries(spark):
    """Concat-then-chunk layout: offsets accumulate per shard in id
    order; a doc straddling a window boundary reports n_spans >= 1."""
    from questdb_etl_jobs_spark.operators.packing import pack_sequences

    rows = [(1, 60), (2, 50), (3, 10), (4, 200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {
        r["doc_id"]: (r["bin"], r["bin_offset"], r["n_spans"])
        for r in pack_sequences(df, "doc_id", "n", budget=100).collect()
    }
    # doc1 [0,60) bin0; doc2 [60,110) crosses into bin1; doc3 [110,120)
    # bin1; doc4 [120,320) crosses bins 1->3 (2 boundaries).
    assert got == {
        1: (0, 0, 0),
        2: (0, 60, 1),
        3: (1, 10, 0),
        4: (1, 20, 2),
    }


def test_redact_pii_order_and_counts(spark):
    """Emails are scrubbed before digit runs (no half-redacted emails);
    short numbers survive; counts match."""
    from questdb_etl_jobs_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [("mail a1234567@x.io then 9876543210 and 123 end",)], "t string"
    )
    n_e, n_n = pii_counts(F.col("t"))
    row = df.select(
        redact_pii(F.col("t")).alias("r"),
        n_e.alias("ne"), n_n.alias("nn"),
    ).collect()[0]
    assert row["r"] == "mail <EMAIL> then <NUM> and 123 end"
    assert (row["ne"], row["nn"]) == (1, 1)


def test_kmv_distinct_exact_and_estimate(spark):
    """Groups under k report exact counts; larger groups estimate within
    a loose KMV error bound (k=64 -> ~12.5% stderr; assert 3 sigma)."""
    from questdb_etl_jobs_spark.operators.sketch import kmv_distinct

    df = spark.range(0, 5000).select(
        F.when(F.col("id") < 10, "small").otherwise("big").alias("g"),
        (F.col("id") % 2000).alias("v"),
    )
    got = {
        r["g"]: (r["n_min"], r["est_distinct"])
        for r in kmv_distinct(df, ["g"], "v", k=64).collect()
    }
    assert got["small"] == (10, 10.0)  # exact path
    n_min, est = got["big"]
    assert n_min == 64
    assert abs(est - 1990) / 1990 < 0.40  # distinct vals 10..1999


# ---------------------------------------------------------------------------
# Decontamination (EXT: benchmark n-gram overlap)
# ---------------------------------------------------------------------------

def test_contaminated_docs_crafted_overlap(spark):
    from questdb_etl_jobs_spark.operators.decontaminate import (
        contaminated_docs,
        token_ngrams,
    )
    import pyspark.sql.functions as F

    shared = "one two three four five six seven eight"
    corpus = spark.createDataFrame(
        [
            (1, f"prefix {shared} suffix tail"),     # contains the bench 8-gram
            (2, "totally different text with no overlap at all here"),
            (3, "short doc"),                        # < 8 tokens → no grams
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, f"{shared} and more benchmark words")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared_grams"]
        for r in contaminated_docs(corpus, benchmark).collect()
    }
    assert out == {1: 1}  # only doc 1, exactly one shared 8-gram

    # short docs yield empty gram arrays, not errors
    grams = corpus.select(token_ngrams("text", 8).alias("g")).collect()
    assert grams[2]["g"] == []


def test_contaminated_docs_case_and_whitespace_normalized(spark):
    from questdb_etl_jobs_spark.operators.decontaminate import (
        contaminated_docs,
    )

    corpus = spark.createDataFrame(
        [(1, "The  Quick\tBrown Fox Jumps Over The Dog")],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(2, "the quick brown fox jumps over the dog")],
        "doc_id long, text string",
    )
    out = contaminated_docs(corpus, benchmark).collect()
    assert [(r["doc_id"], r["n_shared_grams"]) for r in out] == [(1, 1)]


def test_bloom_decontaminate_equals_broadcast_path(spark):
    """The bloom prefilter + exact confirm must be EXACTLY equivalent to
    the broadcast semi-join path (q80's shape) on real sf data, for both
    confirm modes — the bloom bounds work, never changes the answer."""
    from questdb_etl_jobs_spark.operators.decontaminate import (
        contaminated_docs,
        contaminated_docs_bloom,
    )
    from questdb_etl_jobs_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    expected = sorted(
        (r["doc_id"], r["n_shared_grams"])
        for r in contaminated_docs(corpus, benchmark, "text", "doc_id", n=8).collect()
    )
    assert expected, "fixture must produce at least one contaminated doc"
    for confirm in ("broadcast", "shuffle"):
        got = sorted(
            (r["doc_id"], r["n_shared_grams"])
            for r in contaminated_docs_bloom(
                corpus, benchmark, "text", "doc_id", n=8, confirm=confirm
            ).collect()
        )
        assert got == expected, confirm


def test_bloom_build_and_probe_agree(spark):
    """Zero false negatives by construction: every benchmark gram probes
    positive through the built bloom (build and probe share the same JVM
    bit-position expressions); an unrelated corpus mostly probes negative
    (fpp-bounded) and the confirm join removes the rest."""
    from questdb_etl_jobs_spark.operators.decontaminate import (
        build_gram_bloom,
        contaminated_docs_bloom,
    )

    benchmark = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    bloom = build_gram_bloom(benchmark, fpp=0.001)
    assert bloom.m_bits % 64 == 0 and bloom.k >= 1

    corpus = spark.createDataFrame(
        [
            (1, "prefix one two three four five six seven eight tail"),
            (2, "entirely unrelated words with no benchmark overlap "
                "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    out = contaminated_docs_bloom(corpus, benchmark, bloom=bloom).collect()
    assert [(r["doc_id"], r["n_shared_grams"]) for r in out] == [(1, 1)]


def test_repeated_ngrams_self_repetition_counts_once(spark):
    from questdb_etl_jobs_spark.operators.decontaminate import repeated_ngrams

    boiler = "terms of service apply to all users"
    corpus = spark.createDataFrame(
        [
            (1, f"{boiler} and {boiler}"),   # repeats internally: counts once
            (2, f"intro {boiler} outro"),
            (3, "unrelated content entirely different from the others"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["gram"]: r["n_docs"]
        for r in repeated_ngrams(corpus, n=7, min_docs=2).collect()
    }
    assert out[boiler] == 2          # docs 1 and 2 — not 3 occurrences
    assert all(v >= 2 for v in out.values())


def test_chunk_tokens_windows_and_clamp(spark):
    from questdb_etl_jobs_spark.operators.chunking import (
        chunk_dedup_stats,
        chunk_tokens,
    )

    docs = spark.createDataFrame(
        [
            # 7 tokens, chunk=3, stride=2 -> starts 0,2,4,6; last clamps
            (1, "a b c d e f g", "s1"),
            # fewer tokens than one chunk -> single short window
            (2, "x y", "s1"),
            # single token -> one window of 1
            (3, "z", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = chunk_tokens(
        docs, "doc_id", "text", chunk_size=3, stride=2,
        passthrough=["source"],
    )
    rows = {
        (r.doc_id, r.chunk_idx): (r.n_chunk_tokens, r.chunk_text, r.source)
        for r in out.collect()
    }
    assert rows == {
        (1, 0): (3, "a b c", "s1"),
        (1, 1): (3, "c d e", "s1"),
        (1, 2): (3, "e f g", "s1"),
        (1, 3): (1, "g", "s1"),
        (2, 0): (2, "x y", "s1"),
        (3, 0): (1, "z", "s2"),
    }
    # every token covered: union of windows == token multiset coverage
    stats = {
        r.source: (r.n_chunks, r.n_distinct, r.n_dup)
        for r in chunk_dedup_stats(out, "source").collect()
    }
    assert stats == {"s1": (5, 5, 0), "s2": (1, 1, 0)}

    with pytest.raises(ValueError):
        chunk_tokens(docs, "doc_id", "text", chunk_size=0)


def test_chunk_dedup_detects_shared_spans(spark):
    from questdb_etl_jobs_spark.operators.chunking import (
        chunk_dedup_stats,
        chunk_tokens,
    )

    boiler = " ".join(f"w{i}" for i in range(4))
    docs = spark.createDataFrame(
        [(1, boiler + " unique one"), (2, boiler + " other tail")],
        "doc_id long, text string",
    ).withColumn("src", F.lit("s"))
    chunks = chunk_tokens(
        docs, "doc_id", "text", chunk_size=4, stride=4,
        passthrough=["src"],
    )
    stats = chunk_dedup_stats(chunks, "src").collect()[0]
    # the shared 4-token boilerplate window digests identically
    assert stats.n_dup >= 1


def test_token_budget_take_scalable_vs_exact(spark):
    """The bucket-cutoff variant must keep a subset of the exact-prefix
    variant (whole buckets only), stay within budget, and be maximal —
    including one more bucket would overflow."""
    from questdb_etl_jobs_spark.functions.sampling import (
        RESOLUTION,
        token_budget_take,
        token_budget_take_scalable,
    )

    rows = [(i, "a" if i % 3 else "b", 10 + (i * 7) % 50) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    budget = 300

    exact = token_budget_take(df, "id", "grp", "w", budget)
    scalable = token_budget_take_scalable(df, "id", "grp", "w", budget)
    e = {(r.grp, r.id): r.w for r in exact.collect()}
    s = {(r.grp, r.id): r.w for r in scalable.collect()}

    assert set(s) <= set(e)
    # per-group budget respected by both
    for kept in (e, s):
        for g in {"a", "b"}:
            assert sum(w for (gg, _), w in kept.items() if gg == g) <= budget
    # maximality of the bucket cutoff: recompute per-group bucket sums in
    # python and check the next non-empty bucket would overflow
    knuth = 2654435761
    for g in {"a", "b"}:
        buckets: dict[int, int] = {}
        for i, gg, w in rows:
            if gg == g:
                buckets.setdefault((i * knuth) % RESOLUTION, 0)
                buckets[(i * knuth) % RESOLUTION] += w
        cum, cutoff = 0, -1
        for b in sorted(buckets):
            if cum + buckets[b] > budget:
                break
            cum += buckets[b]
            cutoff = b
        kept_w = sum(w for (gg, _), w in s.items() if gg == g)
        assert kept_w == cum and cum <= budget
        nxt = [b for b in sorted(buckets) if b > cutoff]
        if nxt:
            assert cum + buckets[nxt[0]] > budget


def test_winner_operators_partition_invariant(spark):
    """Deterministic-winner claims pinned: exact_dedup, latest_on, and
    near_dup_pairs must produce identical results regardless of input
    partitioning (1 vs 17 partitions, shuffled input order)."""
    from datetime import datetime, timedelta

    from questdb_etl_jobs_spark.operators.dedup import (
        exact_dedup,
        near_dup_pairs,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (i, i % 7, f"payload {i % 5}", base + timedelta(minutes=(i * 13) % 40))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, k long, text string, ts timestamp")

    def runs(fn):
        out = []
        for parts in (1, 17):
            shaped = df.repartition(parts)
            out.append(sorted(tuple(r) for r in fn(shaped).collect()))
        return out

    a, b = runs(lambda d: exact_dedup(d, on=["text"], id_col="id"))
    assert a == b and len(a) == 5

    a, b = runs(
        lambda d: latest_on(d, ts="ts", key=["k"], tiebreak=["id"])
    )
    assert a == b and len(a) == 7

    docs = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog " * 3
             + (f"tail {i % 3} " * 2))
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    a, b = (
        sorted(
            (r.doc_id_a, r.doc_id_b)
            for r in near_dup_pairs(
                docs.repartition(p), "doc_id", "text", threshold=0.5
            ).collect()
        )
        for p in (1, 17)
    )
    assert a == b and len(a) > 0


def test_ohlc_tiebreak_deterministic(spark):
    """Two trades at the identical timestamp: open/close resolve by the
    tiebreak id, not partition luck."""
    from datetime import datetime

    from questdb_etl_jobs_spark.operators.sample_by import (
        ohlc_aggs,
        sample_by,
    )

    t = datetime(2024, 1, 1, 9, 30, 0)
    t2 = datetime(2024, 1, 1, 9, 45, 0)
    df = spark.createDataFrame(
        [
            (1, t, 10.0),   # same ts as id=0 — higher id
            (0, t, 11.0),
            (2, t2, 9.0),
            (3, t2, 12.0),  # same ts as id=2 — higher id
        ],
        "id long, ts timestamp, px double",
    )
    for parts in (1, 7):
        got = sample_by(
            df.repartition(parts),
            ts="ts",
            bucket="hour",
            aggs=ohlc_aggs("px", "ts", tiebreak=["id"]),
        ).collect()[0]
        assert (got.open, got.high, got.low, got.close, got.n_trades) == (
            11.0, 12.0, 9.0, 12.0, 4,
        )


def test_chunk_tokens_udtf_rows(spark):
    # The registered UDTF must chunk exactly like Python slicing, emit
    # nothing for NULL text, and keep the short final chunk.
    from questdb_etl_jobs_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "x")], "id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.id, c.pos, c.chunk, c.n_tokens
        FROM udtf_docs d, LATERAL chunk_tokens(d.text, 2) c
        ORDER BY d.id, c.pos
        """
    ).collect()
    got = [(r["id"], r["pos"], r["chunk"], r["n_tokens"]) for r in rows]
    assert got == [
        (1, 0, "a b", 2),
        (1, 1, "c d", 2),
        (1, 2, "e", 1),
        (3, 0, "x", 1),
    ]


def test_semantic_dedup_losers_in_cell_only(spark):
    # Two near-identical vectors in the same Voronoi cell → higher id
    # dropped; an equally-similar pair SPLIT across cells must survive
    # (the documented SemDeDup approximation).
    from questdb_etl_jobs_spark.operators.similarity import (
        semantic_dedup_losers,
    )

    seeds = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),   # cell 0
            (2, [0.91, 0.1]),  # cell 0, twin of 1 → dropped
            (3, [0.1, 0.9]),   # cell 1
            (4, [0.6, 0.55]),  # cell 0 (closer to seed 0)
            (5, [0.55, 0.6]),  # cell 1 — near-twin of 4 but cross-cell
        ],
        "vec_id long, embedding array<float>",
    )
    losers = {
        r["vec_id"]: r["n_twins"]
        for r in semantic_dedup_losers(df, seeds, threshold=0.99).collect()
    }
    assert 2 in losers and losers[2] >= 1
    assert 5 not in losers  # cross-cell pair is out of scope by design


def test_sample_by_first_observation_anchor(spark):
    # Buckets anchor at min(ts), not the calendar: events at t0, t0+50m,
    # t0+70m with 1-hour buckets split [t0, t0+60) / [t0+60, ...) even
    # though t0 is mid-calendar-hour.
    from questdb_etl_jobs_spark.operators.sample_by import (
        sample_by_first_observation,
    )

    t0 = datetime.fromisoformat("2024-01-01 10:17:00")
    df = spark.createDataFrame(
        [
            (1, t0),
            (2, datetime.fromisoformat("2024-01-01 11:07:00")),  # +50m
            (3, datetime.fromisoformat("2024-01-01 11:27:00")),  # +70m
        ],
        "id long, ts timestamp",
    )
    got = {
        r["bucket_ts"]: r["n"]
        for r in sample_by_first_observation(
            df, ts="ts", bucket="1 hour", aggs=[F.count(F.lit(1)).alias("n")]
        ).collect()
    }
    assert got == {
        t0: 2,
        datetime.fromisoformat("2024-01-01 11:17:00"): 1,
    }

    # malformed interval strings must raise, not silently mis-bucket
    # ("2 hours 30 minutes" once yielded 1-MINUTE buckets without error)
    import pytest

    df1 = spark.createDataFrame([(1, t0)], "id long, ts timestamp")
    for bad in ("2 hours 30 minutes", "", "90 min utes"):
        with pytest.raises(ValueError):
            sample_by_first_observation(
                df1, ts="ts", bucket=bad, aggs=[F.count(F.lit(1)).alias("n")]
            )
    with pytest.raises(ValueError):
        sample_by_first_observation(
            df1, ts="ts", bucket="3 weeks", aggs=[F.count(F.lit(1)).alias("n")]
        )


def test_repetition_metrics_edge_docs(spark):
    """q103's gram construction on degenerate docs: 1 token → no bigrams/
    trigrams; 2 tokens → one bigram, no trigram; fully repeated text →
    dup_frac → 1."""
    import questdb_etl_jobs_spark.queries.training  # noqa: F401 - registers
    from questdb_etl_jobs_spark.queries import REGISTRY

    q103 = REGISTRY["q103_repetition_metrics"].spark_fn
    # monkey-free: build the same plan over a tiny in-memory table by
    # reusing the query body via a temp view-compatible loader is
    # overkill — replicate the metric contract directly instead.
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b"), (3, "x x x x")],
        "doc_id long, text string",
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="q103_edge_")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        (r["doc_id"], r["gram_n"]): (r["top_frac"], r["dup_frac"])
        for r in q103(spark, d).collect()
    }
    # doc 1: one unigram row only (no 2/3-grams exist)
    assert out[(1, 1)] == (1.0, 0.0)
    assert (1, 2) not in out and (1, 3) not in out
    # doc 2: two distinct unigrams, one bigram
    assert out[(2, 1)] == (0.5, 0.0)
    assert out[(2, 2)] == (1.0, 0.0)
    assert (2, 3) not in out
    # doc 3: "x" ×4 — every gram occurrence a repeat of one gram
    assert out[(3, 1)] == (1.0, 0.75)
    assert out[(3, 2)] == (1.0, round(1 - 1 / 3, 4))
    assert out[(3, 3)] == (1.0, 0.5)


# ---------------------------------------------------------------------------
# Ordered funnel (q104 family)
# ---------------------------------------------------------------------------

def test_funnel_requires_time_order(spark):
    from questdb_etl_jobs_spark.operators.funnel import (
        funnel_counts,
        funnel_stages,
    )

    rows = [
        # u1: full ordered funnel
        (1, _ts("2024-01-01 10:00:00"), "view"),
        (1, _ts("2024-01-01 10:05:00"), "click"),
        (1, _ts("2024-01-01 10:10:00"), "purchase"),
        # u2: click BEFORE first view — must not convert past stage 1
        (2, _ts("2024-01-01 09:00:00"), "click"),
        (2, _ts("2024-01-01 10:00:00"), "view"),
        # u3: purchase before click (view, purchase, click) — stage 2
        (3, _ts("2024-01-01 10:00:00"), "view"),
        (3, _ts("2024-01-01 10:01:00"), "purchase"),
        (3, _ts("2024-01-01 10:02:00"), "click"),
        # u4: equal-ts tie — click at the exact ts of the first view
        # converts (>= semantics), then a later purchase completes it
        (4, _ts("2024-01-01 10:00:00"), "view"),
        (4, _ts("2024-01-01 10:00:00"), "click"),
        (4, _ts("2024-01-01 10:00:01"), "purchase"),
        # u5: never viewed — excluded entirely
        (5, _ts("2024-01-01 10:00:00"), "purchase"),
        # u6: non-funnel event types ignored
        (6, _ts("2024-01-01 10:00:00"), "error"),
        (6, _ts("2024-01-01 10:01:00"), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    steps = ["view", "click", "purchase"]

    stages = {
        r["user_id"]: r["max_stage"]
        for r in funnel_stages(df, steps).collect()
    }
    assert stages == {1: 3, 2: 1, 3: 2, 4: 3, 5: 0, 6: 1}

    counts = [tuple(r) for r in funnel_counts(df, steps).collect()]
    assert counts == [(1, "view", 5), (2, "click", 3), (3, "purchase", 2)]


def test_funnel_empty_and_filter_pushdown(spark, tmp_path):
    from questdb_etl_jobs_spark.operators.funnel import funnel_counts

    df = spark.createDataFrame(
        [], "user_id bigint, ts timestamp, event_type string"
    )
    out = funnel_counts(df, ["view", "click"]).collect()
    assert [tuple(r) for r in out] == [(1, "view", 0), (2, "click", 0)]

    # the step IN-filter must reach the parquet scan
    p = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "view")],
        ["user_id", "ts", "event_type"],
    ).write.parquet(p)
    plan = funnel_counts(
        spark.read.parquet(p), ["view", "click"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "In(event_type" in plan


def test_asof_tolerance_bounds_staleness(spark):
    from questdb_etl_jobs_spark.operators.asof import _interval_us

    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),   # match at -30s: fresh
            (2, _ts("2024-01-01 12:00:00")),   # match at -60s: boundary
            (3, _ts("2024-01-01 14:00:00")),   # match at -61s: stale
            (4, _ts("2024-01-01 16:00:00")),   # no right row at all
        ],
        ["id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (_ts("2024-01-01 09:59:30"), 10.0),
            (_ts("2024-01-01 11:59:00"), 20.0),
            (_ts("2024-01-01 13:58:59"), 30.0),
        ],
        ["ts", "px"],
    )
    out = {
        r["id"]: r["px"]
        for r in asof_join(left, right, on="ts", tolerance="1m").collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None, 4: None}

    inner = asof_join(left, right, on="ts", how="inner", tolerance="60s")
    assert sorted(r["id"] for r in inner.collect()) == [1, 2]

    # bucketed hot-key path: identical results
    bucketed = {
        r["id"]: r["px"]
        for r in asof_join(
            left, right, on="ts", tolerance="1 minute", bucket="1 hour"
        ).collect()
    }
    assert bucketed == out

    assert _interval_us("90s") == 90_000_000
    assert _interval_us("2h") == 2 * 3_600_000_000
    assert _interval_us("15 minutes") == 15 * 60_000_000
    with pytest.raises(ValueError):
        _interval_us("fortnight")


# ---------------------------------------------------------------------------
# duplicated_spans (ExactSubstr-style, q112)
# ---------------------------------------------------------------------------

def _spans_fixture(spark):
    # doc 1 and 2 share the 5-token run "a b c d e" (k=3 grams at pos
    # 0,1,2 in doc1; pos 2,3,4 in doc2). doc 3 is unique. doc 4 repeats
    # the shared run twice with a unique gap > k between occurrences.
    rows = [
        (1, "a b c d e x y z"),
        (2, "p q a b c d e"),
        (3, "u v w m n o r s"),
        (4, "a b c d e g1 g2 g3 g4 a b c d e"),
        (5, "xx"),  # shorter than k: emits no grams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicated_spans_merges_intervals(spark):
    from questdb_etl_jobs_spark.operators.dedup import duplicated_spans

    out = {
        r["doc_id"]: r
        for r in duplicated_spans(
            _spans_fixture(spark), k=3, hash_grams=False
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    # doc1: dup gram positions 0,1,2 -> one span covering tokens 0..4 = 5
    assert out[1]["n_spans"] == 1 and out[1]["covered_tokens"] == 5
    # doc2: positions 2,3,4 -> one span, 5 tokens
    assert out[2]["n_spans"] == 1 and out[2]["covered_tokens"] == 5
    # doc4: two disjoint occurrences (gap g1..g4 > k) -> 2 spans, 10 tokens
    assert out[4]["n_spans"] == 2 and out[4]["covered_tokens"] == 10


def test_duplicated_spans_hashed_equals_exact(spark):
    from questdb_etl_jobs_spark.operators.dedup import duplicated_spans

    df = _spans_fixture(spark)
    exact = sorted(
        map(tuple, duplicated_spans(df, k=3, hash_grams=False).collect())
    )
    hashed = sorted(
        map(tuple, duplicated_spans(df, k=3, hash_grams=True).collect())
    )
    assert exact == hashed


def test_weighted_sample_topk_is_deterministic_and_weight_biased(spark):
    from questdb_etl_jobs_spark.functions.sampling import weighted_sample_topk

    # Heavy rows (weight 1000) vs light rows (weight 1): with k = half the
    # population, heavies must be picked at a far higher rate, and the draw
    # must be identical across reruns/partitionings.
    rows = [(i, 1000 if i % 2 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")
    kept1 = sorted(r.id for r in weighted_sample_topk(df, "id", "w", k=100).collect())
    kept2 = sorted(
        r.id
        for r in weighted_sample_topk(
            df.repartition(7), "id", "w", k=100
        ).collect()
    )
    assert kept1 == kept2
    heavies = sum(1 for i in kept1 if i % 2)
    assert heavies > 80  # ~100 expected; rate for lights is ~1/1000

    # Salt decorrelates draws (uniform weights so selection is hash-driven;
    # in the biased draw above k equals the heavy count, so every heavy is
    # picked under ANY salt and the set can't move).
    uni = spark.createDataFrame([(i, 1) for i in range(200)], "id long, w long")
    base = sorted(r.id for r in weighted_sample_topk(uni, "id", "w", k=50).collect())
    salted = sorted(
        r.id for r in weighted_sample_topk(uni, "id", "w", k=50, salt=7).collect()
    )
    assert base != salted


def test_weighted_sample_topk_plan_is_take_ordered(spark):
    from questdb_etl_jobs_spark.functions.sampling import weighted_sample_topk
    from questdb_etl_jobs_spark.plans.inspect import plan_string

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("w")
    )
    plan = plan_string(weighted_sample_topk(df, "id", "w", k=10))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_exact_quantile_matches_builtin_percentile(spark):
    import random

    from questdb_etl_jobs_spark.operators.quantile import exact_quantile

    rng = random.Random(11)
    rows = [
        (f"g{i % 3}", rng.uniform(-1000, 1000)) for i in range(5000)
    ] + [("g3", 42.0)]  # single-row group
    df = spark.createDataFrame(rows, "g string, v double")
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        mine = {
            r.g: r.quantile
            for r in exact_quantile(df, "v", "g", q=q, buckets=64).collect()
        }
        ref = {
            r.g: r.p
            for r in df.groupBy("g")
            .agg(F.percentile("v", q).alias("p"))
            .collect()
        }
        assert set(mine) == set(ref)
        for g in ref:
            assert abs(mine[g] - ref[g]) < 1e-9, (q, g, mine[g], ref[g])


def test_exact_quantile_degenerate_and_nulls(spark):
    from questdb_etl_jobs_spark.operators.quantile import exact_quantile

    df = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("a", None), ("b", None)], "g string, v double"
    )
    out = {r.g: (r.n, r.quantile) for r in exact_quantile(df, "v", "g").collect()}
    # all-equal values (zero span) collapse to bucket 0; NULLs ignored;
    # the all-NULL group drops.
    assert out == {"a": (10, 5.0)}


def test_exact_quantile_null_group_key(spark):
    """A NULL group KEY is its own group (GROUP BY semantics) — the
    null-safe stats/target joins must not drop its rows."""
    from questdb_etl_jobs_spark.operators.quantile import exact_quantile

    df = spark.createDataFrame(
        [(None, float(v)) for v in range(1, 12)]
        + [("a", 1.0), ("a", 3.0)],
        "g string, v double",
    )
    out = {r.g: (r.n, r.quantile) for r in exact_quantile(df, "v", "g").collect()}
    assert out == {None: (11, 6.0), "a": (2, 2.0)}


def test_exact_quantile_broadcast_targets_is_hint_only(spark):
    """r19 (round-18 ADVICE): broadcast_targets defaults to False — the
    hint bypasses autoBroadcastJoinThreshold, so an unbounded group
    space must not get it implicitly. True stays available for callers
    that can bound the group domain, changes ONLY the refine-join
    strategy, and both faces return identical rows."""
    from questdb_etl_jobs_spark.operators.quantile import exact_quantile
    from questdb_etl_jobs_spark.plans.inspect import plan_string

    df = spark.range(3000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 13 % 997).cast("double").alias("v"),
    )
    hinted = exact_quantile(df, "v", "g", q=0.25, buckets=64,
                            broadcast_targets=True)
    plain = exact_quantile(df, "v", "g", q=0.25, buckets=64)
    # The hint pins a broadcast on the refine join's target side in the
    # STATIC plan; the default leaves strategy to the planner/AQE.
    assert "BroadcastHashJoin" in plan_string(hinted)
    got_h = sorted((r.g, r.n, r.quantile) for r in hinted.collect())
    got_p = sorted((r.g, r.n, r.quantile) for r in plain.collect())
    assert got_h == got_p  # same floats — the flag is strategy-only


def test_exact_quantile_high_cardinality_bounded_plan(spark):
    """Scale contract: 10⁴ groups must NOT inline per-group literals
    (round-6 verdict: the old create_map build was O(groups) driver
    memory AND plan size). The plan must stay O(1) in group count and
    the values must still be exact."""
    from questdb_etl_jobs_spark.operators.quantile import exact_quantile
    from questdb_etl_jobs_spark.plans.inspect import plan_string

    groups = 10_000
    df = spark.range(groups * 5).select(
        F.concat(F.lit("g"), (F.col("id") % groups)).alias("g"),
        (F.col("id") * 7 % 101).cast("double").alias("v"),
    )
    q = exact_quantile(df, "v", "g", q=0.5, buckets=64)
    plan = plan_string(q)
    assert "create_map" not in plan
    assert "g9999" not in plan  # no per-group literal leaked into the plan
    assert len(plan) < 200_000
    mine = {r.g: r.quantile for r in q.collect()}
    ref = {
        r.g: r.p
        for r in df.groupBy("g").agg(F.percentile("v", 0.5).alias("p")).collect()
    }
    assert len(mine) == groups
    for g in ("g0", "g1", "g4321", "g9999"):
        assert abs(mine[g] - ref[g]) < 1e-9


def test_ema_matches_recurrence_and_handles_nulls(spark):
    from questdb_etl_jobs_spark.operators.ema import ema

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, None), ("a", 4, 40.0),
        ("b", 1, None), ("b", 2, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, i int, v double").select(
        "k", "i", F.col("i").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r.k, r.i): r.ema
        for r in ema(df, key="k", ts="ts", value="v", alpha=0.25,
                     order=["i"]).collect()
    }
    # a: 10; 0.25*20+0.75*10=12.5; NULL carries 12.5; 0.25*40+0.75*12.5
    assert out[("a", 1)] == 10.0
    assert out[("a", 2)] == 12.5
    assert out[("a", 3)] == 12.5
    assert abs(out[("a", 4)] - (0.25 * 40 + 0.75 * 12.5)) < 1e-12
    # b: NULL before any value stays NULL; first value seeds the state.
    assert out[("b", 1)] is None
    assert out[("b", 2)] == 8.0


def test_ema_nonfinite_matches_original_numpy_face(spark):
    """r19 (round-18 ADVICE): a NaN STATE — producible only by ±inf
    arithmetic (+inf then -inf) — must surface as NULL and restart from
    the next value, exactly as the original numpy loop's
    ``np.isnan(state) → state = xi`` did. Property-tested: random mixes
    of finite/±inf/NaN/None values per key against a verbatim CPython
    port of the pre-r18 numpy recurrence."""
    import math
    import random

    from questdb_etl_jobs_spark.operators.ema import ema

    a = 0.25
    one_minus = 1.0 - a

    def reference(vals):
        # The original numpy loop, floats for np.float64 (same IEEE ops);
        # NULL inputs arrive as NaN there (Arrow float64 has no None).
        state = float("nan")
        ys = []
        for xi in vals:
            x = float("nan") if xi is None else xi
            if math.isnan(x):
                ys.append(None if math.isnan(state) else state)
                continue
            state = x if math.isnan(state) else a * x + one_minus * state
            ys.append(None if math.isnan(state) else state)
        return ys

    rng = random.Random(1719)
    pool = [
        None, float("nan"), float("inf"), float("-inf"),
        0.0, -1.5, 2.25, 1e308, -1e308,
    ]
    rows = []
    expected = {}
    for k in range(12):
        key = f"k{k}"
        vals = [rng.choice(pool) for _ in range(rng.randrange(1, 9))]
        if k == 0:  # pin the motivating case explicitly
            vals = [float("inf"), float("-inf"), 5.0, 7.0]
        ref = reference(vals)
        for i, (v, e) in enumerate(zip(vals, ref)):
            rows.append((key, i, v))
            expected[(key, i)] = e
    df = spark.createDataFrame(
        rows, "k string, i int, v double"
    ).select("k", "i", F.col("i").cast("timestamp").alias("ts"), "v")
    got = {
        (r.k, r.i): r.ema
        for r in ema(df, key="k", ts="ts", value="v", alpha=a,
                     order=["i"]).collect()
    }
    assert set(got) == set(expected)
    for kk, e in expected.items():
        g = got[kk]
        if e is None:
            assert g is None, (kk, g)
        elif math.isnan(e):
            assert g is not None and math.isnan(g), (kk, g)
        else:
            assert g == e, (kk, g, e)  # bit-identical, not approx
    # The pinned case: +inf seeds, inf-inf → NULL, then a clean restart.
    assert got[("k0", 0)] == float("inf")
    assert got[("k0", 1)] is None
    assert got[("k0", 2)] == 5.0
    assert got[("k0", 3)] == a * 7.0 + one_minus * 5.0


def test_ema_validates_alpha(spark):
    import pytest

    from questdb_etl_jobs_spark.operators.ema import ema

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, ts int, v double")
    with pytest.raises(ValueError):
        ema(df, key="k", ts="ts", value="v", alpha=0.0)
    with pytest.raises(ValueError):
        ema(df, key="k", ts="ts", value="v", alpha=1.5)


def test_counter_increase_resets_and_nulls(spark):
    from questdb_etl_jobs_spark.operators.counter import counter_increase

    rows = [
        ("a", 1, 10), ("a", 2, 25), ("a", 3, 5),    # drop: reset -> 5
        ("a", 4, None), ("a", 5, 9),                 # null scrape skipped
        ("b", 1, 100),                               # lone first sample
    ]
    df = spark.createDataFrame(rows, "k string, ts int, v long")
    out = {
        (r.k, r.ts): r.increase
        for r in counter_increase(df, key="k", ts="ts", value="v").collect()
    }
    assert out[("a", 1)] is None      # no prior observation
    assert out[("a", 2)] == 15
    assert out[("a", 3)] == 5         # 25 -> 5 is a reset: count the 5
    assert out[("a", 4)] is None      # missing scrape
    assert out[("a", 5)] == 4         # baseline skips the null back to 5
    assert out[("b", 1)] is None


def test_histogram_quantile_rollup_merges_partials(spark):
    """Quantile answered from merged per-part histograms lands within
    one bucket width of the exact quantile, for any subset of parts —
    the mergeability contract."""
    import random

    from questdb_etl_jobs_spark.operators.quantile import (
        histogram_partials,
        quantile_from_partials,
    )

    rng = random.Random(3)
    rows = [("g", i % 4, rng.uniform(0.0, 1000.0)) for i in range(8000)]
    df = spark.createDataFrame(rows, "g string, day int, v double")
    lo, hi, buckets = 0.0, 1000.0, 512
    width = (hi - lo) / buckets
    partials = histogram_partials(df, ["g", "day"], "v", lo, hi, buckets)
    for q in (0.1, 0.5, 0.9):
        # Full merge vs exact.
        full = quantile_from_partials(
            partials, ["g"], q, lo, hi, buckets
        ).collect()[0]
        exact = df.agg(F.percentile("v", q)).collect()[0][0]
        assert full["n"] == 8000
        assert abs(full["est"] - exact) <= width
        # Subset merge (days 0-1 only) vs exact over that subset.
        sub = quantile_from_partials(
            partials.filter(F.col("day") < 2), ["g"], q, lo, hi, buckets
        ).collect()[0]
        sub_exact = (
            df.filter(F.col("day") < 2).agg(F.percentile("v", q)).collect()[0][0]
        )
        assert sub["n"] == 4000
        assert abs(sub["est"] - sub_exact) <= width


def test_sign_project_preserves_distances(spark):
    """JL contract on a fixed seed: scaled pairwise distances after the
    16-dim sign projection stay within a loose (deterministic, seeded)
    distortion band of the 64-dim originals."""
    import math
    import random

    from questdb_etl_jobs_spark.functions.vectors import (
        projection_signs,
        sign_project,
    )

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    signs = projection_signs(64, 16, seed=7)
    proj = {
        r.id: r.p
        for r in df.select("id", sign_project("v", signs).alias("p")).collect()
    }
    orig = dict(rows)
    ratios = []
    for i in range(0, 30, 3):
        for j in range(1, 30, 7):
            if i == j:
                continue
            d0 = math.dist(orig[i], orig[j])
            d1 = math.dist(proj[i], proj[j])
            ratios.append(d1 / d0)
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2, mean
    assert all(0.45 < r < 1.75 for r in ratios), (min(ratios), max(ratios))


def test_matview_refresh_handles_late_data(spark, tmp_path):
    """Partials are arrival-order-independent: a late batch overlapping
    already-refreshed days merges to exactly the direct recompute,
    including first/last pairs and decimal sums."""
    from questdb_etl_jobs_spark.operators.matview import (
        read_sample_by_view,
        refresh_sample_by_view,
        sample_by_partials,
        _merge,
    )

    rows = [
        (_ts(f"2024-01-0{d} {h:02d}:00:0{s}"), "t", float(d * 100 + h + s))
        for d in (1, 2)
        for h in (0, 5)
        for s in (1, 7)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    path = str(tmp_path / "mv")
    # On-time batch = day 1 + half of day 2; late batch backfills day 1
    # hours AND finishes day 2 — out of order on purpose.
    on_time = df.filter(
        (F.col("ts") < "2024-01-02") | (F.col("ts") >= "2024-01-02 05:00:00")
    ).filter(F.col("ts").substr(18, 2) != "07")
    late = df.exceptAll(on_time)
    refresh_sample_by_view(spark, on_time, path, "ts", "day", "v", ["k"])
    refresh_sample_by_view(spark, late, path, "ts", "day", "v", ["k"])
    got = sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    )
    direct = _merge(sample_by_partials(df, "ts", "day", "v", ["k"]), ["k"])
    expected = sorted(
        map(
            tuple,
            direct.select(
                "bucket_ts", "k", "n",
                F.col("dsum").cast("double").alias("total"),
                (F.col("dsum").cast("double") / F.col("n")).alias("avg"),
                "vmin", "vmax",
                F.col("first.v").alias("first_val"),
                F.col("last.v").alias("last_val"),
            ).collect(),
        )
    )
    assert got == expected and len(got) == 2  # one row per day


def test_matview_exactly_once_replay_bit_identical(spark, tmp_path):
    """Crash-replay proof: re-applying a batch under the SAME batch_id
    (what a foreachBatch redelivery does after a crash between the
    partition overwrite and the checkpoint commit) leaves the view
    bit-identical — the staged design recomputes from identical staged
    state instead of double-merging partials."""
    from questdb_etl_jobs_spark.operators.matview import (
        read_sample_by_view,
        refresh_sample_by_view_exactly_once,
    )

    rows = [
        (_ts(f"2024-01-0{d} {h:02d}:00:0{s}"), "t", float(d * 100 + h + s))
        for d in (1, 2)
        for h in (0, 5)
        for s in (1, 7)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    path = str(tmp_path / "mv")
    b0 = df.filter(F.col("ts") < "2024-01-02")
    b1 = df.filter(F.col("ts") >= "2024-01-02")
    refresh_sample_by_view_exactly_once(
        spark, b0, path, 0, "ts", "day", "v", ["k"]
    )
    refresh_sample_by_view_exactly_once(
        spark, b1, path, 1, "ts", "day", "v", ["k"]
    )
    # Raw partial rows (decimals included), not just the finalized face.
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    # Redeliver batch 1 — twice, for good measure.
    refresh_sample_by_view_exactly_once(
        spark, b1, path, 1, "ts", "day", "v", ["k"]
    )
    refresh_sample_by_view_exactly_once(
        spark, b1, path, 1, "ts", "day", "v", ["k"]
    )
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    # And the view still equals the incremental-path answer on all rows.
    got = sorted(map(tuple, read_sample_by_view(spark, path).collect()))
    assert len(got) == 2 and all(r[2] == 4 for r in got)  # n per day


def test_matview_exactly_once_compaction(spark, tmp_path):
    """compact_staged_batches folds staged history into one base batch:
    the finalized view is unchanged, the old batch dirs are gone, and a
    post-compaction refresh (late data) still recomputes correctly."""
    from questdb_etl_jobs_spark.operators.matview import (
        _staged_dir,
        compact_staged_batches,
        read_sample_by_view,
        refresh_sample_by_view_exactly_once,
    )

    rows = [
        (_ts(f"2024-01-01 {h:02d}:00:00"), "t", float(h)) for h in range(6)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    path = str(tmp_path / "mv")
    for i in range(3):
        refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    before = sorted(map(tuple, read_sample_by_view(spark, path).collect()))
    compact_staged_batches(spark, path)
    ids = {
        r[0]
        for r in spark.read.option("basePath", _staged_dir(path))
        .parquet(_staged_dir(path)).select("batch_id").distinct().collect()
    }
    assert ids == {-1}
    # View partitions untouched by compaction; a late batch after
    # compaction merges base + new correctly.
    assert sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    ) == before
    late = spark.createDataFrame(
        [(_ts("2024-01-01 23:00:00"), "t", 99.0)],
        "ts timestamp, k string, v double",
    )
    refresh_sample_by_view_exactly_once(
        spark, late, path, 3, "ts", "day", "v", ["k"]
    )
    got = read_sample_by_view(spark, path).collect()
    assert len(got) == 1 and got[0].n == 7 and got[0].vmax == 99.0
    assert got[0].last_val == 99.0


def _mv_rows(spark):
    rows = [
        (_ts(f"2024-01-01 {h:02d}:00:00"), "t", float(h)) for h in range(6)
    ]
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def _mv_reference(spark, df_all, tmp_path, name):
    """Expected view contents: one clean refresh of all rows."""
    from questdb_etl_jobs_spark.operators.matview import (
        read_sample_by_view,
        refresh_sample_by_view_exactly_once,
    )

    ref_path = str(tmp_path / name)
    refresh_sample_by_view_exactly_once(
        spark, df_all, ref_path, 0, "ts", "day", "v", ["k"]
    )
    return sorted(map(tuple, read_sample_by_view(spark, ref_path).collect()))


def test_matview_compaction_crash_before_log_commit(spark, tmp_path):
    """Compactor crash AFTER the fold write but BEFORE the log commit
    (the round-8 ADVICE double-count window): the unclaimed fold must be
    ignored by recompute — the originals stay authoritative — and the
    next compaction must recover to a single folded base with the view
    bit-identical to a clean run throughout."""
    from questdb_etl_jobs_spark.operators.matview import (
        _staged_dir,
        compact_staged_batches,
        read_sample_by_view,
        refresh_sample_by_view_exactly_once,
    )

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(3):
        refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    compact_staged_batches(spark, path, _crash_after_fold=True)
    # Fold -1 AND originals 0..2 are both staged now. A refresh landing
    # on this crashed state must not double-count history.
    late = spark.createDataFrame(
        [(_ts("2024-01-01 23:00:00"), "t", 99.0)],
        "ts timestamp, k string, v double",
    )
    refresh_sample_by_view_exactly_once(
        spark, late, path, 3, "ts", "day", "v", ["k"]
    )
    want = _mv_reference(spark, df.union(late), tmp_path, "mv_ref")
    assert sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    ) == want
    # Re-running compaction recovers: the unclaimed fold is discarded,
    # the originals fold into a fresh base, the view is untouched. The
    # dead holder's lease is still on disk — lease_ttl_sec=0 makes it
    # immediately stale, exercising the takeover rule.
    assert compact_staged_batches(spark, path, lease_ttl_sec=0.0)
    ids = {
        r[0]
        for r in spark.read.option("basePath", _staged_dir(path))
        .parquet(_staged_dir(path)).select("batch_id").distinct().collect()
    }
    assert all(i < 0 for i in ids) and len(ids) == 1
    assert sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    ) == want


def test_matview_compaction_interleaved_refresh_not_lost(spark, tmp_path):
    """The fence the round-8 verdict asked for: a refresh that lands
    BETWEEN the compactor's log commit and its deletes (and another
    landing before a crashed delete pass is re-run) is never lost and
    never double-counted — the compaction log, not timing, decides
    which dirs are authoritative."""
    from questdb_etl_jobs_spark.operators.matview import (
        _staged_dir,
        compact_staged_batches,
        read_sample_by_view,
        refresh_sample_by_view_exactly_once,
    )

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(3):
        refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    # Compactor pauses after its commit point, deletes still pending.
    compact_staged_batches(spark, path, _crash_after_log=True)
    # Interleaved refresh: stages batch 3 while superseded dirs linger.
    late = spark.createDataFrame(
        [(_ts("2024-01-01 23:00:00"), "t", 99.0)],
        "ts timestamp, k string, v double",
    )
    refresh_sample_by_view_exactly_once(
        spark, late, path, 3, "ts", "day", "v", ["k"]
    )
    want = _mv_reference(spark, df.union(late), tmp_path, "mv_ref")
    assert sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    ) == want
    # The compactor "resumes" (re-run): finishes the logged deletes,
    # then folds {previous fold, batch 3} into a fresh base. Nothing
    # lost, nothing doubled. The crashed holder's lease is taken over
    # via lease_ttl_sec=0 (immediately stale).
    assert compact_staged_batches(spark, path, lease_ttl_sec=0.0)
    ids = {
        r[0]
        for r in spark.read.option("basePath", _staged_dir(path))
        .parquet(_staged_dir(path)).select("batch_id").distinct().collect()
    }
    assert all(i < 0 for i in ids) and len(ids) == 1
    assert sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    ) == want


def test_matview_compaction_skips_uncommitted_batch_dir(spark, tmp_path):
    """A batch dir with no _SUCCESS marker (a concurrent refresh caught
    mid-write) is neither folded nor deleted by compaction, and
    recompute ignores it until its job commits."""
    import os

    from questdb_etl_jobs_spark.operators.matview import (
        _staged_dir,
        compact_staged_batches,
        read_sample_by_view,
        refresh_sample_by_view_exactly_once,
    )

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(3):
        refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    # Simulate the mid-write window by removing batch 2's commit marker.
    marker = os.path.join(_staged_dir(path), "batch_id=2", "_SUCCESS")
    os.remove(marker)
    compact_staged_batches(spark, path)
    staged_ids = {
        r[0]
        for r in spark.read.option("basePath", _staged_dir(path))
        .parquet(_staged_dir(path)).select("batch_id").distinct().collect()
    }
    # Batches 0,1 folded; uncommitted 2 untouched on disk.
    assert staged_ids == {-1, 2}
    # Its writer "commits" (restage batch 2 properly): the view heals to
    # the full answer and the next compaction absorbs it.
    refresh_sample_by_view_exactly_once(
        spark, df.filter(F.hour("ts") % 3 == 2), path, 2,
        "ts", "day", "v", ["k"],
    )
    want = _mv_reference(spark, df, tmp_path, "mv_ref")
    assert sorted(
        map(tuple, read_sample_by_view(spark, path).collect())
    ) == want


def test_matview_compactor_lease_mutual_exclusion(spark, tmp_path):
    """Round-9 verdict task #4: two compactors can't race the shared
    log. A second compactor finding a live lease no-ops (returns False,
    staged dirs untouched); after release it proceeds; a STALE lease
    (crashed holder) is taken over under lease_ttl_sec."""
    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(3):
        mv.refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    staged = mv._staged_dir(path)
    # First "compactor" holds the lease (acquired out-of-band, as if
    # mid-protocol in another process).
    assert mv._acquire_compaction_lease(spark, staged, 600.0)
    ids_before = {
        r[0]
        for r in spark.read.option("basePath", staged)
        .parquet(staged).select("batch_id").distinct().collect()
    }
    # Second compactor: live lock → no-op, nothing folded or deleted.
    assert mv.compact_staged_batches(spark, path) is False
    ids_after = {
        r[0]
        for r in spark.read.option("basePath", staged)
        .parquet(staged).select("batch_id").distinct().collect()
    }
    assert ids_after == ids_before == {0, 1, 2}
    # Holder releases → compaction proceeds and folds.
    mv._release_compaction_lease(spark, staged)
    assert mv.compact_staged_batches(spark, path) is True
    ids = {
        r[0]
        for r in spark.read.option("basePath", staged)
        .parquet(staged).select("batch_id").distinct().collect()
    }
    assert ids == {-1}
    # Crashed-holder takeover: plant a lock, ttl=0 makes it stale.
    assert mv._acquire_compaction_lease(spark, staged, 600.0)
    assert mv.compact_staged_batches(spark, path, lease_ttl_sec=0.0) is True


def test_matview_lease_heartbeat_prevents_live_takeover(spark, tmp_path):
    """Round-10 ADVICE (matview.py lease): the lease must distinguish a
    SLOW holder from a DEAD one. A holder heartbeats (mtime renewal +
    token check) between protocol steps, so a concurrent compactor's
    TTL check sees a fresh lock and no-ops even when the lease is older
    than lease_ttl_sec in wall-clock terms; takeover fires only after
    the holder stops renewing. A dispossessed holder's next heartbeat
    raises BEFORE any destructive step, and its token-checked release
    cannot delete the taker's lock."""
    import os
    import time as _time

    import pytest

    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(2):
        mv.refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 2 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    staged = mv._staged_dir(path)
    t1 = mv._acquire_compaction_lease(spark, staged, 600.0)
    assert t1
    lock = os.path.join(staged, "_compaction.lock")
    old = _time.time() - 7200
    os.utime(lock, (old, old))
    # The slow-but-live holder renews between protocol steps…
    mv._renew_compaction_lease(spark, staged, t1)
    # …so a concurrent compactor sees a FRESH lock: no takeover.
    assert mv._acquire_compaction_lease(spark, staged, 600.0) is None
    assert mv.compact_staged_batches(spark, path, lease_ttl_sec=600.0) is False
    jvm, fs = mv._hadoop_fs(spark, staged)
    assert mv._lock_token(jvm, fs, staged) == t1
    # Dead holder: renewals stop, the lock ages out → takeover wins…
    os.utime(lock, (old, old))
    t2 = mv._acquire_compaction_lease(spark, staged, 600.0)
    assert t2 and t2 != t1
    # …and the dispossessed holder aborts at its next heartbeat,
    # before its log commit / deletes could race the taker's.
    with pytest.raises(RuntimeError, match="lease.*lost"):
        mv._renew_compaction_lease(spark, staged, t1)
    # Token-checked release: t1's release leaves the taker's lock.
    mv._release_compaction_lease(spark, staged, t1)
    assert mv._lock_token(jvm, fs, staged) == t2
    mv._release_compaction_lease(spark, staged, t2)
    assert mv._lock_token(jvm, fs, staged) is None


def test_matview_refresh_batch_folded_mid_refresh_proceeds(
    spark, tmp_path, monkeypatch
):
    """Round-10 ADVICE (matview.py:448): a concurrent compactor that
    folds the just-staged batch between the refresh's stage write and
    its committed-dir listing makes the batch vanish from the listing —
    but its content lives in the logged fold, so the refresh must
    PROCEED through the fold, not raise the missing-_SUCCESS
    misconfiguration error."""
    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    mv.refresh_sample_by_view_exactly_once(
        spark, df.filter(F.hour("ts") < 3), path, 0, "ts", "day", "v", ["k"]
    )
    real_list = mv._committed_batch_dirs
    fired = {"done": False}

    def list_after_compactor(spark_, staged_):
        # First listing of the second refresh: a compactor lands first,
        # folding batch 0 AND the just-staged batch 1 (log committed,
        # dirs step-5-deleted) — the exact interleaving the ADVICE
        # describes.
        if not fired["done"]:
            fired["done"] = True
            assert mv.compact_staged_batches(spark_, path) is True
        return real_list(spark_, staged_)

    monkeypatch.setattr(mv, "_committed_batch_dirs", list_after_compactor)
    mv.refresh_sample_by_view_exactly_once(
        spark, df.filter(F.hour("ts") >= 3), path, 1, "ts", "day", "v", ["k"]
    )
    assert fired["done"]
    want = _mv_reference(spark, df, tmp_path, "mv_ref_folded_mid")
    assert sorted(
        map(tuple, mv.read_sample_by_view(spark, path).collect())
    ) == want


def test_matview_compaction_log_is_versioned_never_absent(spark, tmp_path):
    """Round-9 ADVICE (matview.py:287): the log commit must never pass
    through a no-log state. Commits write monotonically versioned
    files; the highest version wins; legacy unversioned logs read as
    version 0 and are GC'd by the next commit."""
    import json
    import os

    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(3):
        mv.refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    staged = mv._staged_dir(path)
    assert mv.compact_staged_batches(spark, path)
    logs = [f for f in os.listdir(staged) if f.startswith("_compaction_log")]
    assert logs == ["_compaction_log.1.json"]
    # Second compaction (fold + one late batch): version bumps to 2 and
    # version 1 is GC'd only after 2 exists — never zero logs on disk.
    late = spark.createDataFrame(
        [(_ts("2024-01-01 23:00:00"), "t", 99.0)],
        "ts timestamp, k string, v double",
    )
    mv.refresh_sample_by_view_exactly_once(
        spark, late, path, 3, "ts", "day", "v", ["k"]
    )
    assert mv.compact_staged_batches(spark, path)
    logs = [f for f in os.listdir(staged) if f.startswith("_compaction_log")]
    assert logs == ["_compaction_log.2.json"]
    ver, entries = mv._read_compaction_log_versioned(spark, staged)
    assert ver == 2 and len(entries) == 2
    # Legacy unversioned file (round-9 layout) reads as version 0...
    legacy_dir = tmp_path / "legacy__batches"
    legacy_dir.mkdir()
    (legacy_dir / "_compaction_log.json").write_text(
        json.dumps([{"fold_id": -1, "superseded": [0, 1]}])
    )
    ver0, entries0 = mv._read_compaction_log_versioned(
        spark, str(legacy_dir)
    )
    assert ver0 == 0 and entries0[0]["fold_id"] == -1
    # ...and the next commit supersedes it with version 1, GC'ing it.
    mv._write_compaction_log(spark, str(legacy_dir), entries0)
    names = sorted(
        f for f in os.listdir(legacy_dir) if f.startswith("_compaction_log")
    )
    assert names == ["_compaction_log.1.json"]


def test_matview_refresh_stable_snapshot_under_compaction_race(
    spark, tmp_path, monkeypatch
):
    """Round-9 ADVICE (matview.py:313): a compactor's fold+log commit
    landing BETWEEN the refresh's log read and dir listing must not
    drop the superseded batches from the recompute. The log→list→log
    sandwich detects the torn snapshot and re-resolves."""
    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    for i in range(3):
        mv.refresh_sample_by_view_exactly_once(
            spark, df.filter(F.hour("ts") % 3 == i), path, i,
            "ts", "day", "v", ["k"],
        )
    staged = mv._staged_dir(path)
    # Pre-compaction snapshot = what a torn reader would see.
    pre_log = mv._read_compaction_log_versioned(spark, staged)
    pre_committed = dict(mv._committed_batch_dirs(spark, staged))
    # Compactor commits its fold + log; deletes pending (originals
    # linger) — the exact window the ADVICE describes.
    mv.compact_staged_batches(spark, path, _crash_after_log=True)
    real_log = mv._read_compaction_log_versioned
    real_list = mv._committed_batch_dirs
    calls = {"log": 0, "list": 0}

    def torn_log(spark_, staged_):
        calls["log"] += 1
        return pre_log if calls["log"] == 1 else real_log(spark_, staged_)

    def torn_list(spark_, staged_):
        calls["list"] += 1
        if calls["list"] == 1:
            return dict(pre_committed)  # stale: fold dir missing
        return real_list(spark_, staged_)

    monkeypatch.setattr(mv, "_read_compaction_log_versioned", torn_log)
    monkeypatch.setattr(mv, "_committed_batch_dirs", torn_list)
    late = spark.createDataFrame(
        [(_ts("2024-01-01 23:00:00"), "t", 99.0)],
        "ts timestamp, k string, v double",
    )
    mv.refresh_sample_by_view_exactly_once(
        spark, late, path, 3, "ts", "day", "v", ["k"]
    )
    assert calls["log"] >= 3  # torn snapshot was detected and retried
    want = _mv_reference(spark, df.union(late), tmp_path, "mv_ref")
    assert sorted(
        map(tuple, mv.read_sample_by_view(spark, path).collect())
    ) == want


def test_matview_refresh_descriptive_error_without_success_marker(
    spark, tmp_path, monkeypatch
):
    """Round-9 ADVICE (matview.py:178): with _SUCCESS markers disabled
    (mapreduce.fileoutputcommitter.marksuccessfuljobs=false) every
    staged dir is invisible; the refresh must fail with an error that
    names the marker requirement, not an opaque empty-parquet error."""
    import pytest

    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    hconf = spark._jsc.hadoopConfiguration()
    saved = hconf.get("mapreduce.fileoutputcommitter.marksuccessfuljobs")
    hconf.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    try:
        with pytest.raises(RuntimeError, match="_SUCCESS"):
            mv.refresh_sample_by_view_exactly_once(
                spark, df, path, 0, "ts", "day", "v", ["k"]
            )
    finally:
        if saved is None:
            hconf.unset("mapreduce.fileoutputcommitter.marksuccessfuljobs")
        else:
            hconf.set(
                "mapreduce.fileoutputcommitter.marksuccessfuljobs", saved
            )


def test_retention_missing_table_is_noop(spark, tmp_path):
    """Round-9 ADVICE (designated.py:472): retention against a missing
    or fully-dropped table is an idempotent no-op, not a raw
    FileNotFoundException."""
    from questdb_etl_jobs_spark.plans.designated import (
        drop_partitions,
        enforce_ttl,
        list_partitions,
    )

    ghost = str(tmp_path / "never_written")
    assert list_partitions(spark, ghost, "ts") == []
    assert drop_partitions(
        spark, ghost, "ts", older_than="2024-06-01"
    ) == []
    assert enforce_ttl(spark, ghost, "ts", 7, "2024-06-01") == []


def test_matview_refresh_raises_on_unreadable_existing_view(spark, tmp_path):
    """An EXISTING but unreadable view path must raise, never be
    mistaken for first-refresh and overwritten with one batch's
    partials (the history-wipe failure mode)."""
    import pytest

    from questdb_etl_jobs_spark.operators.matview import (
        refresh_sample_by_view,
    )

    path = tmp_path / "mv"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"not a parquet footer")
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:00:00"), "t", 1.0)],
        "ts timestamp, k string, v double",
    )
    with pytest.raises(Exception):
        refresh_sample_by_view(spark, df, str(path), "ts", "day", "v", ["k"])
    # The corrupt store was not silently replaced.
    assert (path / "part-00000.parquet").read_bytes() == b"not a parquet footer"


def test_heavy_hitters_small_sketch_still_exact_on_skew(spark):
    """counters ≪ vocabulary: the MG candidate pass must still surface
    the true top-k when their counts clear the N/counters bound, with
    the guaranteed flag set; partial output stays bounded."""
    from questdb_etl_jobs_spark.operators.heavyhitters import (
        heavy_hitters_topk,
        misra_gries_partials,
    )

    # 3 hot keys (600/300/150) over 500 singleton tail keys; N = 1550.
    rows = (
        [("hot_a",)] * 600 + [("hot_b",)] * 300 + [("hot_c",)] * 150
        + [(f"tail_{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "token string").repartition(8)
    out = heavy_hitters_topk(df, "token", k=3, counters=16).collect()
    assert [(r.token, r.cnt) for r in out] == [
        ("hot_a", 600), ("hot_b", 300), ("hot_c", 150)
    ]
    # 150 * 16 > 1550: every returned row clears the bound.
    assert all(r.guaranteed for r in out)
    # Partial pass emits <= counters rows per partition.
    per_part = (
        misra_gries_partials(df, "token", 16)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert max(r["count"] for r in per_part) <= 16

    import pytest

    with pytest.raises(ValueError):
        heavy_hitters_topk(df, "token", k=8, counters=4)


def test_heavy_hitters_auto_escalates_to_exact(spark):
    """Adversarial start: counters far below the skew threshold (the
    first pass provably cannot guarantee its rows). The operator must
    escalate the sketch on its own and still return the exact top-k
    with every row guaranteed."""
    from questdb_etl_jobs_spark.operators.heavyhitters import (
        _topk_pass,
        heavy_hitters_topk,
    )

    # N = 3000: hot 200/150/100, tail 2550 singletons. counters=8 →
    # bound N/8 = 375 > 200: nothing guaranteeable. Exactness needs
    # 100*c > 3000 → c ≥ 32, i.e. two doublings from 8.
    rows = (
        [("hot_a",)] * 200 + [("hot_b",)] * 150 + [("hot_c",)] * 100
        + [(f"tail_{i}",) for i in range(2550)]
    )
    df = spark.createDataFrame(rows, "token string").repartition(8)
    # The starting sketch really is below the threshold:
    first = _topk_pass(
        df.filter(F.col("token").isNotNull()), "token", 3, 8
    ).collect()
    assert not all(r.guaranteed for r in first)
    out = heavy_hitters_topk(df, "token", k=3, counters=8).collect()
    assert [(r.token, r.cnt) for r in out] == [
        ("hot_a", 200), ("hot_b", 150), ("hot_c", 100)
    ]
    assert all(r.guaranteed for r in out)


def test_heavy_hitters_flat_distribution_reports_unproven(spark):
    """A distribution flat enough to exhaust the escalation budget
    returns rows with honest guaranteed=false flags instead of looping
    or lying."""
    from questdb_etl_jobs_spark.operators.heavyhitters import (
        heavy_hitters_topk,
    )

    # 600 keys × 5 occurrences: N=3000, every count=5. With counters=8
    # and 1 escalation (max 16), bound stays 3000/16 >> 5.
    rows = [(f"k{i:03d}",) for i in range(600) for _ in range(5)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    out = heavy_hitters_topk(
        df, "token", k=3, counters=8, max_escalations=1
    ).collect()
    # MG decrements can evict almost everything on flat data, so the
    # candidate set may hold fewer than k keys — honest, as long as
    # nothing claims to be guaranteed.
    assert 1 <= len(out) <= 3 and all(r.cnt <= 5 for r in out)
    assert not any(r.guaranteed for r in out)


def test_heavy_hitters_short_result_escalates_not_vacuous(spark):
    """Flat data evicts MG slots, so a pass can return FEWER than k
    rows; ``all(guaranteed)`` is vacuously true on such a truncated set
    and must NOT end escalation (round-8 ADVICE). With budget to reach
    counters ≥ ndv the operator must land on the exact deterministic
    top-k (all counts tie at 5; ties break on the key)."""
    from questdb_etl_jobs_spark.operators.heavyhitters import (
        heavy_hitters_topk,
    )

    rows = [(f"k{i:03d}",) for i in range(600) for _ in range(5)]
    df = spark.createDataFrame(rows, "token string").repartition(8)
    # 8 -> 1024 needs 7 doublings; at counters=1024 >= 600 distinct, MG
    # never decrements, the candidate set is complete, and every count
    # clears N/counters = 3000/1024 < 5.
    out = heavy_hitters_topk(
        df, "token", k=3, counters=8, max_escalations=7
    ).collect()
    assert [(r.token, r.cnt, r.guaranteed) for r in out] == [
        ("k000", 5, True), ("k001", 5, True), ("k002", 5, True)
    ]


def test_heavy_hitters_fewer_distinct_than_k_is_complete(spark):
    """ndv < k: the complete ranking comes back (ndv rows) flagged
    guaranteed — nothing can have been pruned when every distinct value
    is a candidate — without burning the escalation budget on an
    unreachable k-row result."""
    from questdb_etl_jobs_spark.operators.heavyhitters import (
        heavy_hitters_topk,
    )

    rows = [("a",)] * 7 + [("b",)] * 2
    df = spark.createDataFrame(rows, "token string").repartition(4)
    out = heavy_hitters_topk(
        df, "token", k=5, counters=8, max_escalations=2
    ).collect()
    assert [(r.token, r.cnt) for r in out] == [("a", 7), ("b", 2)]
    assert all(r.guaranteed for r in out)


def test_haversine_known_distances(spark):
    """Spot values against independently computed great-circle distances
    (mean Earth radius 6371.0088 km): 1 degree of longitude on the
    equator, and Paris->NYC."""
    from questdb_etl_jobs_spark.functions.geo import haversine_km

    df = spark.createDataFrame(
        [
            (0.0, 0.0, 0.0, 1.0, 111.195),     # 1 deg lon at equator
            (48.8566, 2.3522, 40.7128, -74.0060, 5837.15),  # Paris-NYC
            (10.0, 20.0, 10.0, 20.0, 0.0),     # same point
            (89.9, 0.0, -89.9, 180.0, 20015.11),  # exactly antipodal
        ],
        "lat1 double, lon1 double, lat2 double, lon2 double, want double",
    )
    rows = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"),
                     F.col("lat2"), F.col("lon2")).alias("got"),
        "want",
    ).collect()
    for r in rows:
        assert abs(r.got - r.want) < 0.5, (r.got, r.want)


def test_haversine_dist_deg_track_total(spark):
    """Per-key mileage: sum of consecutive segments in ts order;
    single-point keys report 0.0; a shared timestamp is broken by the
    tiebreak column."""
    from questdb_etl_jobs_spark.functions.geo import (
        haversine_dist_deg,
        haversine_km,
    )

    rows = [
        ("a", 1, 1, 0.0, 0.0),
        ("a", 2, 2, 0.0, 1.0),
        ("a", 2, 3, 0.0, 3.0),   # same ts as id 2: ordered by id
        ("b", 1, 4, 50.0, 50.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, t long, id long, lat double, lon double"
    ).withColumn("ts", F.timestamp_seconds("t"))
    out = {
        r.k: r.distance_km
        for r in haversine_dist_deg(
            df, "lat", "lon", "ts", keys=["k"], tiebreak=["id"]
        ).collect()
    }
    one_deg = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0))
        .alias("d")
    ).first().d
    two_deg = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(1.0), F.lit(0.0), F.lit(3.0))
        .alias("d")
    ).first().d
    assert abs(out["a"] - (one_deg + two_deg)) < 1e-9
    assert out["b"] == 0.0


def test_geohash_known_values(spark):
    """Published geohash test vectors (Skagen 'u4pruyd', Paris
    'u09tvw0', Sydney 'r3gx2f7') plus the domain corners."""
    from questdb_etl_jobs_spark.functions.geo import geohash_encode

    cases = [
        (57.64911, 10.40744, "u4pruyd"),
        (48.8566, 2.3522, "u09tvw0"),
        (-33.8688, 151.2093, "r3gx2f7"),
        (0.0, 0.0, "s000000"),
        (90.0, 180.0, "zzzzzzz"),
        (-90.0, -180.0, "0000000"),
    ]
    df = spark.createDataFrame(cases, "lat double, lon double, want string")
    rows = df.select(
        geohash_encode(F.col("lat"), F.col("lon"), 7).alias("got"), "want"
    ).collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)


def test_geohash_prefix_property_and_sql_mirror(spark):
    """Shorter hashes are prefixes of longer ones (the property spatial
    prefix-rollups rely on), and the generated DuckDB mirror reproduces
    the Spark face character for character on random points."""
    import duckdb

    from questdb_etl_jobs_spark.functions.geo import geohash_encode, geohash_sql

    pts = spark.range(200).select(
        (F.pmod(F.col("id") * 7919, F.lit(17000)) / 100.0 - 85.0).alias("lat"),
        (F.pmod(F.col("id") * 104729, F.lit(36000)) / 100.0 - 180.0).alias("lon"),
    )
    rows = pts.select(
        "lat", "lon",
        geohash_encode(F.col("lat"), F.col("lon"), 8).alias("g8"),
        geohash_encode(F.col("lat"), F.col("lon"), 3).alias("g3"),
    ).collect()
    con = duckdb.connect()
    for r in rows:
        assert r.g8.startswith(r.g3)
        mirror = con.execute(
            f"SELECT {geohash_sql(repr(r.lat), repr(r.lon), 8)}"
        ).fetchone()[0]
        assert mirror == r.g8, (r.lat, r.lon, mirror, r.g8)
    con.close()


def test_geohash_null_coordinates_yield_null(spark):
    """A NULL lat or lon must produce a NULL hash, not the max-cell
    corner hash: least()/LEAST skip NULL operands in both engines, so
    the clamp must be the null-propagating CASE form (round-8 ADVICE).
    Both faces checked."""
    import duckdb

    from questdb_etl_jobs_spark.functions.geo import geohash_encode, geohash_sql

    df = spark.createDataFrame(
        [(None, 10.0), (57.0, None), (None, None), (57.64911, 10.40744)],
        "lat double, lon double",
    )
    got = [
        r.g for r in df.select(
            geohash_encode(F.col("lat"), F.col("lon"), 7).alias("g")
        ).collect()
    ]
    assert got == [None, None, None, "u4pruyd"]
    con = duckdb.connect()
    mirror = con.execute(
        f"SELECT {geohash_sql('NULL', '10.0', 7)}, "
        f"{geohash_sql('57.0', 'NULL', 7)}, "
        f"{geohash_sql('57.64911', '10.40744', 7)}"
    ).fetchone()
    con.close()
    assert mirror == (None, None, "u4pruyd")


def test_tdigest_compress_vectorized_matches_reference():
    """r18 optimization: the vectorized _compress (binary search over a
    precomputed k1 prefix) must be BIT-identical to the original scalar
    greedy pass (_compress_seq) on every integer-weight input — unit
    weights (the partials pass), count weights (the merge pass), and
    tied means (stable-sort order)."""
    import numpy as np

    from questdb_etl_jobs_spark.operators.tdigest import (
        _compress,
        _compress_seq,
    )

    rng = np.random.default_rng(7)
    for trial in range(24):
        n = int(rng.integers(1, 5000))
        means = rng.normal(0, 1000, n)
        if trial % 3 == 0:
            weights = np.ones(n)
        elif trial % 3 == 1:
            weights = rng.integers(1, 50, n).astype(np.float64)
        else:
            means = np.round(means, 1)  # duplicate means: tie coverage
            weights = np.ones(n)
        delta = int(rng.choice([50, 100, 200]))
        order = np.argsort(means, kind="stable")
        m_fast, w_fast = _compress(means.copy(), weights.copy(), delta)
        m_ref, w_ref = _compress_seq(means[order], weights[order], delta)
        assert len(m_fast) == len(m_ref), trial
        assert np.all(m_fast == m_ref), trial  # same floats, not approx
        assert np.all(w_fast == w_ref), trial
    # Non-integer weights must route to the reference pass (exactness of
    # the cumsum precompute is only guaranteed for integer weights).
    means = rng.normal(0, 1, 100)
    weights = rng.uniform(0.5, 2.0, 100)
    order = np.argsort(means, kind="stable")
    m_fast, w_fast = _compress(means.copy(), weights.copy(), 100)
    m_ref, w_ref = _compress_seq(means[order], weights[order], 100)
    assert np.all(m_fast == m_ref) and np.all(w_fast == w_ref)
    # Zero/negative integer weights (r19, round-18 ADVICE): a
    # non-monotone cumsum would break the vectorized binary search's
    # assumptions — such inputs must route to the reference pass too.
    means = rng.normal(0, 1, 60)
    weights = rng.integers(-3, 4, 60).astype(np.float64)  # includes <= 0
    assert (weights <= 0).any()
    order = np.argsort(means, kind="stable")
    m_fast, w_fast = _compress(means.copy(), weights.copy(), 100)
    m_ref, w_ref = _compress_seq(means[order], weights[order], 100)
    assert np.all(m_fast == m_ref) and np.all(w_fast == w_ref)


def test_tdigest_bounded_state_and_accuracy(spark):
    """Centroid count stays sketch-sized on heavy input; every quantile
    estimate's TRUE rank error stays within the k1 bound; total weight
    is conserved; NULLs are skipped."""
    import numpy as np

    from questdb_etl_jobs_spark.operators.tdigest import (
        tdigest_merge,
        tdigest_partials,
        tdigest_quantiles,
    )

    n = 40000
    df = spark.range(n).select(
        (F.col("id") % 3).alias("k"),
        # lognormal-ish skew from uniform bits, deterministic
        F.exp((F.pmod(F.col("id") * 2654435761, F.lit(10007)) / 2000.0))
        .alias("v"),
    ).union(
        spark.range(5).select(
            (F.col("id") % 3).alias("k"), F.lit(None).cast("double")
        )
    )
    merged = tdigest_merge(
        tdigest_partials(df, "v", ["k"], delta=100), ["k"], delta=100
    )
    rows = merged.collect()
    assert {r.k for r in rows} == {0, 1, 2}
    for r in rows:
        assert len(r.means) <= 200, len(r.means)
        assert abs(r.n - (n // 3 + (1 if r.k < n % 3 else 0))) <= 1
        assert r.means == sorted(r.means)
    # Accuracy: rank the estimates against the actual values.
    out = tdigest_quantiles(df, "v", ["k"], [0.05, 0.5, 0.99]).collect()
    vals = {
        r.k: np.sort(
            np.array(
                [x.v for x in df.filter(f"k = {r.k} AND v IS NOT NULL")
                 .select("v").collect()]
            )
        )
        for r in out
    }
    for r in out:
        v = vals[r.k]
        for q, est in ((0.05, r.q_05), (0.5, r.q_50), (0.99, r.q_99)):
            lo = (v < est).sum()
            hi = (v <= est).sum()
            bound = 4 * len(v) * q * (1 - q) / 100 + 1
            assert lo <= q * len(v) + bound and hi >= q * len(v) - bound, (
                r.k, q, est, lo, hi, bound,
            )


def test_tdigest_merge_of_splits_matches_whole(spark):
    """Mergeability: digesting two halves and merging estimates the
    same quantiles (within bound) as digesting everything at once — the
    partials-at-rest rollup contract."""
    from questdb_etl_jobs_spark.operators.tdigest import (
        tdigest_merge,
        tdigest_partials,
        tdigest_quantile_expr,
    )

    base = spark.range(20000).select(
        F.lit("g").alias("k"),
        (F.pmod(F.col("id") * 48271, F.lit(65537)) / 655.37).alias("v"),
    )
    halves = tdigest_partials(
        base.filter("v < 50"), "v", ["k"]
    ).unionByName(tdigest_partials(base.filter("v >= 50"), "v", ["k"]))
    whole = tdigest_merge(tdigest_partials(base, "v", ["k"]), ["k"])
    merged = tdigest_merge(halves, ["k"])
    q_m = merged.select(tdigest_quantile_expr(0.5).alias("e")).first().e
    q_w = whole.select(tdigest_quantile_expr(0.5).alias("e")).first().e
    # Uniform 0..100: both medians must sit near 50 (rank bound ~1%).
    assert abs(q_m - 50.0) < 2.0 and abs(q_w - 50.0) < 2.0
    # Tail clamps: q=0/q=1 return the extreme centroid means.
    ends = whole.select(
        tdigest_quantile_expr(0.0).alias("lo"),
        tdigest_quantile_expr(1.0).alias("hi"),
        F.element_at("means", 1).alias("m0"),
        F.element_at("means", -1).alias("m1"),
    ).first()
    assert ends.lo == ends.m0 and ends.hi == ends.m1


def test_generate_purchases_matches_mirror_and_reference_shape(spark):
    """The distributed generator is bit-identical to its CPython mirror,
    carries the reference's field distributions (email 6-12 lowercase
    chars @example.com, item 100-500, qty 1-10, price 1-200, one
    consistent price per item), and emits time-sorted rows."""
    import re as _re

    from questdb_etl_jobs_spark.sources.generator import (
        generate_purchases,
        mirror_purchases,
    )

    got = [
        (r.email, r.item_id, r.quantity, r.price, r.purchase_date)
        for r in generate_purchases(spark, 300, "2021-03-21T11:00:00")
        .collect()
    ]
    assert got == mirror_purchases(300, "2021-03-21T11:00:00")
    price_by_item = {}
    for email, item, qty, price, ts in got:
        assert _re.fullmatch(r"[a-z]{6,12}@example\.com", email), email
        assert 100 <= item <= 500 and 1 <= qty <= 10 and 1 <= price <= 200
        assert ts.hour == 11 and ts.strftime("%Y-%m-%d") == "2021-03-21"
        assert price_by_item.setdefault(item, price) == price
    assert [t for *_, t in got] == sorted(t for *_, t in got)


# ---------------------------------------------------------------------------
# Top-k via partition-max threshold prune (operators/topk.py)
# ---------------------------------------------------------------------------


def test_topk_threshold_prune_equals_plain_topk(spark):
    """The prune only removes rows provably outside the answer, so the
    result is bit-identical to the plain bounded-heap top-k — checked on
    real data (lineitem) for several k, including k larger than the
    partition count (fallback path: no certified bound, plain plan)."""
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold
    from questdb_etl_jobs_spark.sources.tables import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    for k in (1, 10, 200):
        plain = (
            li.orderBy(
                F.desc("l_extendedprice"),
                F.asc("l_orderkey"),
                F.asc("l_linenumber"),
            )
            .limit(k)
            .collect()
        )
        pruned = topk_by_threshold(
            li, "l_extendedprice", k,
            tiebreak=["l_orderkey", "l_linenumber"],
        ).collect()
        assert pruned == plain, f"k={k}"
    with pytest.raises(ValueError):
        topk_by_threshold(li, "l_extendedprice", 0)


def test_topk_threshold_prune_null_and_tie_safety(spark):
    """Ties AT the threshold survive the prune (>= keeps them all for
    the tiebreak to order), and a mostly-NULL value column falls back to
    the plain plan when fewer than k partitions certify a bound —
    NULL-extended answers are never silently filtered away."""
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold

    rows = [(i, float(v)) for i, v in enumerate([5, 9, 9, 9, 7, 9, 1, 3])]
    df = spark.createDataFrame(rows, "id int, v double").repartition(4)
    got = topk_by_threshold(df, "v", 4, tiebreak=["id"]).collect()
    assert [(r.v, r.id) for r in got] == [
        (9.0, 1), (9.0, 2), (9.0, 3), (9.0, 5)
    ]
    # 2 non-null rows spread over many partitions, k=3: the k-th
    # partition max is NULL -> no certified bound -> fallback includes
    # the NULL rows the filter would have dropped.
    sparse = spark.createDataFrame(
        [(1, 4.0), (2, None), (3, 8.0), (4, None), (5, None), (6, None)],
        "id int, v double",
    ).repartition(6)
    got = topk_by_threshold(sparse, "v", 3, tiebreak=["id"]).collect()
    assert [(r.v, r.id) for r in got] == [(8.0, 3), (4.0, 1), (None, 2)]


def test_topk_threshold_prune_filter_reaches_scan(spark, tmp_path):
    """The second pass's threshold predicate must reach the parquet
    scan (PushedFilters) — that is the whole point at 100 TB: row
    groups whose stats-max falls below the bound are skipped without
    decoding the wide columns."""
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold

    path = str(tmp_path / "t")
    spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 997 * 1.0).alias("v")
    ).repartition(8).write.parquet(path)
    df = spark.read.parquet(path)
    # k must stay below the SCAN partition count (the reader may pack
    # the 8 files into fewer splits) or the operator correctly falls
    # back to the plain, unpruned plan.
    out = topk_by_threshold(df, "v", 3, tiebreak=["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v" in plan


def test_bottomk_threshold_prune_equals_plain_asc(spark):
    """ascending=True (bottom-k): the partition-MIN bound prunes to
    `<= t` plus all NULL rows (Spark asc seats nulls FIRST, so nulls
    legitimately occupy answer positions) — bit-identical to the plain
    ascending sort across partition layouts, with and without nulls."""
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold

    rows = [(i, float(v)) for i, v in enumerate([5, 9, 2, 2, 7, 2, 1, 3])]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    for parts in (1, 4, 16):
        d = df.repartition(parts)
        for k in (1, 3, 5):
            plain = d.orderBy(F.asc("v"), F.asc("id")).limit(k).collect()
            pruned = topk_by_threshold(
                d, "v", k, tiebreak=["id"], ascending=True
            ).collect()
            assert pruned == plain, f"parts={parts} k={k}"
    # Nulls sort first: the k=1 answer IS a null row.
    got = topk_by_threshold(df, "v", 1, tiebreak=["id"], ascending=True)
    assert [(r.id, r.v) for r in got.collect()] == [(100, None)]


def test_bottomk_threshold_prune_filter_reaches_scan(spark, tmp_path):
    """The ascending prune's (IsNull OR <= t) predicate must still reach
    the parquet scan so stats-min-above-t row groups are skipped."""
    from questdb_etl_jobs_spark.operators.topk import topk_by_threshold

    path = str(tmp_path / "t_asc")
    spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 997 * 1.0).alias("v")
    ).repartition(8).write.parquet(path)
    df = spark.read.parquet(path)
    out = topk_by_threshold(df, "v", 3, tiebreak=["id"], ascending=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(v" in plan and "IsNull(v)" in plan, plan


def test_topk_per_key_ascending_equals_plain_window(spark):
    """Per-group bottom-k: grouped partition-min certification, nulls
    kept in certified groups (asc seats them first) — bit-identical to
    the plain ascending window under ties, nulls, sparse groups."""
    import random

    from pyspark.sql import Window

    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    rng = random.Random(7)
    rows = []
    for g in range(30):
        depth = rng.choice([1, 2, 5, 40, 150])
        for _ in range(depth):
            v = None if rng.random() < 0.15 else float(rng.randrange(12))
            rows.append((g, len(rows), v))
    df = spark.createDataFrame(rows, "g int, id long, v double")
    for parts, k in ((3, 1), (8, 4)):
        d = df.repartition(parts)
        w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
        plain = sorted(
            d.withColumn("__rank", F.row_number().over(w))
            .filter(F.col("__rank") <= k)
            .drop("__rank")
            .collect(),
            key=lambda r: (r.g, r.id),
        )
        pruned = sorted(
            topk_per_key(
                d, ["g"], "v", k, tiebreak=["id"], ascending=True
            ).collect(),
            key=lambda r: (r.g, r.id),
        )
        assert pruned == plain, f"parts={parts} k={k}"


def _plain_topk_per_key(df, keys, value_col, k, tiebreak):
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.desc(value_col), *[F.asc(c) for c in tiebreak]
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def test_topk_per_key_equals_plain_window(spark):
    """The grouped prune only removes rows provably outside each
    group's answer, so the result is bit-identical to the plain
    window face — checked on real data (orders per custkey) for
    several k and both threshold-join strategies."""
    from questdb_etl_jobs_spark.operators.topk import topk_per_key
    from questdb_etl_jobs_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    key = lambda r: (r.o_custkey, r.o_orderkey)
    for k in (1, 3):
        for bcast in (True, False):
            plain = sorted(
                _plain_topk_per_key(
                    orders, ["o_custkey"], "o_totalprice", k,
                    ["o_orderkey"],
                ).collect(),
                key=key,
            )
            pruned = sorted(
                topk_per_key(
                    orders, ["o_custkey"], "o_totalprice", k,
                    tiebreak=["o_orderkey"], broadcast_thresholds=bcast,
                ).collect(),
                key=key,
            )
            assert pruned == plain, f"k={k} bcast={bcast}"
    with pytest.raises(ValueError):
        topk_per_key(orders, ["o_custkey"], "o_totalprice", 0)
    with pytest.raises(ValueError):
        topk_per_key(orders, [], "o_totalprice", 1)


def test_topk_per_key_ties_nulls_sparse_groups(spark):
    """Groups smaller than k keep all their rows (no certificate, the
    window sizes them exactly, NULL values included); ties AT a
    group's threshold all survive for the tiebreak to order; rank_col
    exposes the per-group row_number."""
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    rows = [
        # group 'a': deep, with a tie at the k=2 boundary value 9
        ("a", 1, 9.0), ("a", 2, 9.0), ("a", 3, 9.0), ("a", 4, 5.0),
        ("a", 5, 1.0), ("a", 6, None),
        # group 'b': fewer non-null rows than k -> NULL row must appear
        ("b", 7, 4.0), ("b", 8, None),
        # group 'c': exactly one row
        ("c", 9, 2.0),
    ]
    df = spark.createDataFrame(rows, "g string, id int, v double")
    for parts in (1, 4, 16):
        got = topk_per_key(
            df.repartition(parts), ["g"], "v", 2,
            tiebreak=["id"], rank_col="rn",
        ).collect()
        assert sorted((r.g, r.id, r.v, r.rn) for r in got) == [
            ("a", 1, 9.0, 1), ("a", 2, 9.0, 2),
            ("b", 7, 4.0, 1), ("b", 8, None, 2),
            ("c", 9, 2.0, 1),
        ], f"parts={parts}"


def test_topk_per_key_randomized_equivalence(spark):
    """Property-style sweep: random values with heavy duplication and
    NULLs over skewed group sizes, several partition layouts — the
    pruned face must match the plain window bit-for-bit."""
    import random

    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    rng = random.Random(11)
    rows = []
    for g in range(40):
        depth = rng.choice([1, 2, 3, 8, 50, 200])
        for i in range(depth):
            v = None if rng.random() < 0.1 else float(rng.randrange(20))
            rows.append((g, len(rows), v))
    df = spark.createDataFrame(rows, "g int, id long, v double")
    for parts, k in ((3, 1), (7, 4), (32, 10)):
        d = df.repartition(parts)
        plain = sorted(
            _plain_topk_per_key(d, ["g"], "v", k, ["id"]).collect(),
            key=lambda r: (r.g, r.id),
        )
        pruned = sorted(
            topk_per_key(d, ["g"], "v", k, tiebreak=["id"]).collect(),
            key=lambda r: (r.g, r.id),
        )
        assert pruned == plain, f"parts={parts} k={k}"


def test_topk_per_key_plan_shape(spark):
    """The scale contract in the plan: stage 1's grouped maxima carry a
    map-side partial aggregate keyed by (spark_partition_id, keys) —
    the exchange moves the group directory, not the data — and under
    the size-aware default a SMALL input's threshold table still plans
    as a broadcast (Catalyst's estimate sits under
    autoBroadcastJoinThreshold; no hint involved)."""
    from questdb_etl_jobs_spark.operators.topk import topk_per_key
    from questdb_etl_jobs_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    out = topk_per_key(
        orders, ["o_custkey"], "o_totalprice", 3, tiebreak=["o_orderkey"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan
    assert "partial_max" in plan
    assert "BroadcastHashJoin" in plan


def test_topk_per_key_deep_groups_plan_shuffled_threshold_join(spark, monkeypatch):
    """Round-13 contract (supersedes the round-12 estimate-based pin):
    the default is size-MEASURED. When the certified directory's TRUE
    group count exceeds BROADCAST_GROUP_CAP — GBs at 10⁸+ user-chosen
    keys — the threshold join is pinned shuffled (merge), never a
    hardcoded broadcast; when the measured count fits (here: an input
    whose estimate is too big for the static planner but whose
    certified directory is tiny), the join IS broadcast — the decision
    belongs to the measured directory, not to an estimate that scales
    off the fact scan."""
    import questdb_etl_jobs_spark.operators.topk as topk_mod
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    # 800k certified groups (two rows per group, spread across
    # partitions; the narrow projection's static estimate ~19 MB sits
    # ABOVE the 10 MB session threshold now that the threshold parses
    # correctly — round-14), cap lowered to 100k: measured count > cap
    # → merge.
    deep = spark.range(1_600_000).select(
        (F.col("id") % 800_000).alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    ).repartition(8)
    monkeypatch.setattr(topk_mod, "BROADCAST_GROUP_CAP", 100_000)
    out = topk_per_key(deep, ["g"], "v", 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # Same input, honest cap: the measured 800k-row directory fits and
    # the join broadcasts even though the static estimate said no.
    monkeypatch.setattr(topk_mod, "BROADCAST_GROUP_CAP", 2_000_000)
    sized = topk_per_key(deep, ["g"], "v", 1)
    splan = sized._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in splan, splan
    # Forcing the hint still works and skips the eager pass.
    forced = topk_per_key(deep, ["g"], "v", 2, broadcast_thresholds=True)
    fplan = forced._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fplan


def test_topk_per_key_measured_path_runs_subtree_once(spark):
    """Round-14 contract: on the measured-broadcast path the eager
    probe IS the materialization the join consumes — the directory
    comes back into the plan as a LOCAL relation, so the narrow
    extrema pass over the fact table executes exactly ONCE (round 13
    ran a discarded count() and the join re-executed the subtree).
    Pinned by plan shape: the executed plan carries a LocalTableScan
    on the build side and NO threshold aggregate anywhere (k=1's
    directory agg would otherwise show as partial_max)."""
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    deep = spark.range(1_600_000).select(
        (F.col("id") % 800_000).alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    ).repartition(8)
    out = topk_per_key(deep, ["g"], "v", 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_max" not in plan, plan
    # And the localized directory is the REAL one: result bit-equal to
    # the plain window face.
    plain = sorted(
        _plain_topk_per_key(deep, ["g"], "v", 1, []).collect(),
        key=lambda r: r.g,
    )
    got = sorted(out.collect(), key=lambda r: r.g)
    assert got == plain


def test_topk_per_key_honors_disabled_auto_broadcast(spark):
    """Round-14 ADVICE: `autoBroadcastJoinThreshold = -1` is a user
    decision — the measured default must NOT measure its way into a
    broadcast hint that overrides it. The threshold join pins merge
    (and no eager probe job runs: the plan keeps the lazy directory
    aggregate)."""
    from questdb_etl_jobs_spark.operators.topk import topk_per_key

    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        deep = spark.range(100_000).select(
            (F.col("id") % 50_000).alias("g"),
            (F.col("id") % 97).cast("double").alias("v"),
        ).repartition(8)
        out = topk_per_key(deep, ["g"], "v", 1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "partial_max" in plan, plan  # lazy subtree, no probe
    finally:
        spark.conf.set(key, old)


def test_auto_broadcast_bytes_parses_unit_suffixes(spark):
    """Round-14 ADVICE fix: '10MB'-style conf strings must parse as
    bytes (the old digit-strip read '10MB' as 10 bytes, killing the
    documented lazy branch)."""
    from questdb_etl_jobs_spark.operators.topk import _auto_broadcast_bytes

    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        for raw, want in (
            ("10485760", 10_485_760),
            ("10MB", 10 * 1024 * 1024),
            ("512k", 512 * 1024),
            ("1g", 1024**3),
            ("-1", -1),
        ):
            spark.conf.set(key, raw)
            assert _auto_broadcast_bytes(spark) == want, raw
    finally:
        spark.conf.set(key, old)


def test_rank_family_pruned_handles_null_priorities(spark, tmp_path):
    """q175 must stay bit-identical to q30's Spark face when
    o_orderpriority is NULL for some rows: the directory join is
    null-safe (a plain equi-join would silently drop null-priority
    top-3 rows) and the directory window seats nulls first, exactly
    like the plain w_prio."""
    from questdb_etl_jobs_spark.queries import spark_queries
    from questdb_etl_jobs_spark.sources.tables import load_table

    src = load_table(spark, SF_SMALL, "orders")
    mod = src.withColumn(
        "o_orderpriority",
        F.when(
            F.pmod("o_orderkey", F.lit(10)) == 0, F.lit(None)
        ).otherwise(F.col("o_orderpriority")),
    )
    d = str(tmp_path / "nullprio")
    mod.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    reg = spark_queries()
    plain = sorted(map(tuple, reg["q30_rank_top3_orders"](spark, d).collect()))
    pruned = sorted(
        map(tuple, reg["q175_rank_family_pruned"](spark, d).collect())
    )
    assert plain == pruned and len(plain) > 0


def test_matview_lease_release_is_token_atomic(spark, tmp_path):
    """A dispossessed holder's release must never remove the NEW
    holder's lock (the check-then-delete gap): release claims by
    rename-to-tombstone, sees the foreign token, and puts the lock
    BACK; releasing with one's own token removes it; releasing a
    vanished lock is a no-op."""
    from questdb_etl_jobs_spark.operators import matview as mv

    df = _mv_rows(spark)
    path = str(tmp_path / "mv")
    mv.refresh_sample_by_view_exactly_once(
        spark, df, path, 0, "ts", "day", "v", ["k"]
    )
    staged = mv._staged_dir(path)
    jvm, fs = mv._hadoop_fs(spark, staged)

    # New holder B owns the lock; old holder A releases with its stale
    # token → lock must survive, still carrying B.
    token_b = mv._acquire_compaction_lease(spark, staged, 600.0)
    assert token_b
    mv._release_compaction_lease(spark, staged, token="stale-token-a")
    assert mv._lock_token(jvm, fs, staged) == token_b
    # B's own release removes it.
    mv._release_compaction_lease(spark, staged, token=token_b)
    assert mv._lock_token(jvm, fs, staged) is None
    # Releasing again (lock vanished) is a no-op, not an error.
    mv._release_compaction_lease(spark, staged, token=token_b)
    assert mv._lock_token(jvm, fs, staged) is None


# ---------------------------------------------------------------------------
# operators/clustering.py — distributed Lloyd k-means
# ---------------------------------------------------------------------------

def test_kmeans_separates_obvious_blobs(spark):
    """Two well-separated 2-D blobs, k=2 seeded from the two lowest ids
    (one per blob): every point lands with its blob and the centroids
    converge to the blob means."""
    from questdb_etl_jobs_spark.operators.clustering import (
        kmeans_fit,
        kmeans_transform,
    )

    rows = [
        (0, [0.0, 0.0]), (2, [0.1, -0.1]), (4, [-0.1, 0.1]),
        (1, [10.0, 10.0]), (3, [10.1, 9.9]), (5, [9.9, 10.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    model = kmeans_fit(df, k=2, iterations=2)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_transform(df, model).collect()
    }
    assert got[0] == got[2] == got[4] == 0
    assert got[1] == got[3] == got[5] == 1
    assert abs(model.centroids[0][0] - 0.0) < 1e-9
    assert abs(model.centroids[1][0] - 10.0) < 1e-9


def test_kmeans_tie_breaks_to_lowest_centroid_index(spark):
    from questdb_etl_jobs_spark.operators.clustering import assign_clusters

    df = spark.createDataFrame(
        [(1, [5.0, 5.0])], "vec_id bigint, embedding array<double>"
    )
    # Equidistant from both centroids -> first minimum wins (index 0).
    out = assign_clusters(df, [[0.0, 0.0], [10.0, 10.0]]).collect()
    assert out[0]["cluster"] == 0


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    from questdb_etl_jobs_spark.operators.clustering import (
        _update_centroids,
        assign_clusters,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.2, 0.2])],
        "vec_id bigint, embedding array<double>",
    )
    far = [100.0, 100.0]  # nothing assigns here
    assigned = assign_clusters(df, [[0.0, 0.0], far])
    new = _update_centroids(assigned, [[0.0, 0.0], far], "embedding", "cluster")
    assert new[1] == far                      # empty cluster retained
    assert abs(new[0][0] - 0.1) < 1e-9        # mean of 0.0 and 0.2


def test_kmeans_k_exceeding_rows_raises(spark):
    import pytest as _pytest

    from questdb_etl_jobs_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame(
        [(1, [0.0])], "vec_id bigint, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="exceeds input row count"):
        kmeans_fit(df, k=5, iterations=1)


def test_kmeans_assignment_is_zero_shuffle_projection(spark, tmp_path):
    """The assignment pass must not exchange: centroids are plan
    literals, the winner is computed per-row in the scan stage."""
    from questdb_etl_jobs_spark.operators.clustering import assign_clusters
    from questdb_etl_jobs_spark.plans.inspect import plan_string

    src = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(100)],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(src)
    df = assign_clusters(
        spark.read.parquet(src), [[0.0, 0.0], [50.0, -50.0]]
    )
    assert "Exchange" not in plan_string(df)


def test_kmeans_assignment_literal_budget_boundary(spark):
    """Round-13: the plan-literal centroid path has a stated envelope
    (centers × dim <= PLAN_LITERAL_BUDGET); above it assignment
    switches to the broadcast/Arrow path automatically. At the
    boundary the two faces must be BIT-identical — cluster id, winning
    distance (same IEEE fold order), lowest-index tie-break, and NULL
    propagation alike."""
    import random

    from questdb_etl_jobs_spark.operators.clustering import (
        PLAN_LITERAL_BUDGET,
        assign_clusters,
    )
    from questdb_etl_jobs_spark.plans.inspect import plan_string

    rng = random.Random(131)
    dim = 4
    cents = [[rng.uniform(-5, 5) for _ in range(dim)] for _ in range(9)]
    # A duplicated centroid: the tie must break to the LOWER index on
    # both faces.
    cents[7] = list(cents[2])
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(dim)]) for i in range(200)
    ]
    rows += [(998, list(cents[2])), (999, None)]  # exact tie + NULL vec
    # Round-14 ADVICE: malformed vectors must hit the NULL bucket on
    # BOTH faces — NULL element, NaN element, Inf element, ragged
    # lengths (Arrow turns NULL elements into NaN and np.stack raises
    # on ragged rows, so the Arrow face needs an explicit mask).
    rows += [
        (990, [1.0, None, 1.0, 1.0]),
        (991, [1.0, float("nan"), 1.0, 1.0]),
        (992, [1.0, float("inf"), 1.0, 1.0]),
        (993, [1.0, 1.0, 1.0]),  # shorter than dim
        (994, [1.0, 1.0, 1.0, 1.0, 1.0]),  # longer than dim
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).repartition(5)

    # 9 × 4 = 36 elements: budget 36 keeps literals, budget 35 crosses.
    lit = assign_clusters(df, cents, dist_col="d", literal_budget=36)
    arrow = assign_clusters(df, cents, dist_col="d", literal_budget=35)
    assert "ArrowEvalPython" not in plan_string(lit)
    assert "ArrowEvalPython" in plan_string(arrow)
    lit_rows = {r.vec_id: (r.cluster, r.d) for r in lit.collect()}
    arrow_rows = {r.vec_id: (r.cluster, r.d) for r in arrow.collect()}
    assert lit_rows == arrow_rows  # bit-identical: same floats, not ≈
    assert lit_rows[998][0] == 2  # tie broke low on both faces
    assert lit_rows[999] == (None, None)  # NULL vec: NULL cluster+dist
    for bad in (990, 991, 992, 993, 994):  # malformed: NULL bucket
        assert lit_rows[bad] == (None, None), bad
    # The default envelope itself: small shapes stay JVM-side.
    assert 9 * dim <= PLAN_LITERAL_BUDGET
    assert "ArrowEvalPython" not in plan_string(
        assign_clusters(df, cents, dist_col="d")
    )


def test_kmeans_parallel_init_inherits_literal_budget(spark, monkeypatch):
    """The k-means|| candidate set grows to ~rounds × oversample
    centers; its distance pass routes through assign_clusters, so
    shrinking the budget flips the init to the Arrow path WITHOUT
    changing the chosen centroids (bit-identical fold)."""
    import random

    import questdb_etl_jobs_spark.operators.clustering as cl

    rng = random.Random(7)
    df = spark.createDataFrame(
        [
            (i, [rng.gauss(c * 10.0, 1.0), rng.gauss(-c * 10.0, 1.0)])
            for i in range(120)
            for c in [i % 3]
        ][:120],
        "vec_id bigint, embedding array<double>",
    )
    base = cl.kmeans_parallel_init(df, k=3, rounds=2)
    monkeypatch.setattr(cl, "PLAN_LITERAL_BUDGET", 2)
    tiny = cl.kmeans_parallel_init(df, k=3, rounds=2)
    assert tiny == base


def test_kmeans_parallel_init_is_partition_layout_independent(spark):
    """r19: kmeans_parallel_init now fans out its internal (id, vec)
    cache before the round loop (single-split sources otherwise run
    every ψ/advance materialization on ONE core). The draws are
    content-keyed and ψ rides the decimal protocol, so the result must
    not depend on the layout: this replays the same round sequence over
    an UNFANNED single-partition cache and requires the operator's
    centroids to be BIT-identical to it."""
    import random
    from decimal import Decimal  # noqa: F401

    import questdb_etl_jobs_spark.operators.clustering as cl

    rng = random.Random(4242)
    k, rounds, dim = 4, 3, 6
    df = spark.createDataFrame(
        [
            (i, [rng.gauss((i % 4) * 8.0, 1.0) for _ in range(dim)])
            for i in range(300)
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = cl.kmeans_parallel_init(df, k=k, rounds=rounds)

    # --- unfused r18 reference, spelled with literal-ψ thresholds ---
    l = 2 * k  # noqa: E741
    pts = df.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    ).filter(F.col("embedding").isNotNull()).coalesce(1).cache()
    try:
        seed = pts.orderBy("__id").limit(1).collect()
        centers = [[float(x) for x in seed[0]["__v"]]]

        def psi_of(state):
            row = state.agg(
                F.sum(F.round("__d", 6).cast("decimal(38,6)")).alias("psi")
            ).collect()[0]
            return float(row["psi"]) if row["psi"] else 0.0

        def advance(state, batch, offset):
            beats = F.col("__nd") < F.col("__d")
            ids = F.expr(
                "array({})".format(
                    ",".join(str(offset + i) for i in range(len(batch)))
                )
            )
            return cl.assign_clusters(
                state, batch, vec_col="__v",
                cluster_col="__nc", dist_col="__nd",
            ).select(
                "__id", "__v",
                F.when(beats, F.element_at(ids, F.col("__nc") + 1))
                .otherwise(F.col("__c")).alias("__c"),
                F.when(beats, F.col("__nd"))
                .otherwise(F.col("__d")).alias("__d"),
            )

        cur = cl.assign_clusters(
            pts, centers, vec_col="__v", cluster_col="__c", dist_col="__d"
        ).select("__id", "__v", "__c", "__d").cache()
        scored_from = len(centers)
        psi = psi_of(cur)
        final = None
        for rnd in range(rounds):
            if psi <= 0.0:
                break
            u = (
                F.pmod(F.xxhash64("__id", F.lit(rnd)), F.lit(1 << 31))
                / F.lit(float(1 << 31))
            )
            picked = cur.filter(
                u < (F.col("__d") * F.lit(float(l)) / F.lit(psi))
            ).select("__id", "__v").collect()
            existing = {tuple(c) for c in centers}
            for r in sorted(picked, key=lambda r: r["__id"]):
                v = [float(x) for x in r["__v"]]
                if tuple(v) not in existing:
                    existing.add(tuple(v))
                    centers.append(v)
            batch = centers[scored_from:]
            if batch:
                nxt = advance(cur, batch, scored_from)
                if rnd < rounds - 1:
                    nxt = nxt.cache()
                    psi = psi_of(nxt)
                    cur.unpersist()
                    cur = nxt
                else:
                    final = nxt
            scored_from = len(centers)
        weights = [0] * len(centers)
        for r in (
            (final if final is not None else cur)
            .groupBy("__c").agg(F.count(F.lit(1)).alias("n")).collect()
        ):
            if r["__c"] is not None:
                weights[r["__c"]] = int(r["n"])
        cur.unpersist()
        ref = cl._weighted_reduce(centers, weights, k, 10)
    finally:
        pts.unpersist()
    assert got == ref  # bit-identical floats, not approx


def test_kmeans_centroid_prefold_fallback_equivalence(spark, monkeypatch):
    """r19 (VERDICT item 6 / r18 ADVICE): the Literal pre-fold rides
    internal APIs — pin (a) that it actually ENGAGES on this Spark
    build, (b) that forcing the fallback (internal-API drift) yields
    bit-identical assignments on a denormal/±0.0/1e308 matrix, and
    (c) that the fallback warns so drift is noticed."""
    import logging

    import questdb_etl_jobs_spark.operators.clustering as cl

    # (a) the fold engages: internal APIs present and return a Literal.
    assert cl._try_prefold("array(array(1.5D,2.5D))", spark) is not None

    cents = [
        [5e-324, -0.0, 1.0],                       # min denormal, -0.0
        [0.0, 2.2250738585072014e-308, -1.0],      # +0.0, min normal
        [1e308, -1e308, 0.1],                      # huge magnitudes
    ]
    rows = [
        (0, [5e-324, 0.0, 1.0]),
        (1, [0.0, -0.0, -1.0]),
        (2, [1e308, -1e308, 0.1000000000000000055511151231257827]),
        (3, [1e154, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    folded = {
        r.vec_id: (r.cluster, r.d)
        for r in cl.assign_clusters(df, cents, dist_col="d").collect()
    }

    real_prefold = cl._try_prefold
    calls = {"n": 0}

    def no_fold(sql, spark_=None):
        calls["n"] += 1
        return None

    monkeypatch.setattr(cl, "_try_prefold", no_fold)
    fallback = {
        r.vec_id: (r.cluster, r.d)
        for r in cl.assign_clusters(df, cents, dist_col="d").collect()
    }
    assert calls["n"] > 0  # the fallback path actually ran
    assert folded == fallback  # same clusters AND same distance floats

    # (c) a real internal failure warns once (not silently).
    monkeypatch.setattr(cl, "_PREFOLD_WARNED", False)
    records = []

    class _H(logging.Handler):
        def emit(self, record):
            records.append(record)

    log = logging.getLogger("questdb_etl_jobs_spark.operators.clustering")
    h = _H()
    log.addHandler(h)
    try:
        assert real_prefold("definitely not sql (", spark) is None
        assert any("pre-fold" in r.getMessage() for r in records)
        records.clear()
        assert real_prefold("still not sql (", spark) is None
        assert not records  # warned ONCE, not per call
    finally:
        log.removeHandler(h)


def test_kmeans_null_vectors_excluded_by_contract(spark):
    """NULL vectors: NULL cluster in the assignment projection, never a
    seed, never part of a centroid mean (posexplode drops them before
    the update aggregate)."""
    from questdb_etl_jobs_spark.operators.clustering import (
        _update_centroids,
        assign_clusters,
        kmeans_fit,
    )

    df = spark.createDataFrame(
        [(0, None), (1, [0.0, 0.0]), (2, [0.2, 0.2]), (3, [10.0, 10.0])],
        "vec_id bigint, embedding array<double>",
    )
    assigned = assign_clusters(df, [[0.0, 0.0], [10.0, 10.0]])
    by_id = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert by_id[0] is None and by_id[1] == 0 and by_id[3] == 1
    new = _update_centroids(
        assigned, [[0.0, 0.0], [10.0, 10.0]], "embedding", "cluster"
    )
    assert abs(new[0][0] - 0.1) < 1e-9   # mean of the two real c0 rows
    assert new[1] == [10.0, 10.0]
    # The NULL row (lowest vec_id) must not become a seed.
    model = kmeans_fit(df, k=2, iterations=1)
    assert model.centroids != [None, None]
    assert len(model.centroids) == 2 and model.centroids[0] is not None


def _blob_df(spark):
    """Four well-separated 2-D blobs whose TWELVE lowest ids all sit in
    blob A — the pathological ordering for the naive lowest-id seed."""
    centers = [(0.0, 0.0), (50.0, 0.0), (0.0, 50.0), (50.0, 50.0)]
    rows, vid = [], 0
    for cx, cy in centers:
        for i in range(12):
            rows.append((vid, [cx + 0.1 * (i % 5), cy - 0.1 * (i % 3)]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_kmeans_parallel_init_shape_and_determinism(spark):
    """k-means|| init returns exactly k dim-correct centroids and is
    bit-identical across calls AND partition layouts (content-keyed
    Bernoulli draw + decimal-protocol normalizer)."""
    from questdb_etl_jobs_spark.operators.clustering import (
        kmeans_parallel_init,
    )

    df = _blob_df(spark)
    a = kmeans_parallel_init(df, k=4)
    b = kmeans_parallel_init(df, k=4)
    c = kmeans_parallel_init(df.repartition(7), k=4)
    assert len(a) == 4 and all(len(x) == 2 for x in a)
    assert a == b == c


def test_kmeans_parallel_init_beats_naive_seed_on_inertia(spark):
    """Quality gap the init exists to close: with all k lowest ids in
    one blob, Lloyd from the naive seed strands centroids; the
    k-means||-seeded fit ends with strictly lower inertia (here it
    finds all four blobs — near-zero objective)."""
    from questdb_etl_jobs_spark.operators.clustering import (
        kmeans_fit,
        kmeans_inertia,
        kmeans_parallel_init,
    )

    df = _blob_df(spark)
    naive = kmeans_fit(df, k=4, iterations=5)
    seeded = kmeans_fit(
        df, k=4, iterations=5,
        init_centroids=kmeans_parallel_init(df, k=4),
    )
    i_naive = kmeans_inertia(df, naive.centroids)
    i_seeded = kmeans_inertia(df, seeded.centroids)
    assert i_seeded < i_naive
    assert i_seeded < 50.0  # four found blobs: only intra-blob jitter


def test_kmeans_parallel_init_tiny_input_pads_to_k(spark):
    """Fewer distinct candidates than k (degenerate tiny input): the
    reduce pads deterministically instead of raising; the padded model
    still fits (duplicate centroids stay stable across Lloyd rounds)."""
    from questdb_etl_jobs_spark.operators.clustering import (
        kmeans_fit,
        kmeans_parallel_init,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    init = kmeans_parallel_init(df, k=2)
    assert len(init) == 2
    model = kmeans_fit(df, k=2, iterations=2, init_centroids=init)
    assert len(model.centroids) == 2


def test_pii_redaction_families_and_order(spark):
    """functions/pii.py: all five families redact to their tokens,
    detection kinds follow pattern order, counts are per-family against
    the ORIGINAL text, clean text rides through untouched, and the
    fixed application order keeps number-shaped overlaps deterministic
    (a phone never half-matches the ssn pattern; a card never matches
    the phone pattern)."""
    from questdb_etl_jobs_spark.functions.pii import (
        count_pii,
        detect_pii_kinds,
        redact_pii,
    )

    rows = [
        (1, "mail a.b-c_d%x+1@sub.example.co today"),
        (2, "pay 4111 1111-1111 1111 or 4111-1111-1111-1111"),
        (3, "ssn 123-45-6789 phone 555.867.5309 and 555-867-5309"),
        (4, "host 10.0.255.1 plus text with no pii at all"),
        (5, "clean document, nothing to scrub 12345"),
        (6, "two mails x@y.io z@w.ai one ip 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    got = {
        r.id: (r.red, r.kinds, r.n)
        for r in df.select(
            "id",
            redact_pii("t").alias("red"),
            detect_pii_kinds("t").alias("kinds"),
            count_pii("t").alias("n"),
        ).collect()
    }
    assert got[1] == ("mail [EMAIL] today", "email", 1)
    assert got[2] == ("pay [CARD] or [CARD]", "card", 2)
    assert got[3] == (
        "ssn [SSN] phone [PHONE] and [PHONE]", "ssn,phone", 3
    )
    assert got[4] == (
        "host [IPV4] plus text with no pii at all", "ipv4", 1
    )
    assert got[5] == ("clean document, nothing to scrub 12345", "", 0)
    assert got[6] == ("two mails [EMAIL] [EMAIL] one ip [IPV4]",
                      "email,ipv4", 3)


def test_fan_out_fires_only_on_underparallel_scans(spark):
    """r18: fan_out must round-robin repartition a single-split source
    up to defaultParallelism, leave an already-parallel frame alone,
    and never change row contents."""
    from questdb_etl_jobs_spark.sources.tables import fan_out

    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).coalesce(1)
    # On a 1-3 core runner splits*4 <= defaultParallelism is false for a
    # single-split source, so the default gate (correctly) no-ops; drop
    # the slot factor there so the repartition branch is still exercised
    # (r18 ADVICE — the test must not assume a >=4-core box).
    fanned = fan_out(df, min_slots_per_split=4 if par >= 4 else 1)
    assert fanned.rdd.getNumPartitions() == par
    assert fanned.count() == 1000
    assert sorted(r.id for r in fanned.collect()) == list(range(1000))
    # already parallel enough: untouched object
    wide = spark.range(0, 1000).repartition(par)
    assert fan_out(wide) is wide
