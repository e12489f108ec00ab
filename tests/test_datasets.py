"""Dataset-assembly operators: deterministic splits, contamination
check, domain-weighted sampling (operators/datasets.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_spark.operators.datasets import (
    assign_split,
    contamination_pairs,
    domain_weighted_sample,
    shingles,
)

SF = "/root/testdata/sf0.01"


def test_assign_split_fractions_and_determinism(spark):
    from data_engineering_nd_spark.catalog import load

    docs = load(spark, "documents", SF)
    out = assign_split(docs, "doc_id")
    frac = {
        r.split: r["count"] / 500
        for r in out.groupBy("split").count().collect()
    }
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["val"] < 0.17
    assert 0.05 < frac["test"] < 0.17
    # pure function of the key: re-running yields the identical partition
    a = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    b = {
        r.doc_id: r.split
        for r in assign_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    assert a == b


def test_assign_split_stable_under_append(spark):
    """A row's split must not change when the corpus grows — the property
    that prevents train/test leakage across rebuilds."""
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s = {r.doc_id: r.split for r in assign_split(small, "doc_id").collect()}
    g = {r.doc_id: r.split for r in assign_split(big, "doc_id").collect()}
    assert all(g[k] == v for k, v in s.items())


def test_shingles_strict_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "too short")],
        "doc_id int, text string",
    )
    out = shingles(df, "doc_id", "text", n=8).collect()
    # doc 1: 9 words -> 2 distinct 8-grams; doc 2: < 8 words -> nothing
    assert sorted(r.doc_id for r in out) == [1, 1]
    assert len({r.sh_key for r in out}) == 2


def test_contamination_flags_planted_overlap(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base + " extra tail words here"), (2, "completely different text " * 3)],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(100, base)], "doc_id int, text string")
    got = contamination_pairs(corpus, bench, n=8, min_overlap=3).collect()
    assert [(r.corpus_doc, r.benchmark_doc) for r in got] == [(1, 100)]
    assert got[0].n_shared_shingles >= 3


def test_domain_weighted_sample_caps_and_keeps_small_domains(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 280, "big").otherwise("small").alias("source"),
    )
    kept = domain_weighted_sample(df, "source", "doc_id", cap=20)
    counts = {r.source: r["count"] for r in kept.groupBy("source").count().collect()}
    assert counts["small"] == 20  # <= cap: kept in full
    assert counts["big"] < 60  # ~cap expected (256-bucket granularity)
    # deterministic: same rows kept on re-run
    k1 = sorted(r.doc_id for r in kept.collect())
    k2 = sorted(
        r.doc_id
        for r in domain_weighted_sample(df, "source", "doc_id", cap=20).collect()
    )
    assert k1 == k2


def test_paragraph_dedup_first_wins_and_reassembles(spark):
    from data_engineering_nd_spark.operators.datasets import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\nshared paragraph\nunique one"),
            (2, "shared paragraph\nanother line"),
            (3, "shared paragraph\nshared paragraph\nfinal"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs, "doc_id", "text").collect()}
    # doc 1 holds the first occurrence of the shared paragraph -> all kept
    assert out[1].clean_text == "alpha beta\nshared paragraph\nunique one"
    assert out[1].n_removed == 0
    # later docs lose every copy of it, including in-document repeats
    assert out[2].clean_text == "another line"
    assert out[2].n_removed == 1
    assert out[3].clean_text == "final"
    assert out[3].n_removed == 2


def test_paragraph_dedup_drops_blank_paragraphs(spark):
    from data_engineering_nd_spark.operators.datasets import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "a\n\n  \nb")], "doc_id long, text string"
    )
    row = paragraph_dedup(docs, "doc_id", "text").collect()[0]
    assert row.clean_text == "a\nb"
    assert row.n_kept == 2


def test_pack_sequences_next_fit_invariants(spark):
    from data_engineering_nd_spark.operators.datasets import pack_sequences

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (((F.xxhash64(F.col("id")) % 1000) + 1000) % 1000 + 50).alias("n_tokens"),
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=2048, n_groups=8)
    rows = packed.collect()
    assert len(rows) == 400  # packing never drops or duplicates docs
    # a sequence's token mass stays under budget + one straddling doc
    seqs = (
        packed.groupBy("pack_group", "seq_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for s in seqs:
        assert s.tot < 2048 + s.mx
    # deterministic: same input -> same assignment
    again = pack_sequences(docs, "doc_id", "n_tokens", budget=2048, n_groups=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_chunk_text_covers_all_tokens(spark):
    from data_engineering_nd_spark.operators.datasets import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(37)))], "doc_id long, text string"
    )
    chunks = chunk_text(docs, "doc_id", "text", 16).orderBy("chunk_idx").collect()
    assert len(chunks) == 3  # ceil(37/16)
    rebuilt = " ".join(c.chunk for c in chunks)
    assert rebuilt == " ".join(f"w{i}" for i in range(37))


def test_epoch_permutation_dense_and_extends_training_order(spark):
    """epoch_permutation must emit a dense collision-free 1..n rank whose
    epoch-0 head-100 equals ds_training_order's audit report exactly, and
    whose per-epoch permutations differ (fresh shuffle per epoch)."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.datasets import (
        ds_training_order_query,
        epoch_permutation,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, "documents", sf)
    n = docs.count()

    e0 = epoch_permutation(docs, "doc_id", epoch=0).collect()
    assert sorted(r.training_pos for r in e0) == list(range(1, n + 1))

    head = {
        r.doc_id: r.training_pos
        for r in ds_training_order_query(spark, sf).collect()
    }
    full = {r.doc_id: r.training_pos for r in e0}
    assert head == {d: p for d, p in full.items() if p <= 100}

    e1 = {r.doc_id: r.training_pos for r in
          epoch_permutation(docs, "doc_id", epoch=1).collect()}
    assert sorted(e1.values()) == list(range(1, n + 1))
    assert e1 != full  # a different epoch is a different permutation


def test_shard_manifest_tiles_the_permutation(spark):
    """Shards must tile the dense position space exactly: shard k covers
    positions [64k+1, 64k+64] (last shard ragged), counts match widths,
    and every document lands in exactly one shard."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.datasets import (
        epoch_permutation,
        shard_manifest,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    n = docs.count()
    man = sorted(
        shard_manifest(
            epoch_permutation(docs, "doc_id"), shard_size=64
        ).collect(),
        key=lambda r: r.shard_id,
    )
    assert [r.shard_id for r in man] == list(range((n + 63) // 64))
    assert sum(r.n_docs for r in man) == n
    for r in man:
        assert r.min_pos == r.shard_id * 64 + 1
        assert r.max_pos - r.min_pos + 1 == r.n_docs
        assert r.n_docs == (64 if r.shard_id < len(man) - 1 else n - 64 * (len(man) - 1))


def test_incremental_update_disposition_priority(spark):
    """dup_vs_corpus must win over dup_in_batch; within-batch dedup is
    first-id-wins; everything else ingests."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_incremental_update_query,
    )
    import tempfile

    rows = [
        # existing corpus (id % 7 != 0)
        (1, "srcA", "alpha"),
        (2, "srcA", "beta"),
        # batch (id % 7 == 0)
        (7, "srcB", "alpha"),    # dup_vs_corpus
        (14, "srcB", "gamma"),   # ingest (first of its hash in batch)
        (21, "srcB", "gamma"),   # dup_in_batch (second)
        (28, "srcB", "beta"),    # dup_vs_corpus even though also dup-ish in batch? unique here
        (35, "srcC", "delta"),   # ingest
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        got = {
            (r.source, r.disposition): r.n_docs
            for r in ds_incremental_update_query(spark, d).collect()
        }
    assert got == {
        ("srcB", "dup_vs_corpus"): 2,
        ("srcB", "ingest"): 1,
        ("srcB", "dup_in_batch"): 1,
        ("srcC", "ingest"): 1,
    }


def test_token_budget_pack_equals_flat_cumsum(spark):
    """The bucket-decomposed running sum must equal the naive flat
    per-source cumsum — the exact-equivalence claim the oracle also
    checks, pinned here on a handcrafted frame with score ties."""
    from pyspark.sql.window import Window

    from data_engineering_nd_spark.operators.datasets import token_budget_pack

    rows = [
        # (doc_id, source, score, tokens) — includes a tie on score 0.5
        (1, "a", 0.9, 100), (2, "a", 0.5, 200), (3, "a", 0.5, 150),
        (4, "a", 0.1, 400), (5, "b", 0.7, 500), (6, "b", 0.7, 300),
        (7, "b", 0.0, 50), (8, "b", 1.0, 250),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score", "n_tokens"])
    budget = 600
    got = {
        (r.source, r.doc_id): r.cum_tokens
        for r in token_budget_pack(
            df, "doc_id", "source", "score", "n_tokens", budget=budget
        ).collect()
    }
    flat = Window.partitionBy("source").orderBy(
        F.desc("score"), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r.source, r.doc_id): r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(flat))
        .filter(F.col("cum") <= budget)
        .collect()
    }
    assert got == want
    # greedy semantics: a:0.9(100)+0.5#2(300)+0.5#3(450) fits, #4 overflows
    assert got[("a", 1)] == 100 and got[("a", 2)] == 300 and got[("a", 3)] == 450
    assert ("a", 4) not in got
    # b: 1.0(250)+0.7#5 overflows at 750 -> only the best doc survives
    assert got[("b", 8)] == 250 and ("b", 5) not in got


def test_curriculum_stages_partition_and_order(spark):
    """Stages tile each source (union of stage members = source, equal-ish
    sizes) and stage 1 dominates stage N on quality."""
    from data_engineering_nd_spark.operators.datasets import curriculum_stages

    rows = [
        (i, "s", round(1.0 - i * 0.01, 4), 10 + i) for i in range(20)
    ] + [(100 + i, "t", 0.5, 7) for i in range(8)]  # all-tied source
    df = spark.createDataFrame(rows, ["doc_id", "source", "score", "n_tokens"])
    out = curriculum_stages(
        df, "doc_id", "source", "score", "n_tokens", n_stages=4
    ).collect()
    s = {r.stage: r for r in out if r.source == "s"}
    assert sorted(s) == [1, 2, 3, 4]
    assert all(s[k].n_docs == 5 for k in s)
    # best 5 scores land in stage 1, worst 5 in stage 4
    assert s[1].min_score > s[2].max_score
    assert s[3].min_score > s[4].max_score
    # exact integer score mass: stage 1 of 's' = sum of top-5 e4 scores
    assert s[1].sum_quality_e4 == sum(
        round((1.0 - i * 0.01) * 10000) for i in range(5)
    )
    # tied source still tiles: 8 docs -> 2 per stage, id-ordered
    t = {r.stage: r for r in out if r.source == "t"}
    assert all(t[k].n_docs == 2 for k in sorted(t))


def test_temperature_mixture_boosts_small_domains(spark):
    from data_engineering_nd_spark.operators.datasets import temperature_mixture

    per_src = spark.createDataFrame(
        [("big", 10, 900_000), ("small", 5, 10_000)],
        ["source", "n_docs", "total_tokens"],
    )
    rows = {r["source"]: r for r in temperature_mixture(per_src, budget=100_000).collect()}
    # shares sum to 1 (up to rounding)
    assert abs(rows["big"]["temp_share"] + rows["small"]["temp_share"] - 1.0) < 1e-5
    assert abs(rows["big"]["raw_share"] + rows["small"]["raw_share"] - 1.0) < 1e-5
    # alpha=0.5 moves share from the big domain to the small one
    assert rows["small"]["temp_share"] > rows["small"]["raw_share"]
    assert rows["big"]["temp_share"] < rows["big"]["raw_share"]
    # repeat factor: small domain upsampled relative to big
    assert rows["small"]["repeat_factor"] > rows["big"]["repeat_factor"]
    # budget tokens split the epoch budget (up to rounding)
    assert abs(rows["big"]["budget_tokens"] + rows["small"]["budget_tokens"] - 100_000) <= 1


def test_bpe_merge_candidates_known_corpus(spark):
    from data_engineering_nd_spark.operators.datasets import bpe_merge_candidates

    df = spark.createDataFrame(
        [("aaab aaab",), ("aaab xy",)], ["text"]
    )
    # vocab: aaab (n=3), xy (n=1); pairs: aa x2 per aaab -> 6, ab -> 3, xy -> 1
    rows = {r["pair"]: r["frequency"] for r in bpe_merge_candidates(df, "text").collect()}
    assert rows == {"aa": 6, "ab": 3, "xy": 1}


def test_pack_boundaries_offsets_reset_per_sequence(spark):
    from data_engineering_nd_spark.operators.datasets import (
        ds_pack_boundaries_query,
    )
    from data_engineering_nd_spark.operators.datasets import pack_sequences
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # single group, budget 10, docs of 4 tokens: starts at 0,4,8 stay in
    # seq 0 (assignment is by START offset); the 4th starts at 12 -> seq 1
    # with its in-sequence offset reset to 0.
    docs = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 4)], ["doc_id", "n_tokens"]
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=10, n_groups=1)
    w = (
        Window.partitionBy("pack_group", "seq_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = (
        packed.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["seq_id"], r["off"]) for r in rows] == [
        (0, 0),
        (0, 4),
        (0, 8),
        (1, 0),
    ]


def test_epoch_shards_greedy_invariants(spark):
    """Shard ids are dense from 0 in position order; every non-last
    shard's token mass lands inside budget +- max_doc_tokens (a doc
    straddling a boundary stays whole in the earlier shard); totals
    conserve the corpus."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.functions.text import token_count
    from data_engineering_nd_spark.operators.datasets import epoch_shards
    from data_engineering_nd_spark.catalog import load

    budget = 500
    docs = load(spark, "documents", "/root/testdata/sf0.001")
    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    rows = sorted(
        epoch_shards(toks, budget=budget).collect(), key=lambda r: r["shard_id"]
    )
    max_doc = toks.agg(F.max("n_tokens")).collect()[0][0]
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    n_docs = docs.count()

    assert [r["shard_id"] for r in rows] == list(range(len(rows)))
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == total
    for r in rows[:-1]:
        assert r["total_tokens"] > budget - max_doc
    for r in rows:
        assert r["total_tokens"] < budget + max_doc
    # position ranges are contiguous and non-overlapping in shard order
    for a, b in zip(rows, rows[1:]):
        assert a["max_pos"] + 1 == b["min_pos"]
    assert rows[0]["min_pos"] == 1 and rows[-1]["max_pos"] == n_docs


def test_assign_epoch_shards_bucket_count_invariant(spark):
    """The fused bucket decomposition must reproduce the SAME global
    permutation (training_pos and shard_id) for ANY n_buckets — the
    bucket is a monotone range over the md5-key prefix, not a modulo
    (ADVICE r06 #1: `% n` was a sort-key prefix only at n_buckets=256)."""
    import pytest

    from data_engineering_nd_spark.functions.text import token_count
    from data_engineering_nd_spark.operators.datasets import assign_epoch_shards
    from data_engineering_nd_spark.catalog import load

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))

    def snap(n_buckets):
        return sorted(
            (r["doc_id"], r["training_pos"], r["shard_id"])
            for r in assign_epoch_shards(
                toks, budget=500, n_buckets=n_buckets
            ).collect()
        )

    reference = snap(256)
    for n in (1, 7, 100, 4096):
        assert snap(n) == reference, f"n_buckets={n} changed the permutation"
    with pytest.raises(ValueError, match="n_buckets"):
        assign_epoch_shards(toks, budget=500, n_buckets=0)


def test_write_epoch_shards_materializes_training_order(spark, tmp_path):
    """The written epoch round-trips: the returned manifest equals the
    planned one, every shard directory's rows are stored in training_pos
    order, and reading back (shard_id, training_pos)-sorted reproduces
    the full permutation exactly."""
    import os

    from data_engineering_nd_spark.functions.text import token_count
    from data_engineering_nd_spark.operators.datasets import (
        epoch_permutation,
        epoch_shards,
        write_epoch_shards,
    )
    from data_engineering_nd_spark.catalog import load

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    toks = docs.select("doc_id", token_count("text").alias("n_tokens"))
    out = os.path.join(str(tmp_path), "epoch0")

    planned = {r["shard_id"]: r for r in epoch_shards(toks, budget=500).collect()}
    written = {
        r["shard_id"]: r
        for r in write_epoch_shards(toks, out, budget=500).collect()
    }
    assert set(planned) == set(written)
    for sid, p in planned.items():
        w = written[sid]
        assert (p["n_docs"], p["min_pos"], p["max_pos"], p["total_tokens"]) == (
            w["n_docs"], w["min_pos"], w["max_pos"], w["total_tokens"]
        )

    # per-shard files store rows in training order (parquet preserves row
    # order; the loader reads sequentially)
    for sid in planned:
        pdf = spark.read.parquet(os.path.join(out, f"shard_id={sid}")).toPandas()
        assert list(pdf["training_pos"]) == sorted(pdf["training_pos"])

    # global round-trip: (shard, pos)-ordered read == the permutation
    back = (
        spark.read.parquet(out)
        .orderBy("shard_id", "training_pos")
        .select("doc_id", "training_pos")
        .collect()
    )
    want = (
        epoch_permutation(docs, "doc_id", epoch=0)
        .orderBy("training_pos")
        .select("doc_id", "training_pos")
        .collect()
    )
    assert [tuple(r) for r in back] == [tuple(r) for r in want]


def test_mixture_materialize_tracks_budget(spark):
    """Realized token mass per source lands near the plan's budget
    (stochastic rounding is unbiased; tolerance = a few max-doc masses),
    and copy decisions are deterministic across reruns."""
    from data_engineering_nd_spark.operators.datasets import (
        ds_mixture_materialize_query,
    )

    sf = "/root/testdata/sf0.01"
    rows = {r["source"]: r for r in ds_mixture_materialize_query(spark, sf).collect()}
    again = {r["source"]: r for r in ds_mixture_materialize_query(spark, sf).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }
    for src, r in rows.items():
        assert r["n_rows_materialized"] >= r["n_docs"] // 2  # nothing vanishes wholesale
        # realized mass within 20% of budget (small corpus -> coarse bound)
        assert abs(r["tokens_materialized"] - r["budget_tokens"]) < 0.2 * r["budget_tokens"] + 2000, (src, dict(zip(r.__fields__, r)))


def test_weighted_priority_sample_favors_heavy_rows(spark):
    """DLT priority sampling: a row whose weight dominates the domain
    total must always be drawn (its priority w/u is bounded below by
    w >> 40 even at the worst-case hash), and the per-domain cut keeps
    exactly k rows with ranks 1..k."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.datasets import (
        weighted_priority_sample,
    )

    rows = [("web", f"d{i}", 1) for i in range(50)] + [("web", "heavy", 10**8)]
    df = spark.createDataFrame(rows, "source string, doc_id string, w int")
    out = weighted_priority_sample(
        df, "source", "doc_id", F.col("w"), k=3
    ).collect()
    assert len(out) == 3
    assert [r.rank for r in out] == [1, 2, 3] or sorted(r.rank for r in out) == [1, 2, 3]
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].doc_id == "heavy"
    # the heavy row's integer priority is astronomically above the light
    # rows' ceiling (w * 2^40 / 1 for the best-possible light hash is
    # ~2^40; heavy's floor is ~w >> 20)
    assert by_rank[1].priority > by_rank[2].priority


def test_markov_transitions_counts_and_probs(spark):
    """Known journeys -> exact transition counts; equal-ts ties resolve
    by event_id; probabilities row-normalize."""
    import datetime

    from data_engineering_nd_spark.operators.datasets import markov_transitions

    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # u1: view -> click -> purchase
        (1, ts(0), 1, "view"),
        (2, ts(1), 1, "click"),
        (3, ts(2), 1, "purchase"),
        # u2: view -> view (same ts: event_id orders 4 then 5) -> click
        (4, ts(0), 2, "view"),
        (5, ts(0), 2, "view"),
        (6, ts(1), 2, "click"),
        # u3: single event, no transition
        (7, ts(0), 3, "click"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        (r.from_state, r.to_state): r for r in markov_transitions(df).collect()
    }
    assert out[("view", "click")].n_transitions == 2
    assert out[("view", "view")].n_transitions == 1
    assert out[("click", "purchase")].n_transitions == 1
    assert ("click", "click") not in out  # u3 contributes nothing
    # row normalization: from 'view' there are 3 transitions total
    assert out[("view", "click")].n_from == 3
    assert abs(out[("view", "click")].p - 2 / 3) < 1e-6
    assert abs(out[("view", "view")].p - 1 / 3) < 1e-6
    assert out[("click", "purchase")].p == 1.0


def test_exact_substring_spans_merging_and_cross_doc_only(spark):
    """Span semantics pins: (a) only CROSS-doc repeated n-grams count —
    a phrase repeated twice inside one doc alone yields nothing; (b)
    adjacent duplicated gram positions merge into one maximal span; (c)
    duplicated regions separated by more than the gap stay separate
    spans; (d) docs shorter than n are ignored."""
    from data_engineering_nd_spark.operators.datasets import (
        exact_substring_spans,
    )

    shared = "a b c d e f g h i j"          # 10 tokens: 3 8-grams
    rows = [
        # docs 1 and 2 share `shared` at different offsets
        (1, shared + " x1 y1 z1"),
        (2, "q2 r2 " + shared),
        # doc 3: two copies of a phrase WITHIN one doc, nowhere else
        (3, "p q r s t u v w zz p q r s t u v w"),
        # doc 4: shares `shared` twice, far apart (> gap) -> two spans
        (4, shared + " m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 " + shared),
        # doc 5: too short
        (5, "a b c"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        (r.doc_id, r.span_start, r.span_end): r.span_tokens
        for r in exact_substring_spans(docs, n=8, min_docs=2).collect()
    }
    # doc 1: grams at pos 1..3 merge -> span tokens 1..10
    assert spans[(1, 1, 10)] == 10
    # doc 2: same span shifted by its 2-token prefix
    assert spans[(2, 3, 12)] == 10
    # doc 4: two separate spans (21 tokens between starts > gap 8)
    assert spans[(4, 1, 10)] == 10
    assert spans[(4, 21, 30)] == 10
    # doc 3 (within-doc only) and doc 5 (short) produce nothing
    assert not any(d == 3 or d == 5 for d, _, _ in spans)
    assert len(spans) == 4


def test_rag_chunks_overlap_geometry(spark, tmp_path):
    """Known geometry (W=64, S=48): 100 tokens -> starts 0/48, lengths
    64/52 (coverage complete, no redundant tail window); 160 tokens ->
    starts 0/48/96, three full windows; a short doc -> one whole-doc
    chunk."""
    import pandas as pd

    from data_engineering_nd_spark.operators.datasets import (
        ds_rag_chunks_query,
    )

    t100 = " ".join(f"t{i}" for i in range(100))
    t160 = " ".join(f"t{i}" for i in range(160))
    short_text = "a b c"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [t100, short_text, t160],
            "lang": ["en", "en", "en"],
            "source": ["s_100", "s_short", "s_160"],
            "n_chars": [len(t100), len(short_text), len(t160)],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "documents.parquet"))
    out = {r.source: r for r in ds_rag_chunks_query(spark, str(sf)).collect()}
    assert out["s_100"].n_chunks == 2
    assert out["s_100"].chunk_tokens == 64 + 52
    assert out["s_160"].n_chunks == 3
    assert out["s_160"].chunk_tokens == 3 * 64
    assert out["s_short"].n_chunks == 1
    assert out["s_short"].chunk_tokens == 3
