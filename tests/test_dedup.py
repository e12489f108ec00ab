"""Tests for the dedup operator family on handcrafted near/exact duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_engineering_nd_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash64,
    simhash_pairs,
)
from data_engineering_nd_spark.functions.text import normalize_text

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun and everyone is happy"
)
NEAR = BASE.replace("afternoon", "morning")  # one-token change
FAR = (
    "completely different content about distributed query engines shuffling "
    "partitions across executors with adaptive execution enabled for scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text=BASE, lang="en"),
        Row(doc_id=2, text="  " + BASE.upper() + "  ", lang="en"),  # exact after norm
        Row(doc_id=3, text=NEAR, lang="en"),
        Row(doc_id=4, text=FAR, lang="en"),
        Row(doc_id=5, text=BASE, lang="de"),  # other block
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(spark, docs):
    assert exact_dedup(docs, ["text"]).count() == 4  # docs 1 and 5 share raw text
    groups = {
        r.keeper_id: r.n_copies
        for r in exact_dedup_groups(docs, "doc_id", normalize_text("text")).collect()
    }
    assert groups[1] == 3  # 1, 2 (case/space-normalized) and 5 collapse
    assert groups[3] == 1 and groups[4] == 1


def test_jaccard_pairs(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical token sets
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.8  # one-token diff
    assert not any(4 in p for p in pairs)  # FAR matches nothing
    assert not any(5 in p for p in pairs)  # other block never compared


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # exact dup pair must be found (identical signatures -> identical buckets)
    assert pairs[(1, 2)] == 1.0
    assert (1, 5) in pairs and (2, 5) in pairs
    # near-dup should be surfaced at this threshold with 16 bands
    assert (1, 3) in pairs
    # verification step keeps false positives out
    assert all(j >= 0.5 for j in pairs.values())
    assert not any(4 in p for p in pairs)


def test_simhash_properties(spark, docs):
    fps = {r.id: r.fp for r in simhash64(docs, "doc_id", "text").collect()}
    assert fps[1] == fps[2] == fps[5]  # normalization-identical docs
    ham_13 = bin((fps[1] ^ fps[3]) & (2**64 - 1)).count("1")
    ham_14 = bin((fps[1] ^ fps[4]) & (2**64 - 1)).count("1")
    assert ham_13 < ham_14  # near-dup closer than unrelated
    pairs = {(r.id_a, r.id_b) for r in simhash_pairs(spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=BASE + " extra")]
    ), "doc_id", "text", max_hamming=10).collect()}
    assert (1, 2) in pairs


def test_embedding_cosine_blocked_matches_allpairs(spark):
    from pyspark.sql import Row

    from data_engineering_nd_spark.operators.dedup import embedding_cosine_pairs

    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0], label=0),
        Row(vec_id=2, embedding=[0.99, 0.14, 0.0], label=0),   # near-dup of 1
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0], label=0),     # orthogonal
        Row(vec_id=4, embedding=[0.0, 0.98, 0.2], label=1),    # other block
        Row(vec_id=5, embedding=[0.0, 0.97, 0.24], label=1),   # near-dup of 4
        Row(vec_id=6, embedding=[0.0, 0.0, 0.0], label=1),     # zero vector
    ]
    vecs = spark.createDataFrame(rows)
    # blocked and all-pairs evaluations are independent — overlap them
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_blocked = pool.submit(
            lambda: embedding_cosine_pairs(vecs, threshold=0.9).collect()
        )
        f_all = pool.submit(
            lambda: embedding_cosine_pairs(
                vecs, block_col=None, threshold=0.9
            ).collect()
        )
        blocked = {(r.id_a, r.id_b): r.cosine_sim for r in f_blocked.result()}
        all_rows = f_all.result()
    assert set(blocked) == {(1, 2), (4, 5)}
    # numpy Gram path agrees with the JVM fold path on the same pairs
    allpairs = {(r.id_a, r.id_b): r.cosine_sim for r in all_rows}
    assert set(blocked) <= set(allpairs)
    for k in blocked:
        assert abs(blocked[k] - allpairs[k]) < 1e-9


def test_dedup_clusters_transitive_closure(spark):
    from data_engineering_nd_spark.operators.dedup import dedup_clusters

    # chain 1-2-3 plus isolated pair (10, 11): transitivity must pull 3
    # into cluster 1 even though (1,3) is not a pair.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_cc_matches_label_propagation_and_union_find(spark):
    """connected_components_star must equal both the propagation CC and a
    plain union-find on random graphs — min-id labelling, every node
    covered, no diameter dependence."""
    import random

    from data_engineering_nd_spark.operators.dedup import (
        connected_components_star,
        dedup_clusters,
    )

    def one_trial(trial):
        # per-trial seed: each trial's edge set is deterministic on its
        # own, independent of execution order across threads
        trng = random.Random(7000 + trial)
        n, m = 60, 45
        edges = [
            (trng.randrange(n), trng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # union-find ground truth: comp = min id reachable
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {
            i: find(i)
            for i in range(n)
            if any(i in e for e in edges)
        }

        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        star = {
            r.id: r.comp
            for r in connected_components_star(
                pairs, src="id_a", dst="id_b"
            ).collect()
        }
        prop = {
            r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()
        }
        assert star == truth, f"trial {trial}: star != union-find"
        assert prop == truth, f"trial {trial}: propagation != union-find"

    # the three random-graph trials are independent CC computations whose
    # iterative loops are driver-round-trip-bound — overlap them
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(one_trial, range(3)))


def test_star_cc_long_chain_converges_fast(spark):
    """A 64-node path graph (diameter 63) must converge in O(log^2 n)
    star rounds — the scenario where plain propagation needs 63 rounds."""
    from data_engineering_nd_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["id_a", "id_b"]
    )
    got = {
        r.id: r.comp
        for r in connected_components_star(
            pairs, src="id_a", dst="id_b", max_iterations=12
        ).collect()
    }
    assert got == {i: 0 for i in range(64)}


def test_cc_nonconvergence_raises_not_silent(spark):
    """Exhausting max_iterations without the convergence witness must raise
    (ADVICE r04): a fallen-through star frame is not a star forest and a
    partially-propagated labelling is wrong — neither may be returned."""
    import pytest

    from data_engineering_nd_spark.operators.dedup import (
        connected_components_star,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components_star(
            pairs, src="id_a", dst="id_b", max_iterations=1
        ).collect()
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iterations=1).collect()


def test_ngram_coverage_flags_shared_spans(spark):
    """A 5-gram span shared verbatim between two documents is counted as
    duplicated in both; unique spans are not; short docs compare as one
    whole-text shingle."""
    from data_engineering_nd_spark.operators.dedup import ngram_coverage

    shared = "the quick brown fox jumps over the lazy dog"  # 9 words
    rows = [
        (1, shared + " alpha beta gamma delta epsilon"),
        (2, shared + " zeta eta theta iota kappa"),
        (3, "completely different words without any overlap here at all"),
        (4, "tiny doc"),  # < 5 words -> single whole-text shingle
        (5, "tiny doc"),  # exact duplicate of 4 -> fully covered
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in ngram_coverage(df, "doc_id", "text", k=5).collect()}
    # 14 words -> 10 sliding 5-grams; the 5 grams fully inside `shared`
    # (positions 1-5 of 9-4) are common to docs 1 and 2
    assert out[1].n_grams == 10 and out[2].n_grams == 10
    assert out[1].n_dup_grams == 5 and out[2].n_dup_grams == 5
    assert out[1].dup_fraction == 0.5
    # no cross-doc overlap -> zero coverage
    assert out[3].n_dup_grams == 0 and out[3].dup_fraction == 0.0
    # exact short duplicates fully cover each other
    assert out[4].n_grams == 1 and out[4].dup_fraction == 1.0
    assert out[5].dup_fraction == 1.0


def test_minhash_md5_variant_finds_identical_and_skips_disjoint(spark):
    """Identical docs collide in every band and verify at jaccard 1.0;
    disjoint docs never pair. The md5 family must agree with ground truth
    exactly like the xxhash64 family."""
    from data_engineering_nd_spark.operators.dedup import minhash_lsh_pairs_md5

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    rows = minhash_lsh_pairs_md5(docs, "doc_id", "text", threshold=0.5).collect()
    assert len(rows) == 1
    assert (rows[0]["id_a"], rows[0]["id_b"], rows[0]["jaccard"]) == (1, 2, 1.0)


def test_simhash_md5_variant_identical_and_disjoint(spark):
    from data_engineering_nd_spark.operators.dedup import simhash_pairs_md5

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "unrelated words entirely different content here now"),
        ],
        ["doc_id", "text"],
    )
    rows = simhash_pairs_md5(docs, "doc_id", "text", max_hamming=3).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in rows] == [(1, 2, 0)]


def test_incremental_dedup_matches_one_shot_and_merges_index(spark, tmp_path):
    """incremental_minhash_pairs against a persisted index finds EXACTLY
    the one-shot md5-LSH pairs that involve at least one batch doc (same
    hash family, same bands — the index round-trip loses nothing), and
    the merge commit appends the batch signatures so the index serves
    tomorrow's batch."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs_md5,
    )
    from data_engineering_nd_spark.tables import VersionedTable

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    root = str(tmp_path / "index")

    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in incremental_minhash_pairs(
            corpus, batch, root, "doc_id", "text", threshold=0.5
        ).collect()
    }
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    expected = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs_md5(docs, "doc_id", "text", 0.5).collect()
        if r.id_a in batch_ids or r.id_b in batch_ids
    }
    assert got == expected and got  # non-vacuous

    table = VersionedTable(spark, root)
    assert table.latest_version() == 1  # bootstrap commit + merge commit
    # after the merge the index covers every doc (corpus AND batch), so
    # tomorrow's batch joins against both
    idx_ids = {r.id for r in table.snapshot().select("id").distinct().collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert idx_ids == all_ids


def test_containment_detects_subset_duplicates(spark):
    """A quote wholly inside a longer page: containment flags the
    quote->page direction Jaccard misses; near-equal docs flag BOTH
    directions; sub-threshold overlap flags neither."""
    from data_engineering_nd_spark.operators.dedup import containment_pairs

    page = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "alpha beta gamma delta epsilon", "en"),   # 5 toks, all in page
        (2, page, "en"),                                # 10 toks
        (3, page + " extra", "en"),                     # 11 toks, ~page
        (4, "alpha omega psi chi phi", "en"),           # 1/5 overlap w/ page
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {
        (r.doc_id, r.contained_in): r
        for r in containment_pairs(df, "doc_id", "text", "lang", 0.8).collect()
    }
    # quote in page: one direction only
    assert (1, 2) in out and (2, 1) not in out
    assert out[(1, 2)].containment == 1.0
    assert out[(1, 2)].n_tokens == 5 and out[(1, 2)].n_tokens_super == 10
    # near-equal pages: both directions (10/10 and 10/11)
    assert (2, 3) in out and (3, 2) in out
    assert out[(3, 2)].containment == round(10 / 11, 6)
    # low overlap: absent entirely
    assert not any(4 in k for k in out)

def test_survivorship_clusters_and_rules(spark, tmp_path):
    """Transitive match chain collapses to one golden record with the
    lexicographic-min rep and longest-name survivor; non-matching names
    stay singletons."""
    import pandas as pd

    from data_engineering_nd_spark.operators.dedup import dedup_survivorship_query

    names = ["blue bolt", "blue bolt", "blue boltz", "blue rod", "red bolt"]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pd.DataFrame({"p_name": names})).write.parquet(
        str(sf / "part.parquet")
    )
    out = {r.rep_name: r for r in dedup_survivorship_query(spark, str(sf)).collect()}
    # bolt~boltz (1) and bolt~rod (3) chain all three; boltz~rod (4) irrelevant
    assert set(out) == {"blue bolt", "red bolt"}
    g = out["blue bolt"]
    assert (g.n_names, g.n_parts, g.longest_name) == (3, 4, "blue boltz")
    s = out["red bolt"]
    assert (s.n_names, s.n_parts, s.longest_name) == (1, 1, "red bolt")


def test_ppjoin_matches_brute_force_jaccard(spark):
    """Prefix-filtered join == unblocked brute force on a corpus with
    near-dup pairs, a disjoint doc, and an empty doc."""
    from data_engineering_nd_spark.operators.dedup import (
        jaccard_pairs,
        ppjoin_pairs,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # ~0.8 vs 1
        (3, "the quick brown fox jumps over the lazy dog"),   # == 1
        (4, "entirely different tokens about spark engines"),
        (5, ""),                                              # empty doc
        (6, "quick brown fox jumps over lazy dog the extra"), # superset-ish
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # the four (threshold, implementation) evaluations are independent —
    # overlap their driver round-trips (guide §2.6), assert after
    from concurrent.futures import ThreadPoolExecutor

    def run(spec):
        t, which = spec
        df = (
            ppjoin_pairs(docs, "doc_id", "text", t)
            if which == "ppjoin"
            else jaccard_pairs(
                docs.selectExpr("doc_id", "text", "1 AS blk"),
                "doc_id", "text", "blk", t,
            )
        )
        return spec, sorted(
            (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
        )

    specs = [(t, w) for t in (0.5, 0.8) for w in ("ppjoin", "brute")]
    with ThreadPoolExecutor(max_workers=4) as pool:
        res = dict(pool.map(run, specs))
    for t in (0.5, 0.8):
        got, want = res[(t, "ppjoin")], res[(t, "brute")]
        assert got == want and got, f"t={t}: {got} != {want}"


def test_ppjoin_prefix_is_rare_first(spark):
    """A token shared by every doc (stopword) must never be the only
    candidate generator at high threshold: docs overlapping ONLY on the
    universal token produce no pair."""
    from data_engineering_nd_spark.operators.dedup import ppjoin_pairs

    rows = [(i, f"common u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h u{i}i")
            for i in range(1, 30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert ppjoin_pairs(docs, "doc_id", "text", 0.9).count() == 0


def test_levenshtein_pairs_blocking_and_threshold(spark):
    """Prefix-blocked edit-distance pairs: same-prefix near-dups found,
    different-prefix pairs never compared, threshold respected."""
    from pyspark.sql import Row

    from data_engineering_nd_spark.operators.text_analysis import (
        levenshtein_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text=base),
            Row(doc_id=2, lang="en", text=base.replace("lazy", "hazy")),
            Row(doc_id=3, lang="en", text="completely different opening text here"),
            Row(doc_id=4, lang="de", text=base),  # other group: never paired
            Row(doc_id=5, lang="en", text=base[:30] + " entirely divergent tail padding xxxxxxxxxxxxxxxxxxxxxx"),
        ]
    )
    out = {r.lang: r for r in levenshtein_pairs(docs).collect()}
    assert set(out) == {"en"}
    # pairs among {1,2,5} sharing the prefix, within threshold: (1,2) dist 1;
    # (1,5)/(2,5) have big tail distance -> included only if <= 20 (they are
    # not: >30 chars differ)
    assert out["en"].n_pairs == 1 and out["en"].dist_total == 1
