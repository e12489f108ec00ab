"""Tests for cosine top-k similarity search on handcrafted vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_nd_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0], label=0),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0], label=0),  # closest to 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0], label=1),  # orthogonal
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0], label=1),  # opposite
        Row(vec_id=4, embedding=[0.7, 0.7, 0.0], label=0),
    ]
    return spark.createDataFrame(rows)


def test_brute_force_topk_ordering(spark, vectors):
    out = brute_force_topk(
        vectors, vectors.filter("vec_id = 0"), k=4
    ).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [1, 4, 2, 3]  # by descending cosine to [1,0,0]
    sims = {r.neighbor_id: r.cosine_sim for r in out}
    assert sims[1] == pytest.approx(0.9939, abs=1e-4)
    assert sims[2] == 0.0
    assert sims[3] == -1.0


def test_ivf_restricts_to_cell(spark, vectors):
    out = ivf_topk(vectors, vectors.filter("vec_id = 0"), k=4).collect()
    assert {r.neighbor_id for r in out} == {1, 4}  # label-0 cell only


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """Learned-codebook IVF with nprobe=2 must recover most of the exact
    top-5 (the synthetic embeddings are cluster-structured, so spherical
    k-means recovers the cells)."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_nprobe,
        train_codebook,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, "embeddings", sf)
    queries = vecs.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    codebook = train_codebook(vecs, n_cells=8)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_nprobe(vecs, queries, codebook, k=5, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
    # and the codebook train is deterministic
    import numpy as np

    assert np.allclose(codebook, train_codebook(vecs, n_cells=8))


def test_lsh_topk_collides_true_neighbor(spark, vectors):
    """With every band available, the handcrafted near-duplicate of vector 0
    must surface and rerank with its exact cosine."""
    from data_engineering_nd_spark.operators.similarity import lsh_topk

    out = lsh_topk(
        vectors, vectors.filter("vec_id = 0"), k=4, n_bits=16, n_bands=8
    ).collect()
    sims = {r.neighbor_id: r.cosine_sim for r in out}
    assert 1 in sims  # 8 bands of 2 bits: a 0.994-cosine pair collides
    assert sims[1] == pytest.approx(0.9939, abs=1e-4)


def test_lsh_recall_and_determinism(spark):
    """Banded hyperplane LSH at the registered query's settings must
    recover most of the exact top-5 on the cluster-structured testdata,
    and two runs must agree row-for-row (seeded planes)."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, "embeddings", sf)
    queries = vecs.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    run1 = lsh_topk(vecs, queries, k=5).collect()
    approx = {(r.query_id, r.neighbor_id) for r in run1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
    run2 = lsh_topk(vecs, queries, k=5).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))


def test_lsh_rerank_sims_match_brute_force(spark):
    """Every LSH candidate's reranked cosine must equal the exact cosine
    brute force computes for the same pair (the approximation is in the
    candidate set, never in the scores)."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, "embeddings", sf)
    queries = vecs.filter(F.col("vec_id") < 3)
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in brute_force_topk(vecs, queries, k=499).collect()
    }
    for r in lsh_topk(vecs, queries, k=5).collect():
        assert exact_all[(r.query_id, r.neighbor_id)] == r.cosine_sim


def test_quantized_rerank_recall_and_exact_scores(spark):
    """int8 coarse pass + exact rerank: high recall vs brute force, and the
    emitted scores are EXACT cosines (quantization only affects which
    candidates get reranked, never the reported similarity)."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        quantized_rerank_topk,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, "embeddings", sf)
    queries = vecs.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(vecs, queries, k=5).collect()
    }
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in brute_force_topk(vecs, queries, k=499).collect()
    }
    run1 = quantized_rerank_topk(vecs, queries, k=5).collect()
    approx = {(r.query_id, r.neighbor_id) for r in run1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall  # int8 on unit-ish vectors is near-lossless
    for r in run1:
        assert exact_all[(r.query_id, r.neighbor_id)] == r.cosine_sim
    run2 = quantized_rerank_topk(vecs, queries, k=5).collect()
    assert sorted(map(tuple, run1)) == sorted(map(tuple, run2))


def test_quantize_int8_bounds(spark):
    """Quantized values stay in [-127,127]; zero vectors quantize to zeros."""
    from data_engineering_nd_spark.operators.similarity import quantize_int8
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [0.5, -2.0, 1.0]), (2, [0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    out = {r.vec_id: r.q_vec for r in quantize_int8(df).collect()}
    assert out[1] == [32, -127, 64]  # round(0.5/ (2/127)), -127, round(1/(2/127))
    assert out[2] == [0, 0, 0]


def test_pca_orthonormal_and_variance_ordered(spark):
    """Components are orthonormal; per-component projected variance is
    non-increasing; projection is deterministic across runs."""
    import numpy as np
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import project_pca, train_pca

    sf = "/root/testdata/sf0.001"
    emb = load(spark, "embeddings", sf)
    mean, comps = train_pca(emb, n_components=4)
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    rows = project_pca(emb.select("vec_id", "embedding"), mean, comps).collect()
    p = np.array([r["pca"] for r in rows])
    var = p.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(3)), var
    mean2, comps2 = train_pca(emb, n_components=4)
    assert np.array_equal(comps, comps2) and np.array_equal(mean, mean2)


def test_pca_reconstruction_beats_truncation(spark):
    """Sanity: reconstructing from 4 PCs loses less energy than just
    zeroing all but 4 coordinates (PCA basis actually learned something)."""
    import numpy as np
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import train_pca

    sf = "/root/testdata/sf0.001"
    emb = load(spark, "embeddings", sf)
    rows = emb.select("embedding").orderBy("vec_id").limit(500).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    mean, comps = train_pca(emb, n_components=4)
    xc = x - mean
    pca_err = ((xc - (xc @ comps.T) @ comps) ** 2).sum()
    trunc = xc.copy()
    trunc[:, 4:] = 0
    trunc_err = ((xc - trunc) ** 2).sum()
    assert pca_err < trunc_err


def test_cosine_range_search_contains_topk_above_threshold(spark):
    """Range search must return exactly the brute-force top-k rows whose
    similarity clears the threshold (plus anything beyond k) — consistency
    between the two exact operators on the same data."""
    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        cosine_range_search,
    )

    emb = load(spark, "embeddings", "/root/testdata/sf0.01")
    q = emb.filter(F.col("vec_id") < 5)
    thr = 0.30
    rng = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in cosine_range_search(emb, q, threshold=thr).collect()
    }
    topk = brute_force_topk(emb, q, k=50).collect()
    above = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in topk
        if r.cosine_sim >= thr
    }
    # every above-threshold top-k hit appears with the identical similarity
    assert above and all(rng.get(k) == v for k, v in above.items())
    # nothing in range output falls below the threshold
    assert all(v >= thr for v in rng.values())


def test_knn_join_within_block_exact(spark):
    """Known 2-block geometry: neighbors ranked by exact cosine within the
    block only; cross-block pairs never appear."""
    import math

    from data_engineering_nd_spark.operators.similarity import knn_join

    rows = [
        # block 0: x-axis, 45deg, y-axis
        (0, [1.0, 0.0], 0),
        (1, [1.0, 1.0], 0),
        (2, [0.0, 1.0], 0),
        # block 1: two opposite vectors
        (10, [1.0, 0.0], 1),
        (11, [-1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = knn_join(df, k=2)
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"]) for r in out.collect()}
    # query 0: nearest is 1 (cos 45deg ~ 0.7071), then 2 (0.0)
    assert got[(0, 1)][0] == 1
    assert abs(got[(0, 1)][1] - round(1 / math.sqrt(2), 4)) < 1e-9
    assert got[(0, 2)] == (2, 0.0)
    # block 1: only each other, opposite directions
    assert got[(10, 1)] == (11, -1.0)
    assert got[(11, 1)] == (10, -1.0)
    assert (10, 2) not in got and (11, 2) not in got
    # no cross-block neighbors anywhere
    for (qid, _), (nid, _) in got.items():
        assert (qid < 10) == (nid < 10)


def test_semantic_dedup_keep_first_within_block(spark):
    """Identical vectors in one block: the smallest id survives, later
    copies drop; an orthogonal vector and a lone other-block vector keep."""
    from data_engineering_nd_spark.operators.similarity import (
        semantic_dedup_decisions,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),   # duplicate of 1 -> dropped
        (3, [0.0, 1.0], 0),   # orthogonal -> kept
        (4, [1.0, 0.0], 1),   # same direction but other block -> kept
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {r["vec_id"]: r for r in semantic_dedup_decisions(df, threshold=0.9).collect()}
    assert not got[1]["dropped"] and got[1]["max_prior_sim"] is None
    assert got[2]["dropped"] and got[2]["max_prior_sim"] == 1.0
    assert not got[3]["dropped"] and got[3]["max_prior_sim"] == 0.0
    assert not got[4]["dropped"] and got[4]["max_prior_sim"] is None


def test_lsh_md5_neighbors_subset_of_brute_force_order(spark):
    """Every (query, neighbor) the md5-SRP path returns must carry the
    EXACT cosine (the rerank is exact, only candidate GENERATION is approximate)."""
    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk_md5,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter("vec_id < 5")
    # 3 planes -> 8 buckets so 60 vectors are guaranteed collisions
    lsh = lsh_topk_md5(df, queries, k=3, n_planes=3)
    bf = brute_force_topk(df, queries, k=60)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in bf.collect()
    }
    got = lsh.collect()
    assert len(got) > 0
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert abs(r["cosine_sim"] - exact[key]) < 1e-9


def test_ivf_md5_cells_partition_and_rerank_exact(spark):
    """md5-IVF: every vector lands in exactly one cell; the rerank carries
    the EXACT cosine (candidate generation is the only approximate part)."""
    import random

    from data_engineering_nd_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_md5,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter("vec_id < 5")
    ivf = ivf_topk_md5(df, queries, k=3, n_cells=4, nprobe=2)
    bf = brute_force_topk(df, queries, k=60)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in bf.collect()
    }
    got = ivf.collect()
    assert len(got) > 0
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert abs(r["cosine_sim"] - exact[key]) < 1e-9
    # per query at most k rows, ranks dense from 1
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_project_md5_is_linear(spark):
    """The md5 projection is affine: proj(a) - proj(b) equals the
    projection of (a - b) (mean cancels), pinning that the Spark-side
    fold really is the advertised linear map."""
    from data_engineering_nd_spark.operators.similarity import (
        _md5_const_vector,
        project_md5,
    )

    a = [0.5] * 64
    b = [-0.25] * 64
    df = spark.createDataFrame(
        [(1, a), (2, b)], ["vec_id", "embedding"]
    )
    got = {r["vec_id"]: r for r in project_md5(df).collect()}
    for p in range(4):
        w = _md5_const_vector(f"pc:{p}")
        expect_diff = sum((x - y) * wi for x, y, wi in zip(a, b, w))
        assert abs((got[1][f"pc_{p}"] - got[2][f"pc_{p}"]) - expect_diff) < 1e-3


def test_hybrid_rrf_fusion_arithmetic(spark):
    """RRF on hand-built rank lists: overlapping docs sum both
    reciprocals, single-system docs get one, ordering breaks ties by
    doc_id, and the cut keeps exactly `top`."""
    from data_engineering_nd_spark.operators.similarity import hybrid_rrf

    sem = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], ["doc_id", "rank_sem"]
    )
    lex = spark.createDataFrame(
        [(2, 1), (4, 2), (5, 3)], ["doc_id", "rank_lex"]
    )
    rows = {
        r.doc_id: r
        for r in hybrid_rrf(sem, lex, rrf_k=60, top=4).collect()
    }
    # doc 2 appears in both systems -> highest fused score
    assert rows[2].fused_rank == 1
    assert abs(rows[2].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-9
    # doc 1: sem only; doc 4: lex only — same reciprocal (ranks 1 vs 2)
    assert abs(rows[1].rrf_score - round(1 / 61, 6)) < 1e-9
    assert rows[1].rank_lex is None and rows[4].rank_sem is None
    # top=4 cut: docs 3 and 5 tie at 1/63, doc_id breaks it -> 5 dropped
    assert len(rows) == 4
    assert 3 in rows and 5 not in rows


def test_pq_codes_and_adc_geometry(spark):
    """PQ sanity on crafted vectors: a vector BUILT FROM codebook words
    encodes to exactly those words with ADC distance 0 to itself-as-query;
    a vector near codeword A encodes to A, not B."""
    from data_engineering_nd_spark.operators.similarity import (
        _md5_const_vector,
        _PQ_M,
        _PQ_SUB,
        pq_adc_topk_md5,
        pq_codes_md5,
    )

    # vec 100: concatenation of codewords (s, c=3); vec 200: codewords (s, c=7)
    v100 = [x for s in range(_PQ_M) for x in _md5_const_vector(f"pq:{s}:3", _PQ_SUB)]
    v200 = [x for s in range(_PQ_M) for x in _md5_const_vector(f"pq:{s}:7", _PQ_SUB)]
    df = spark.createDataFrame(
        [(100, v100), (200, v200)], "vec_id long, embedding array<double>"
    )
    codes = {
        (r.neighbor_id, r.s): r.c for r in pq_codes_md5(df).collect()
    }
    assert all(codes[(100, s)] == 3 for s in range(_PQ_M))
    assert all(codes[(200, s)] == 7 for s in range(_PQ_M))

    # query = v100 exactly: its ADC distance to neighbor 200 is the true
    # codeword-to-codeword distance (positive); to itself it would be 0
    # (excluded by the self-filter) — so 200 ranks first with d2 > 0
    out = pq_adc_topk_md5(df, df.filter("vec_id = 100"), k=5).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in out] == [(100, 200, 1)]
    assert out[0].approx_d2 > 0


def test_incremental_ivf_merges_batches_into_index(spark, tmp_path):
    """Two-day incremental flow: day-1 batch is served against the
    bootstrap corpus index and merged in; day-2 batch must then see
    day-1's vectors as candidates THROUGH THE INDEX (no corpus
    re-assignment), and its results must equal a from-scratch run whose
    corpus is corpus+day1."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.similarity import (
        incremental_ivf_topk,
    )
    from data_engineering_nd_spark.tables import VersionedTable

    emb = load(spark, "embeddings", "/root/testdata/sf0.001")
    corpus = emb.filter(F.col("vec_id") % 7 > 1)
    day1 = emb.filter(F.col("vec_id") % 7 == 0)
    day2 = emb.filter(F.col("vec_id") % 7 == 1)

    root = str(tmp_path / "ivf")
    r1 = incremental_ivf_topk(corpus, day1, root).collect()
    assert r1 and all(r.rank <= 3 for r in r1)
    # index now holds corpus + day1
    table = VersionedTable(spark, root)
    assert table.latest_version() == 1

    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in incremental_ivf_topk(corpus, day2, root, lookup=emb).collect()
    }
    want = {
        (r.query_id, r.rank): r.neighbor_id
        for r in incremental_ivf_topk(
            corpus.unionByName(day1), day2, str(tmp_path / "scratch")
        ).collect()
    }
    assert got == want
    # day-1 vectors are reachable as neighbors through the merged index
    day1_ids = {r.vec_id for r in day1.select("vec_id").collect()}
    assert day1_ids & set(got.values())


def test_ivf_pq_residual_codes_and_adc(spark):
    """IVFADC geometry on crafted vectors: v = (cell-2 centroid) +
    (codeword concat) assigns to cell 2 and its RESIDUAL encodes to
    exactly those codewords; ADC distance between two such vectors is the
    true codeword-to-codeword distance, so ranking is exact."""
    from data_engineering_nd_spark.operators.similarity import (
        _md5_const_vector,
        _PQ_M,
        _PQ_SUB,
        ivf_pq_adc_topk_md5,
        md5_cell_assignments,
    )

    cw2 = _md5_const_vector("iv:2", 64)
    words3 = [x for s in range(_PQ_M) for x in _md5_const_vector(f"pq:{s}:3", _PQ_SUB)]
    words7 = [x for s in range(_PQ_M) for x in _md5_const_vector(f"pq:{s}:7", _PQ_SUB)]
    va = [a + b for a, b in zip(cw2, words3)]
    vb = [a + b for a, b in zip(cw2, words7)]
    df = spark.createDataFrame(
        [(100, va), (200, vb)], "vec_id long, embedding array<double>"
    )
    # both crafted vectors must coarse-assign to cell 2 (centroid energy
    # dominates the codeword perturbation for the fixed md5 values)
    cells = {r.vec_id: r.cell for r in md5_cell_assignments(df, 1).collect()}
    assert cells == {100: 2, 200: 2}

    out = ivf_pq_adc_topk_md5(df, df.filter("vec_id = 100"), k=5).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in out] == [(100, 200, 1)]
    # residual(va) == words3 exactly, residual(vb) == words7 exactly, so
    # the ADC estimate equals the true codeword-to-codeword distance
    true_d2 = sum((x - y) ** 2 for x, y in zip(words3, words7))
    assert abs(out[0].approx_d2 - true_d2) < 1e-4


def test_nndescent_recovers_planted_clusters(spark):
    """Well-separated clusters: 3 descent rounds from blind md5 blocks
    must recover every query's exact top-k (recall 1.0), and the
    in_exact flags must say so."""
    import math

    from data_engineering_nd_spark.operators.similarity import (
        nndescent_topk,
    )

    # 4 clusters of 10 along orthogonal axes + tiny deterministic jitter
    rows = []
    for i in range(40):
        c = i % 4
        vec = [0.0] * 8
        vec[c * 2] = 1.0
        vec[c * 2 + 1] = 0.01 * (i // 4)  # in-cluster spread
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = nndescent_topk(emb, k=3, query_mod=5)  # queries: 0,5,...,35
    got = out.collect()
    assert len(got) == 8 * 3
    assert all(r.in_exact_topk for r in got), got
    # neighbors must come from the query's own cluster
    for r in got:
        assert r.neighbor_id % 4 == r.query_id % 4


def test_nndescent_two_hop_expansion_beats_init(spark):
    """The descent rounds must add neighbors the blocked init cannot
    see: with one query cluster spread across blocks, final cosine of
    rank-1 neighbors is the true max (0.9999+) for every query."""
    from data_engineering_nd_spark.operators.similarity import (
        nndescent_topk,
    )

    rows = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.query_id: r for r in nndescent_topk(emb, k=1, query_mod=10).collect()}
    assert set(out) == {0, 10, 20}
    for r in out.values():
        assert r.cosine_sim > 0.999
        assert r.in_exact_topk
