"""Tests for cosine top-k similarity search on handcrafted vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

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
