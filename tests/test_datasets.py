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
