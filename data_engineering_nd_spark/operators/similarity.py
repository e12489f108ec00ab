"""Similarity search over embedding columns (array<float>).

No counterpart in the reference; part of the training-data-pipeline surface
(driver north star, BASELINE.json §north_star).

- brute-force cosine top-k: the exact baseline. Query set is broadcast
  (it's small by construction); candidates stream through a single
  broadcast-nested-loop... no — the dot product is computed via an equi-join
  on a trivial key-free crossJoin with the broadcast side, so the big side
  never shuffles. Work is O(|queries| x n) — at 100 TB you bound |queries|
  or move to the IVF variant.
- IVF-style top-k: candidate set restricted to vectors in the same coarse
  cell (here the precomputed ``label`` column stands in for a k-means
  centroid assignment; with real data you'd materialize cell ids once with
  a fitted codebook). Turns the scan into an equi-join on cell id — shuffle
  co-partitions query cells with candidate cells, so each task scans one
  cell, the classic IVF trade (recall < 1 for speed).

Dot products use F.aggregate/zip_with over the arrays — JVM-side, no Python.
Similarities are rounded to 4 decimals *after* ranking tie-breaks on vec_id,
so Spark's and the oracle's float roundings cannot reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — same order DuckDB's
    list_dot_product evaluates, so results agree bit-for-bit on equal input."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query against all vectors.

    ``queries`` is broadcast; the candidate scan is embarrassingly parallel
    over the vectors' partitions (no shuffle until the final per-query top-k
    aggregation, which moves only k rows per query per partition thanks to
    the window's partial top-k pushdown under AQE... in practice: rank via
    window over (query_id), which shuffles candidate similarities on
    query_id — bounded by |queries| x n rows of 3 columns, not the vectors).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
    sim = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("v_vec")).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's coarse cell
    (IVF with nprobe=1). Equi-join on cell id instead of a full scan."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(cell_col).alias("cell"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        F.col(cell_col).alias("cell"),
    )
    sim = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("v_vec")).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# driver queries — 10 fixed query vectors against the full table
# ---------------------------------------------------------------------------

_ORACLE_TOPK = """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb{extra}
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    sim AS (
        SELECT
            q.vec_id AS query_id,
            v.vec_id AS neighbor_id,
            list_dot_product(q.emb, v.emb)
              / (sqrt(list_dot_product(q.emb, q.emb)) * sqrt(list_dot_product(v.emb, v.emb)))
              AS sim_raw
        FROM q
        JOIN v ON {join_cond}
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS cosine_sim, rank
    FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id
            ) AS INTEGER) AS rank
        FROM sim
    )
    WHERE rank <= 5
"""


@query(
    "ann_brute_force_topk",
    oracle=_ORACLE_TOPK.format(extra="", join_cond="q.vec_id <> v.vec_id"),
)
def ann_brute_force_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "ann_ivf_topk",
    oracle=_ORACLE_TOPK.format(
        extra=", label",
        join_cond="q.label = v.label AND q.vec_id <> v.vec_id",
    ),
)
def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
