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


def _spread(df: DataFrame, by: str | None = None) -> DataFrame:
    """Repartition a frame whose planned partition count is far below the
    session's parallelism, so heavy per-row work downstream (pair fanout +
    cosine folds) does not serialize on one core.

    The testdata parquet files are single-row-group, so their scans are
    ONE task no matter what ``maxPartitionBytes`` says, and AQE's
    byte-based coalescing folds the tiny exchanges these operators emit
    down to one partition — either way the millions of interpreted dot
    folds that follow ran single-threaded (r14 optimization round,
    event-log profiles). At production scale the scan already has >= the
    session's parallelism in splits and this is a no-op — the payload is
    never re-shuffled when the layout is already parallel."""
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning-only guard
        return df
    if n >= max(2, par // 2):
        return df
    return df.repartition(par, by) if by else df.repartition(par)


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
    v = _spread(vectors).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    )
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
    v = _spread(vectors).select(
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


def cosine_range_search(
    vectors: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, candidate) pairs with cosine similarity >= threshold —
    the range-query sibling of ``brute_force_topk`` (radius search instead
    of k-nearest): the shape used for "find EVERYTHING similar enough"
    duplicate sweeps, where top-k would silently truncate large duplicate
    families.

    The threshold is applied to the 4-dp-ROUNDED similarity — that is the
    operator's contract, so membership at the boundary is decided on a
    value both engines (and any re-run) agree on bit-for-bit, rather than
    on raw-float noise. Queries broadcast; the candidate scan never
    shuffles, and the output is filter-pruned scan-side (no window at all,
    unlike top-k)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = _spread(vectors).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    )
    return (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("v_vec")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


@query(
    "ann_cosine_range",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10)
    SELECT query_id, neighbor_id, cosine_sim
    FROM (
        SELECT
            q.vec_id AS query_id,
            v.vec_id AS neighbor_id,
            round(
                list_dot_product(q.emb, v.emb)
                / (sqrt(list_dot_product(q.emb, q.emb))
                   * sqrt(list_dot_product(v.emb, v.emb))), 4) AS cosine_sim
        FROM q
        JOIN v ON q.vec_id <> v.vec_id
    )
    WHERE cosine_sim >= 0.30
    """,
)
def ann_cosine_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return cosine_range_search(
        emb, emb.filter(F.col("vec_id") < 10), threshold=0.30
    )


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


# ---------------------------------------------------------------------------
# IVF with a real trained codebook (the scale path when no precomputed cell
# id exists). Train: bounded deterministic sample -> driver-side numpy
# k-means on the unit sphere (spherical k-means, cosine-consistent).
# Assign: one Arrow-batched matmul per batch (mapInPandas), codebook rides
# the closure (KBs). Search: query probes its nprobe nearest cells, so
# recall degrades gracefully instead of falling off a cliff at cell edges.
# ---------------------------------------------------------------------------


def train_codebook(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    sample: int = 4096,
    iters: int = 10,
):
    """Spherical k-means codebook (numpy, driver-side) from a deterministic
    bounded sample — sampling more than ~thousands of vectors does not
    improve centroids enough to matter, so the driver pull is O(sample·d)
    regardless of corpus size. Fixed init (first n_cells sample rows in id
    order) keeps re-runs identical."""
    import numpy as np

    rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cents = x[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def assign_cells(
    df: DataFrame,
    codebook,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Append the nearest-centroid cell id: one numpy matmul per Arrow
    batch, no shuffle (narrow transformation)."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(codebook, dtype=np.float64)
    out_fields = df.schema.fields
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += f", {out_col} int"

    def add_cell(batches):
        for pdf in batches:
            if len(pdf):
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                pdf = pdf.assign(**{out_col: np.argmax(mat @ cents.T, axis=1).astype("int32")})
            else:
                pdf = pdf.assign(**{out_col: pd.Series(dtype="int32")})
            yield pdf

    return df.mapInPandas(add_cell, schema)


def ivf_topk_nprobe(
    vectors: DataFrame,
    queries: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search with multi-cell probing: each query fans out to its nprobe
    nearest centroids (explode of a tiny array), candidates come from an
    equi-join on the cell id, exact cosine reranks. Scan fraction ≈
    nprobe/n_cells of the corpus per query."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(codebook, dtype=np.float64)
    v = assign_cells(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")),
        cents,
        vec_col="v_vec",
    )

    q_schema = "query_id bigint, q_vec array<float>, cell int"

    def probe_cells(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"query_id": [], "q_vec": [], "cell": []})
                continue
            mat = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["q_vec"]])
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(mat @ cents.T), axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy().repeat(nprobe),
                    "q_vec": list(pdf["q_vec"].repeat(nprobe)),
                    "cell": order.reshape(-1).astype("int32"),
                }
            )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).mapInPandas(probe_cells, q_schema)

    sim = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("v_vec")).alias("sim_raw"),
        )
        # a candidate can surface via several probed cells -> dedup
        .dropDuplicates(["query_id", "neighbor_id"])
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


@query("ann_ivf_kmeans_topk")  # codebook is learned -> not SQL-mirrorable; rows-only
def ann_ivf_kmeans_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load(spark, "embeddings", sf_dir)
    codebook = train_codebook(vecs, n_cells=8)
    queries = vecs.filter(F.col("vec_id") < 10)
    return ivf_topk_nprobe(vecs, queries, codebook, k=5, nprobe=2)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (cosine LSH). Complements IVF: no training pass, no
# centroid quality dependence; collision probability per hyperplane is
# 1 - angle/pi (Charikar's SimHash bound), banded so near neighbors collide
# in >=1 band with high probability. The data-side cost is one narrow
# Arrow-batched matmul (signatures) + an explode by n_bands; candidate
# generation is an equi-join on (band, band_hash) — the corpus never
# pairs up quadratically, and per-band bucket sizes (not corpus size) bound
# the rerank work. Tuning: fewer bits/band -> more candidates/recall,
# more bits/band -> fewer candidates/speed.
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_bits: int, seed: int = 7):
    """Deterministic Gaussian hyperplanes (seeded) — re-runs and retries
    produce identical signatures, a determinism requirement at scale."""
    import numpy as np

    return np.random.RandomState(seed).randn(n_bits, dim)


def _signature_bands(
    df: DataFrame,
    planes,
    n_bands: int,
    id_out: str,
    vec_out: str,
):
    """id, vec -> (id, vec, band, band_hash): sign-bit signature packed per
    band into an int64 key. One matmul per Arrow batch; rows fan out
    x n_bands (each row meets each of its bands exactly once)."""
    import numpy as np
    import pandas as pd

    p = np.asarray(planes, dtype=np.float64)
    n_bits = p.shape[0]
    assert n_bits % n_bands == 0, "n_bits must divide into n_bands"
    bits_per_band = n_bits // n_bands
    weights = 1 << np.arange(bits_per_band, dtype=np.int64)

    def sign_bands(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {id_out: pd.Series(dtype="int64"), vec_out: [],
                     "band": pd.Series(dtype="int32"),
                     "band_hash": pd.Series(dtype="int64")}
                )
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_out]])
            bits = (mat @ p.T > 0).astype(np.int64)          # (n, n_bits)
            hashes = bits.reshape(len(pdf), n_bands, bits_per_band) @ weights
            yield pd.DataFrame(
                {
                    id_out: pdf[id_out].to_numpy().repeat(n_bands),
                    vec_out: list(pdf[vec_out].repeat(n_bands)),
                    "band": np.tile(
                        np.arange(n_bands, dtype=np.int32), len(pdf)
                    ),
                    "band_hash": hashes.reshape(-1),
                }
            )

    schema = f"{id_out} bigint, {vec_out} array<float>, band int, band_hash bigint"
    return df.mapInPandas(sign_bands, schema)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 64,
    n_bands: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k via banded random-hyperplane LSH: candidates
    are vectors sharing >=1 band hash with the query, exact cosine reranks.
    Same output contract as brute_force_topk (recall < 1 by design)."""
    dim = vectors.select(F.size(vec_col)).first()[0]
    planes = hyperplanes(dim, n_bits, seed)

    v = _signature_bands(
        vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
        ),
        planes, n_bands, "neighbor_id", "v_vec",
    )
    q = _signature_bands(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ),
        planes, n_bands, "query_id", "q_vec",
    )
    sim = (
        v.join(F.broadcast(q), ["band", "band_hash"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair colliding in several bands must rerank once
        .dropDuplicates(["query_id", "neighbor_id"])
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


@query("ann_lsh_topk")  # seeded hyperplanes -> not SQL-mirrorable; rows-only
def ann_lsh_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = load(spark, "embeddings", sf_dir)
    return lsh_topk(vecs, vecs.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# int8 scalar quantization: the memory-bandwidth path. At 100 TB of
# embeddings the scan is bandwidth-bound; symmetric per-vector int8 cuts
# bytes moved 4x, candidate scoring runs on the quantized arrays, and the
# exact float cosine touches only the surviving candidates.
# ---------------------------------------------------------------------------


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization.

    scale = max|x| / 127; q_i = floor(x_i / scale + 0.5) in [-127, 127]
    (half-up toward +inf — the floor form is the same IEEE arithmetic in
    Spark and DuckDB, unlike round(), whose binary-midpoint behavior
    differs between engines; that determinism is what lets the quantized
    pipeline carry a full value-hash oracle). Cosine is scale-invariant,
    so quantized cosine needs no dequantization. Pure column expressions
    (transform/array_max) — codegen'd, no Python. The all-zero vector
    keeps scale 0 and quantizes to zeros.
    """
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale > 0, F.floor(x.cast("double") / scale + F.lit(0.5)))
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return df.withColumn(f"{out_prefix}_vec", q).withColumn(
        f"{out_prefix}_scale", scale
    )


def _int_cosine(a: Column, b: Column) -> Column:
    """Cosine over int arrays: exact bigint dot product, double norms."""
    d = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).cast("double")
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: (x * x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(-2.0))


def quantized_rerank_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    expand: int = 4,
) -> DataFrame:
    """Top-k by int8-quantized cosine, exact-reranked.

    Stage 1 scores every candidate with the integer cosine (the cheap,
    bandwidth-friendly pass) and keeps k*expand per query; stage 2 joins the
    float vectors back for ONLY those candidates and reranks with the exact
    cosine. Integer stage is bit-deterministic (bigint accumulation is
    associative), so candidate sets are stable across runs/partitionings.
    """
    qv = quantize_int8(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_full")),
        "q_full",
        "qq",
    )
    vv = quantize_int8(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_full")),
        "v_full",
        "qv",
    )
    coarse = (
        vv.select("neighbor_id", "qv_vec")
        .crossJoin(F.broadcast(qv.select("query_id", "qq_vec")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _int_cosine(F.col("qq_vec"), F.col("qv_vec")).alias("coarse_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("coarse_sim"), "neighbor_id")
    cands = (
        coarse.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= k * expand)
        .select("query_id", "neighbor_id")
    )
    exact = (
        cands.join(
            F.broadcast(qv.select("query_id", "q_full")), "query_id"
        )
        .join(vv.select("neighbor_id", "v_full"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_full"), F.col("v_full")).alias("sim_raw"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "ann_quantized_topk",
    # The int8 pipeline is EXACT arithmetic end-to-end (floor-based
    # half-up quantization, integer dot products — all values < 2^53 so
    # DuckDB's double list_dot_product over the quantized lists is exact
    # too), which makes the production path itself value-hash verifiable —
    # no md5 sibling needed (VERDICT r05 task #2).
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    qz AS (
        SELECT vec_id, emb,
               list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
        FROM v
    ),
    quant AS (
        SELECT vec_id, emb,
               list_transform(
                   emb,
                   x -> CASE WHEN scale > 0 THEN floor(x / scale + 0.5)
                             ELSE 0.0 END) AS q
        FROM qz
    ),
    qn AS (
        SELECT vec_id, emb, q, sqrt(list_dot_product(q, q)) AS qnrm
        FROM quant
    ),
    coarse AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               CASE WHEN a.qnrm > 0 AND b.qnrm > 0
                    THEN list_dot_product(a.q, b.q) / (a.qnrm * b.qnrm)
                    ELSE -2.0 END AS coarse_sim
        FROM qn a
        JOIN qn b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
    ),
    cands AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *,
                ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY coarse_sim DESC, neighbor_id
                ) AS crank
            FROM coarse
        ) WHERE crank <= 20
    ),
    exact AS (
        SELECT c.query_id, c.neighbor_id,
               list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))) AS sim_raw
        FROM cands c
        JOIN v a ON a.vec_id = c.query_id
        JOIN v b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS cosine_sim, rank
    FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id
            ) AS INTEGER) AS rank
        FROM exact
    )
    WHERE rank <= 5
    """,
)
def ann_quantized_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 fixed queries, int8-quantized candidate scoring, exact rerank —
    both the coarse integer pass and the float rerank are hash-verified
    against the SQL mirror (the quantization is deterministic arithmetic,
    so the candidate sets agree bit-for-bit across engines). Recall vs
    exact brute force is pinned in tests/test_similarity.py."""
    emb = load(spark, "embeddings", sf_dir)
    return quantized_rerank_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# PCA dimensionality reduction: train driver-side on a bounded deterministic
# sample (same economics as train_codebook — O(sample·d) driver pull no
# matter the corpus size), project distributed as one Arrow-batched matmul
# per batch. The projection is a narrow transformation: no shuffle, the
# (d × k) component matrix rides the task closure.
# ---------------------------------------------------------------------------


def train_pca(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 8,
    sample: int = 4096,
):
    """PCA basis from a deterministic bounded sample: mean vector and the
    top-k right singular vectors of the centered sample. Deterministic
    given the data: the sample is id-ordered, SVD sign is fixed by forcing
    each component's largest-|coordinate| entry positive."""
    import numpy as np

    rows = vectors.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    mean = x.mean(axis=0)
    _, _, vt = np.linalg.svd(x - mean, full_matrices=False)
    comps = vt[:n_components]
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def project_pca(
    df: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim PCA projection as array<double> — one matmul per
    Arrow batch, no Python per-row cost, no shuffle."""
    import numpy as np
    import pandas as pd

    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)  # (k, d)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema += f", {out_col} array<double>"

    def proj(batches):
        for pdf in batches:
            if len(pdf):
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                p = (mat - mu) @ w.T
                pdf = pdf.assign(**{out_col: list(p)})
            else:
                pdf = pdf.assign(**{out_col: pd.Series(dtype=object)})
            yield pdf

    return df.mapInPandas(proj, schema)


@query("ann_pca_projection")  # learned basis -> not SQL-mirrorable; rows-only
def ann_pca_projection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 principal components of every embedding, rounded for a stable
    rows-only check. Returned as four scalar DOUBLE columns (pca_0..pca_3),
    not an array, so downstream tabular tooling (and the driver's pandas
    canonicalization) can sort/hash the result. Variance capture and
    orthonormality are pinned in tests/test_similarity.py."""
    emb = load(spark, "embeddings", sf_dir)
    mean, comps = train_pca(emb, n_components=4)
    out = project_pca(emb.select("vec_id", "embedding"), mean, comps)
    return out.select(
        "vec_id",
        *[F.round(F.col("pca")[i], 4).alias(f"pca_{i}") for i in range(4)],
    ).orderBy("vec_id")


def knn_join(
    vectors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Blocked k-NN self-join: every vector's exact top-k neighbors WITHIN
    its block — the SemDeDup shape (cluster the corpus, then
    neighbor-search inside each cluster), where the block column is the
    cluster assignment. Unlike ``brute_force_topk`` (a broadcast of a
    small query set against everything) this is the all-rows-are-queries
    variant: a self-equi-join on the block key, so the pair space is
    sum(block²), never n², and the join co-partitions both sides on the
    block — the embedding column shuffles once.

    The cosine stays a JVM fold (``cosine``): Spark's `aggregate` and the
    oracle's `list_dot_product` both reduce sequentially, so the raw
    doubles — and therefore the RANK ORDER — are bit-identical across
    engines (a numpy Gram matrix would sum in SIMD order and disagree in
    the last ulp). Ties broken by neighbor id for a total order.
    """
    # Precompute each vector's norm ONCE (n norm folds instead of 2·pairs):
    # sim = dot(q,v) / (q_norm · v_norm) is the exact same arithmetic as
    # cosine() per pair — same values, same multiply — so the SQL mirror
    # (which factors norms identically) still hashes bit-for-bit.
    a = _spread(vectors).select(
        F.col(id_col).alias("query_id"),
        F.col(block_col).alias("block"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", l2_norm(F.col("q_vec")))
    b = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(block_col).alias("block"),
        F.col(vec_col).cast("array<double>").alias("v_vec"),
    ).withColumn("v_norm", l2_norm(F.col("v_vec")))
    sims = (
        a.join(b, "block")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "block",
            (
                dot(F.col("q_vec"), F.col("v_vec"))
                / (F.col("q_norm") * F.col("v_norm"))
            ).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "block",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "ann_knn_join",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    sim AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               a.label AS block,
               list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))) AS sim_raw
        FROM v a
        JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, block, round(sim_raw, 4) AS cosine_sim, rank
    FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id
            ) AS INTEGER) AS rank
        FROM sim
    )
    WHERE rank <= 3
    """,
)
def ann_knn_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact within-label top-3 neighbor list for every embedding — the
    per-cluster neighbor table SemDeDup prunes from."""
    emb = load(spark, "embeddings", sf_dir)
    return knn_join(emb, k=3)


def semantic_dedup_decisions(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """SemDeDup pruning decisions (Abbas et al. 2023 shape): within each
    block (cluster), DROP a vector iff some EARLIER vector (smaller id =
    keep-first, retry-deterministic) is more similar than ``threshold``.
    Returns one decision row per vector with the similarity that killed it.

    The drop decision is made on the 4-dp-ROUNDED max similarity — the
    same boundary contract as ``cosine_range_search`` — so membership at
    the threshold is engine- and rerun-exact. MAX over raw pair cosines is
    order-independent, and each pair cosine is a sequential JVM fold, so
    the rounded value is bit-identical to the SQL mirror.

    Scale shape: one block-keyed self-join (pair space = sum(block²) —
    the clustering bounds it) + one hash-agg + one left join back. The
    embedding column never leaves its block partition."""
    # Per-vector norms precomputed before the join (see knn_join) — the
    # factored arithmetic is identical, so the oracle hash is unchanged.
    a = vectors.select(
        F.col(id_col).alias("qid"),
        F.col(block_col).alias("block"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("q_norm", l2_norm(F.col("q_vec")))
    b = vectors.select(
        F.col(id_col).alias("nid"),
        F.col(block_col).alias("block"),
        F.col(vec_col).cast("array<double>").alias("v_vec"),
    ).withColumn("v_norm", l2_norm(F.col("v_vec")))
    max_prior = (
        a.join(b, "block")
        .filter(F.col("nid") < F.col("qid"))
        .groupBy(F.col("qid").alias(id_col))
        .agg(
            F.max(
                dot(F.col("q_vec"), F.col("v_vec"))
                / (F.col("q_norm") * F.col("v_norm"))
            ).alias("ms")
        )
    )
    return (
        vectors.select(id_col, F.col(block_col).alias("block"))
        .join(max_prior, id_col, "left")
        .select(
            id_col,
            "block",
            F.round("ms", 4).alias("max_prior_sim"),
            F.coalesce(
                F.round("ms", 4) >= F.lit(threshold), F.lit(False)
            ).alias("dropped"),
        )
        .orderBy(id_col)
    )


@query(
    "ann_semantic_dedup",
    # threshold 0.35 is tuned to the SYNTHETIC embeddings (random vectors:
    # within-label max prior similarity tops out at ~0.475, so a realistic
    # 0.9x near-dup threshold would never fire here) — chosen to exercise
    # both the keep and drop branches under the driver gate.
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    m AS (
        SELECT a.vec_id,
               MAX(list_dot_product(a.emb, b.emb)
                   / (sqrt(list_dot_product(a.emb, a.emb))
                      * sqrt(list_dot_product(b.emb, b.emb)))) AS ms
        FROM v a
        JOIN v b ON a.label = b.label AND b.vec_id < a.vec_id
        GROUP BY 1
    )
    SELECT v.vec_id, v.label AS block,
           round(m.ms, 4) AS max_prior_sim,
           COALESCE(round(m.ms, 4) >= 0.35, FALSE) AS dropped
    FROM v LEFT JOIN m ON v.vec_id = m.vec_id
    ORDER BY v.vec_id
    """,
)
def ann_semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, "embeddings", sf_dir)
    return semantic_dedup_decisions(emb, threshold=0.35)


def _md5_plane_weights(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Hyperplane weights derived from md5 — computable identically in
    Python (here, embedded as plan literals), in DuckDB SQL, and by any
    re-run: w[p][d] = (int(md5('hp:p:d')[:8], 16) % 2001 - 1000) / 1000."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"hp:{p}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_topk_md5(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH top-k with an md5-derived plane family — the
    SQL-mirrorable sibling of the seeded-numpy ``ann_lsh_topk`` (same
    bucket → candidate-join → exact-cosine-rerank shape; see
    ``minhash_lsh_pairs_md5`` for why the md5 family exists). The sign
    pattern over ``n_planes`` hyperplanes is the bucket; only same-bucket
    candidates are reranked, so recall is the standard SRP-LSH tradeoff
    while the verification cost is bucket-local."""
    planes = _md5_plane_weights(n_planes, dim)
    emb = F.col(vec_col).cast("array<double>")

    def bucket_expr() -> Column:
        acc = F.lit(0).cast("bigint")
        for p, w in enumerate(planes):
            side = dot(emb, F.array(*[F.lit(x) for x in w])) > 0
            acc = acc + F.when(side, F.lit(1 << p)).otherwise(F.lit(0)).cast("bigint")
        return acc

    sig = lambda df, idn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        emb.alias(f"{idn}_vec"),
        bucket_expr().alias(f"{idn}_bucket"),
    ).withColumn(f"{idn}_norm", l2_norm(F.col(f"{idn}_vec")))

    q = sig(queries, "query_id")
    v = sig(vectors, "neighbor_id")
    sims = (
        v.join(
            F.broadcast(q),
            (F.col("query_id_bucket") == F.col("neighbor_id_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("query_id_vec"), F.col("neighbor_id_vec"))
                / (F.col("query_id_norm") * F.col("neighbor_id_norm"))
            ).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "ann_lsh_verified",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    planes AS (
        SELECT p,
               list_transform(range(1, 65), d ->
                   (CAST(concat('0x', substr(md5(
                        'hp:' || CAST(p AS VARCHAR) || ':'
                               || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range(8)) AS t(p)
    ),
    sigs AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(v.emb, planes.w) > 0
                        THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
        FROM v, planes
        GROUP BY vec_id
    ),
    sv AS (
        SELECT s.vec_id, s.bucket, v.emb,
               sqrt(list_dot_product(v.emb, v.emb)) AS nrm
        FROM sigs s JOIN v ON s.vec_id = v.vec_id
    ),
    sim AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim_raw
        FROM sv q
        JOIN sv c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS cosine_sim, rank
    FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id
            ) AS INTEGER) AS rank
        FROM sim
    )
    WHERE rank <= 3
    """,
)
def ann_lsh_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH top-3 under a VALUE-HASH contract: bucket assignment,
    candidate generation, and the exact-cosine rerank all mirror in SQL
    via md5-derived hyperplanes. `ann_lsh_topk` (seeded numpy planes,
    Arrow-batched) stays the throughput path."""
    emb = load(spark, "embeddings", sf_dir)
    return lsh_topk_md5(emb, emb.filter(F.col("vec_id") < 10), k=3)


# ---------------------------------------------------------------------------
# md5-verified siblings for the two LEARNED kernels (VERDICT r05 task #2).
# The production paths (ann_ivf_kmeans_topk: driver-trained spherical
# k-means; ann_pca_projection: SVD basis from a sample) are intrinsically
# rows-only — a learned codebook has no SQL mirror. These siblings swap the
# learned parameters for md5-derived constants computable identically in
# both engines, so the ALGORITHM (cell assignment, multi-cell probing,
# candidate equi-join, rerank; center-subtract + projection) is value-hash
# verified even though the trained parameters are not.
# ---------------------------------------------------------------------------


def _md5_const_vector(tag: str, dim: int = 64) -> list[float]:
    """v[d] = (int(md5('{tag}:d')[:8], 16) % 2001 - 1000) / 1000 — the same
    construction as `_md5_plane_weights`, shared by the IVF centroids, the
    projection mean, and the projection basis."""
    import hashlib

    return [
        (int(hashlib.md5(f"{tag}:{d}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
        / 1000.0
        for d in range(dim)
    ]


def ivf_topk_md5(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 4,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with fixed md5-derived centroids — the SQL-mirrorable
    sibling of `ivf_topk_nprobe` (same assign → probe-nprobe-cells →
    equi-join-on-cell → exact-rerank shape). Cell assignment is
    argmax-dot against the centroid table (row_number over the tiny
    vec×cell cross product, lowest cell id on ties); a query fans out to
    its nprobe best cells, candidates come from the cell equi-join, and a
    candidate meets a query at most once (each candidate lives in exactly
    one cell), so no dedup is needed before the rerank."""
    spark = vectors.sparkSession
    cents = F.broadcast(
        spark.createDataFrame(
            [(c, _md5_const_vector(f"iv:{c}", dim)) for c in range(n_cells)],
            "c int, w array<double>",
        )
    )

    def cells(df: DataFrame, idn: str, rn_max: int) -> DataFrame:
        emb = F.col(vec_col).cast("array<double>")
        dp = df.select(
            F.col(id_col).alias(idn), emb.alias(f"{idn}_vec")
        ).crossJoin(cents).select(
            idn,
            f"{idn}_vec",
            F.col("c").alias("cell"),
            dot(F.col(f"{idn}_vec"), F.col("w")).alias("dp"),
        )
        w = Window.partitionBy(idn).orderBy(F.desc("dp"), "cell")
        return (
            dp.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= rn_max)
            .withColumn(f"{idn}_norm", l2_norm(F.col(f"{idn}_vec")))
            .select(idn, f"{idn}_vec", f"{idn}_norm", "cell")
        )

    v = cells(vectors, "neighbor_id", 1)
    q = cells(queries, "query_id", nprobe)
    sims = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("query_id_vec"), F.col("neighbor_id_vec"))
                / (F.col("query_id_norm") * F.col("neighbor_id_norm"))
            ).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


@query(
    "ann_ivf_kmeans_verified",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    cents AS (
        SELECT c,
               list_transform(range(1, 65), d ->
                   (CAST(concat('0x', substr(md5(
                        'iv:' || CAST(c AS VARCHAR) || ':'
                               || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range(4)) AS t(c)
    ),
    ranked AS (
        SELECT v.vec_id, cents.c AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.emb, cents.w) DESC, cents.c
               ) AS rn
        FROM v, cents
    ),
    vc AS (
        SELECT r.vec_id, r.cell, v.emb,
               sqrt(list_dot_product(v.emb, v.emb)) AS nrm
        FROM ranked r JOIN v ON v.vec_id = r.vec_id
        WHERE r.rn = 1
    ),
    qc AS (
        SELECT r.vec_id, r.cell, v.emb,
               sqrt(list_dot_product(v.emb, v.emb)) AS nrm
        FROM ranked r JOIN v ON v.vec_id = r.vec_id
        WHERE r.rn <= 2 AND r.vec_id < 10
    ),
    sim AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim_raw
        FROM qc q
        JOIN vc c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS cosine_sim, rank
    FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id
            ) AS INTEGER) AS rank
        FROM sim
    )
    WHERE rank <= 3
    """,
)
def ann_ivf_kmeans_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-with-codebook search under a VALUE-HASH contract: fixed md5
    centroids make assignment + nprobe=2 probing + rerank exact SQL.
    `ann_ivf_kmeans_topk` (trained spherical k-means, Arrow-batched
    assignment) stays the quality/throughput path."""
    emb = load(spark, "embeddings", sf_dir)
    return ivf_topk_md5(emb, emb.filter(F.col("vec_id") < 10), k=3)


def project_md5(
    vectors: DataFrame,
    n_components: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Center-subtract + linear projection with an md5-derived mean and
    basis — the SQL-mirrorable sibling of `project_pca`. Same contract
    (k scalar output columns per vector, a narrow no-shuffle map), with
    the dot products as sequential JVM folds so the doubles match
    DuckDB's list_dot_product bit-for-bit; `project_pca` (trained SVD
    basis, Arrow matmul) stays the production path. Rounding is
    floor-based half-up (functions.numeric) — projections can be
    negative, and the floor form is the engine-stable one."""
    from data_engineering_nd_spark.functions.numeric import round_half_up

    mu = F.array(*[F.lit(x) for x in _md5_const_vector("mu", dim)])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mu, lambda x, y: x - y
    )
    out = vectors.select(
        F.col(id_col), centered.alias("_centered")
    )
    comps = [
        round_half_up(
            dot(
                F.col("_centered"),
                F.array(*[F.lit(x) for x in _md5_const_vector(f"pc:{p}", dim)]),
            ),
            4,
        ).alias(f"pc_{p}")
        for p in range(n_components)
    ]
    return out.select(id_col, *comps)


@query(
    "ann_pca_verified",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    mu AS (
        SELECT list_transform(range(1, 65), d ->
            (CAST(concat('0x', substr(md5('mu:' || CAST(d - 1 AS VARCHAR)),
                                      1, 8))
                  AS BIGINT) % 2001 - 1000) / 1000.0) AS m
    ),
    basis AS (
        SELECT p,
               list_transform(range(1, 65), d ->
                   (CAST(concat('0x', substr(md5(
                        'pc:' || CAST(p AS VARCHAR) || ':'
                               || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range(4)) AS t(p)
    ),
    proj AS (
        SELECT v.vec_id, b.p,
               list_dot_product(
                   list_transform(range(1, 65), i -> v.emb[i] - mu.m[i]),
                   b.w) AS pr
        FROM v, mu, basis b
    )
    SELECT vec_id,
           floor(max(CASE WHEN p = 0 THEN pr END) * 10000.0 + 0.5) / 10000.0
               AS pc_0,
           floor(max(CASE WHEN p = 1 THEN pr END) * 10000.0 + 0.5) / 10000.0
               AS pc_1,
           floor(max(CASE WHEN p = 2 THEN pr END) * 10000.0 + 0.5) / 10000.0
               AS pc_2,
           floor(max(CASE WHEN p = 3 THEN pr END) * 10000.0 + 0.5) / 10000.0
               AS pc_3
    FROM proj
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def ann_pca_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dimensionality-reduction pipeline (center-subtract + 4-component
    linear projection) under a VALUE-HASH contract via a fixed md5 mean
    and basis. `ann_pca_projection` (trained PCA) stays rows-only — a
    learned SVD basis has no SQL mirror — but the projection machinery it
    shares with this query is now verified. No orderBy: the driver's
    compare is order-insensitive, and a full-corpus global sort is a
    range exchange this narrow map plan doesn't need."""
    emb = load(spark, "embeddings", sf_dir)
    return project_md5(emb.select("vec_id", "embedding"))


def ann_recall_report(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """One-row recall@k report for the md5-SRP-LSH index against exact
    brute-force cosine on the same query set — the tuning loop for
    (n_planes, bucket width): collision probability per plane is
    1 - angle/pi, this measures what that means on the actual corpus.
    A true top-k neighbor counts as hit when the LSH path returns the
    same (query, neighbor) pair at any rank. Exact e4 integer recall,
    so the report value-hashes cross-engine."""
    truth = brute_force_topk(vectors, queries, k=k).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_topk_md5(
        vectors, queries, k=k, n_planes=n_planes, dim=dim
    ).select("query_id", "neighbor_id")
    joined = truth.withColumn("_t", F.lit(1)).join(
        approx.withColumn("_a", F.lit(1)), ["query_id", "neighbor_id"], "full_outer"
    )
    return joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.when(F.col("_t").isNotNull(), 1)).alias("n_true_pairs"),
        F.count(F.when(F.col("_a").isNotNull(), 1)).alias("n_lsh_pairs"),
        F.count(F.when(F.col("_t").isNotNull() & F.col("_a").isNotNull(), 1)).alias(
            "n_hits"
        ),
    ).select(
        F.lit(k).cast("int").alias("k"),
        "n_queries",
        "n_true_pairs",
        "n_lsh_pairs",
        "n_hits",
        F.when(
            F.col("n_true_pairs") > 0, F.expr("n_hits * 10000 div n_true_pairs")
        )
        .cast("bigint")
        .alias("recall_e4"),
    )


@query(
    "ann_recall_report",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < 10),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY list_dot_product(q.emb, v.emb)
                        / (sqrt(list_dot_product(q.emb, q.emb))
                           * sqrt(list_dot_product(v.emb, v.emb))) DESC,
                        v.vec_id
                ) AS rnk
            FROM q JOIN v ON q.vec_id <> v.vec_id
        ) WHERE rnk <= 3
    ),
    planes AS (
        SELECT p,
               list_transform(range(1, 65), d ->
                   (CAST(concat('0x', substr(md5(
                        'hp:' || CAST(p AS VARCHAR) || ':'
                               || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range(8)) AS t(p)
    ),
    sigs AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(v.emb, planes.w) > 0
                        THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
        FROM v, planes
        GROUP BY vec_id
    ),
    sv AS (
        SELECT s.vec_id, s.bucket, v.emb,
               sqrt(list_dot_product(v.emb, v.emb)) AS nrm
        FROM sigs s JOIN v ON s.vec_id = v.vec_id
    ),
    approx AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
                ROW_NUMBER() OVER (
                    PARTITION BY qq.vec_id
                    ORDER BY list_dot_product(qq.emb, c.emb)
                                 / (qq.nrm * c.nrm) DESC, c.vec_id
                ) AS rnk
            FROM sv qq
            JOIN sv c ON qq.bucket = c.bucket AND qq.vec_id <> c.vec_id
            WHERE qq.vec_id < 10
        ) WHERE rnk <= 3
    )
    SELECT CAST(3 AS INT) AS k,
           (SELECT COUNT(DISTINCT query_id)
            FROM (SELECT query_id FROM truth
                  UNION SELECT query_id FROM approx)) AS n_queries,
           (SELECT COUNT(*) FROM truth) AS n_true_pairs,
           (SELECT COUNT(*) FROM approx) AS n_lsh_pairs,
           (SELECT COUNT(*) FROM truth t
            WHERE EXISTS (SELECT 1 FROM approx a
                          WHERE a.query_id = t.query_id
                            AND a.neighbor_id = t.neighbor_id)) AS n_hits,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0 THEN
               (SELECT COUNT(*) FROM truth t
                WHERE EXISTS (SELECT 1 FROM approx a
                              WHERE a.query_id = t.query_id
                                AND a.neighbor_id = t.neighbor_id))
                   * 10000 // (SELECT COUNT(*) FROM truth)
           END AS recall_e4
    """,
)
def ann_recall_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the md5-SRP-LSH index vs exact brute force over the 10
    fixed queries — the similarity-family sibling of dedup_lsh_recall,
    value-hashed cross-engine."""
    emb = load(spark, "embeddings", sf_dir)
    return ann_recall_report(emb, emb.filter(F.col("vec_id") < 10), k=3)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of a semantic (embedding cosine)
# and a lexical (token Jaccard) retriever — the standard two-tower fusion a
# RAG/retrieval pipeline runs when neither signal alone suffices.
# ---------------------------------------------------------------------------


def hybrid_rrf(
    sem_ranks: DataFrame,
    lex_ranks: DataFrame,
    rrf_k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): rrf(d) = sum over
    systems of 1/(rrf_k + rank_d). Inputs are (doc_id, rank_*) frames,
    each already truncated to its system's top-K; a doc missing from one
    system contributes 0 from it (COALESCE). Scores are sums of exact
    reciprocals — deterministic IEEE both engines — and the fused order
    breaks ties by doc_id. Scale shape: the inputs are top-K-sized, so
    the fusion is a full-outer join of two tiny frames."""
    fused = sem_ranks.join(lex_ranks, "doc_id", "full_outer").select(
        "doc_id",
        "rank_sem",
        "rank_lex",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_sem")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_lex")), F.lit(0.0)
            )
        ).alias("raw"),
    )
    w = Window.orderBy(F.desc("raw"), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= top)
        .select(
            "doc_id",
            "rank_sem",
            "rank_lex",
            F.round("raw", 6).alias("rrf_score"),
            "fused_rank",
        )
    )


@query(
    "ann_hybrid_rrf",
    oracle=r"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    q AS (SELECT emb AS q_emb FROM v WHERE vec_id = 7),
    sem AS (
        SELECT doc_id, CAST(rn AS INT) AS rank_sem FROM (
            SELECT v.vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY list_dot_product(q.q_emb, v.emb)
                                / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                                   * sqrt(list_dot_product(v.emb, v.emb)))
                                DESC, v.vec_id) AS rn
            FROM v, q WHERE v.vec_id <> 7
        ) WHERE rn <= 20
    ),
    toks AS (
        SELECT doc_id,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS t
        FROM documents
        WHERE trim(text) <> ''
    ),
    qt AS (SELECT t AS q_t FROM toks WHERE doc_id = 7),
    lex AS (
        SELECT doc_id, CAST(rn AS INT) AS rank_lex FROM (
            SELECT toks.doc_id,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST(len(list_intersect(toks.t, qt.q_t)) AS DOUBLE)
                                / CAST(len(toks.t) + len(qt.q_t)
                                       - len(list_intersect(toks.t, qt.q_t))
                                  AS DOUBLE) DESC, toks.doc_id) AS rn
            FROM toks, qt WHERE toks.doc_id <> 7
        ) WHERE rn <= 20
    ),
    fused AS (
        SELECT COALESCE(sem.doc_id, lex.doc_id) AS doc_id,
               sem.rank_sem, lex.rank_lex,
               COALESCE(1.0 / (60 + sem.rank_sem), 0.0)
               + COALESCE(1.0 / (60 + lex.rank_lex), 0.0) AS raw
        FROM sem FULL OUTER JOIN lex ON sem.doc_id = lex.doc_id
    )
    SELECT doc_id, rank_sem, rank_lex, round(raw, 6) AS rrf_score,
           CAST(fr AS INT) AS fused_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY raw DESC, doc_id) AS fr
        FROM fused
    ) WHERE fr <= 10
    """,
)
def ann_hybrid_rrf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for query doc 7: exact-cosine top-20 over the
    embeddings (semantic tower) fused with token-Jaccard top-20 over the
    text (lexical tower) via reciprocal-rank fusion, final top-10. Both
    towers, the fusion arithmetic, and the fused ordering are value-
    hashed — cosine via the sequential-fold dot product that matches
    list_dot_product bit-for-bit, Jaccard as a ratio of exact integers,
    RRF as a sum of two exact reciprocals."""
    from data_engineering_nd_spark.functions.text import tokens as _tokens

    emb = load(spark, "embeddings", sf_dir)
    sem = brute_force_topk(emb, emb.filter(F.col("vec_id") == 7), k=20).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_sem")
    )

    docs = load(spark, "documents", sf_dir).filter(F.trim("text") != "")
    toks = docs.select(
        "doc_id", F.array_distinct(_tokens("text")).alias("t")
    )
    qt = toks.filter(F.col("doc_id") == 7).select(F.col("t").alias("q_t"))
    inter = F.size(F.array_intersect("t", "q_t"))
    union = F.size("t") + F.size("q_t") - inter
    jac = inter.cast("double") / union.cast("double")
    # top-20 via orderBy+limit (TakeOrderedAndProject: per-partition heap,
    # driver merge) and only THEN a rank window — the window's single
    # partition holds 20 rows, never the corpus (the ds_training_order
    # pattern; a bare global row_number window would funnel every
    # candidate through one reducer)
    w = Window.orderBy(F.desc("jac"), "doc_id")
    lex = (
        toks.filter(F.col("doc_id") != 7)
        .crossJoin(F.broadcast(qt))
        .select("doc_id", jac.alias("jac"))
        .orderBy(F.desc("jac"), "doc_id")
        .limit(20)
        .withColumn("rank_lex", F.row_number().over(w).cast("int"))
        .select("doc_id", "rank_lex")
    )
    return hybrid_rrf(sem, lex, rrf_k=60, top=10)


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): the memory-bound ANN index.
# Each vector compresses to m sub-codes (here 4x4 bits); queries score
# candidates with an Asymmetric Distance Computation lookup table — m
# table lookups + m adds per candidate instead of a d-dim dot product.
# Completes the quantization family next to int8 SQ (ann_quantized_topk).
# Like IVF/PCA, the LEARNED codebook has no SQL mirror, so the verified
# variant fixes md5-derived codewords: encoding, LUT build, ADC
# accumulation, and ranking are all value-hashed.
# ---------------------------------------------------------------------------

_PQ_M = 4          # subspaces
_PQ_K = 16         # codewords per subspace (4-bit codes)
_PQ_SUB = 16       # dims per subspace (4 x 16 = the 64-dim embeddings)


def _pq_codebook(spark: SparkSession):
    rows = [
        (s, c, _md5_const_vector(f"pq:{s}:{c}", _PQ_SUB))
        for s in range(_PQ_M)
        for c in range(_PQ_K)
    ]
    return F.broadcast(
        spark.createDataFrame(rows, "s int, c int, w array<double>")
    )


def _sub_d2(sub: Column, w: Column) -> Column:
    """Squared L2 distance of two subvectors as the SAME sequential fold
    both engines run: diff elementwise, then dot(diff, diff)."""
    diff = F.zip_with(sub, w, lambda x, y: x - y)
    return dot(diff, diff)


def _pq_subspaces(df: DataFrame, id_col: str, idn: str) -> DataFrame:
    emb = F.col("embedding").cast("array<double>")
    return df.select(
        F.col(id_col).alias(idn),
        F.posexplode(
            F.array(*[F.slice(emb, s * _PQ_SUB + 1, _PQ_SUB) for s in range(_PQ_M)])
        ).alias("s", "sub"),
    )


def pq_codes_md5(vectors: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, s, c): each vector's nearest codeword per subspace (argmin
    squared L2, lowest c on ties). One explode(x m) + a broadcast join
    against the m*k-row codebook + a per-(id, s) argmin window — encoding
    is a narrow scan-side pass, the index stores m 4-bit codes per vector
    (32x compression on the 64-dim float corpus)."""
    cb = _pq_codebook(vectors.sparkSession)
    subs = _pq_subspaces(vectors, id_col, "neighbor_id")
    scored = subs.join(cb, "s").select(
        "neighbor_id", "s", "c", _sub_d2(F.col("sub"), F.col("w")).alias("d2")
    )
    w = Window.partitionBy("neighbor_id", "s").orderBy("d2", "c")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "s", "c")
    )


def pq_adc_topk_md5(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ search with ADC: per query, a (m x k) lookup table of exact
    subspace distances to every codeword; a candidate's approximate
    distance is the sum of its m table entries. LUT entries are
    floor-half-up e6-scaled BIGINTs, so the m-way accumulation is an
    EXACT integer sum (aggregation order cannot perturb it) — the same
    determinism trick as the BM25 scorer. Returns per-query top-k by
    (approx distance, neighbor_id).

    Scale: candidates are scored from CODES ONLY (the float corpus is
    never read at query time); the LUT is |queries| x m x k rows,
    broadcast. This is the shape that serves billion-vector recall on a
    RAM budget; rerank survivors against the float vectors if exactness
    matters (cf. ann_quantized_topk's rerank stage)."""
    codes = pq_codes_md5(vectors, id_col)
    cb = _pq_codebook(vectors.sparkSession)
    q_subs = _pq_subspaces(queries, id_col, "query_id")
    lut = q_subs.join(cb, "s").select(
        "query_id",
        "s",
        "c",
        F.floor(_sub_d2(F.col("sub"), F.col("w")) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("lut_e6"),
    )
    approx = (
        codes.join(F.broadcast(lut), ["s", "c"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("lut_e6").cast("bigint").alias("e6"))
    )
    w = Window.partitionBy("query_id").orderBy("e6", "neighbor_id")
    return (
        approx.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("e6").cast("double") / F.lit(1e6)).alias("approx_d2"),
            "rank",
        )
    )


def _pq_oracle() -> str:
    sub = _PQ_SUB
    return f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    cb AS (
        SELECT s, c,
               list_transform(range(1, {sub + 1}), d ->
                   (CAST(concat('0x', substr(md5(
                        'pq:' || CAST(s AS VARCHAR) || ':' || CAST(c AS VARCHAR)
                              || ':' || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range({_PQ_M})) AS ts(s), unnest(range({_PQ_K})) AS tc(c)
    ),
    subs AS (
        SELECT vec_id, s, emb[s * {sub} + 1 : s * {sub} + {sub}] AS sub
        FROM v, unnest(range({_PQ_M})) AS t(s)
    ),
    scored AS (
        SELECT subs.vec_id, subs.s, cb.c,
               list_dot_product(
                   list_transform(range(1, {sub + 1}), i -> sub[i] - w[i]),
                   list_transform(range(1, {sub + 1}), i -> sub[i] - w[i])
               ) AS d2
        FROM subs JOIN cb USING (s)
    ),
    codes AS (
        SELECT vec_id AS neighbor_id, s, c FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id, s ORDER BY d2, c) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT vec_id AS query_id, s, c,
               CAST(floor(d2 * 1000000.0 + 0.5) AS BIGINT) AS lut_e6
        FROM scored WHERE vec_id < 10
    ),
    approx AS (
        SELECT lut.query_id, codes.neighbor_id,
               CAST(SUM(lut_e6) AS BIGINT) AS e6
        FROM codes JOIN lut USING (s, c)
        WHERE lut.query_id <> codes.neighbor_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           CAST(e6 AS DOUBLE) / 1000000.0 AS approx_d2,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY e6, neighbor_id) AS rn
        FROM approx
    ) WHERE rn <= 5
    """


@query("ann_pq_verified", oracle=_pq_oracle())
def ann_pq_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC search under the value-hash contract: md5 codebook, 4x16
    sub-codes, e6-integer ADC accumulation, per-query top-5 for the 10
    fixed queries. A production deployment trains the codebook with
    k-means per subspace (same pipeline as `train_codebook`) and keeps
    this exact encode/LUT/ADC dataflow."""
    emb = load(spark, "embeddings", sf_dir)
    return pq_adc_topk_md5(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# Incremental ANN: serve new query batches against a PERSISTED IVF index
# (VERDICT r07 task #3 — the vector-side mirror of dedup_incremental).
# ---------------------------------------------------------------------------


def md5_cell_assignments(
    df: DataFrame,
    rn_max: int,
    n_cells: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) rows: each vector's ``rn_max`` best cells by argmax-dot
    against the fixed md5 centroid table (same family as
    :func:`ivf_topk_md5`; ties break on lowest cell id). rn_max=1 is the
    index-build assignment, rn_max=nprobe the query fan-out."""
    cents = _ivf_centroids(df.sparkSession, n_cells, dim)
    dp = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
        .crossJoin(cents)
        .select(
            id_col,
            "cell",
            dot(F.col("__v"), F.col("cw")).alias("dp"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("dp"), "cell")
    return (
        dp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= rn_max)
        .select(id_col, "cell")
    )


def ivf_candidates_against_index(
    index: DataFrame, query_cells: DataFrame
) -> DataFrame:
    """(query_id, neighbor_id) candidates of a query batch: equi-join the
    queries' probed cells against the PERSISTED (vec_id, cell) index. The
    index side is WHATEVER FRAME IS PASSED — for the incremental contract
    that is a parquet scan of the persisted index with zero assignment
    recomputation above it (plan-pinned in tests/test_similarity.py; the
    shape mirrors dedup's ``candidate_pairs_against_index``). Each corpus
    vector lives in exactly one cell and a query probes distinct cells,
    so a pair appears at most once — no dedup needed."""
    i = index.select(F.col("vec_id").alias("neighbor_id"), "cell")
    q = query_cells.select(F.col("vec_id").alias("query_id"), "cell")
    return i.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id")


def incremental_ivf_topk(
    corpus: DataFrame,
    batch: DataFrame,
    index_root: str,
    serve_ids: DataFrame | None = None,
    lookup: DataFrame | None = None,
    k: int = 3,
    n_cells: int = 4,
    nprobe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """ANN search for a NEW vector batch through a persisted IVF index,
    then merge the batch in — the daily shape of a growing embedding
    store at 100 TB:

    1. bootstrap: if the ``VersionedTable`` at ``index_root`` is empty,
       assign the corpus to cells ONCE (the only full-corpus pass ever)
       and commit the (vec_id, cell) rows;
    2. assign the batch queries to their nprobe best cells — work
       proportional to the BATCH, not the corpus;
    3. candidates = query cells ⋈ index SCAN; corpus embeddings are read
       only for candidate ids (semi-join pushdown at the rerank) — never
       re-assigned, never re-scanned wholesale;
    4. exact cosine rerank → top-k per query;
    5. merge: append the batch's own cell assignments to the index (one
       commit), so tomorrow's batch probes corpus+today.

    ``serve_ids`` optionally restricts which batch vectors are SERVED
    (ranked) while the whole batch still merges into the index.
    ``lookup`` is the embedding source for the rerank's neighbor-id
    lookups and must cover EVERY id the index may return (defaults to
    ``corpus`` — right on bootstrap day; after merges, pass the full
    vector store, or day-1 neighbors silently drop out of day-2 reranks).
    Caller contract: corpus and batch ids are disjoint."""
    from data_engineering_nd_spark.tables import VersionedTable

    spark = batch.sparkSession
    table = VersionedTable(spark, index_root)
    if table.latest_version() is None:
        table.commit(md5_cell_assignments(corpus, 1, n_cells, dim))
    idx = table.snapshot()

    served = batch
    if serve_ids is not None:
        served = batch.join(F.broadcast(serve_ids), "vec_id", "left_semi")
    q_cells = md5_cell_assignments(served, nprobe, n_cells, dim)
    # candidate ids are output-sized; materializing them severs the plan
    # from the index files so callers may retire old index versions
    cand = ivf_candidates_against_index(idx, q_cells).localCheckpoint()

    # merge the full batch in BEFORE serving completes — the commit is
    # append-only and the served candidates came from the pre-merge
    # snapshot, so results are unaffected
    table.commit(md5_cell_assignments(batch, 1, n_cells, dim), mode="append")

    def emb_side(src: DataFrame, idn: str) -> DataFrame:
        e = F.col("embedding").cast("array<double>")
        return src.select(
            F.col("vec_id").alias(idn),
            e.alias(f"{idn}_vec"),
            l2_norm(e).alias(f"{idn}_norm"),
        )

    # rerank reads embeddings ONLY for ids present in cand (the join
    # prunes; broadcast at real scale) — a lookup, not a recompute
    sims = (
        cand.join(
            emb_side(lookup if lookup is not None else corpus, "neighbor_id"),
            "neighbor_id",
        )
        .join(F.broadcast(emb_side(served, "query_id")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("query_id_vec"), F.col("neighbor_id_vec"))
                / (F.col("query_id_norm") * F.col("neighbor_id_norm"))
            ).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_raw"), "neighbor_id")
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim_raw", 4).alias("cosine_sim"),
            "rank",
        )
    )


_ANN_INCREMENTAL_ORACLE = """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    ),
    cents AS (
        SELECT c,
               list_transform(range(1, 65), d ->
                   (CAST(concat('0x', substr(md5(
                        'iv:' || CAST(c AS VARCHAR) || ':'
                               || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range(4)) AS t(c)
    ),
    ranked AS (
        SELECT v.vec_id, cents.c AS cell,
               ROW_NUMBER() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.emb, cents.w) DESC, cents.c
               ) AS rn
        FROM v, cents
    ),
    vc AS (
        SELECT r.vec_id, r.cell, v.emb,
               sqrt(list_dot_product(v.emb, v.emb)) AS nrm
        FROM ranked r JOIN v ON v.vec_id = r.vec_id
        WHERE r.rn = 1 AND r.vec_id % 7 <> 0
    ),
    qc AS (
        SELECT r.vec_id, r.cell, v.emb,
               sqrt(list_dot_product(v.emb, v.emb)) AS nrm
        FROM ranked r JOIN v ON v.vec_id = r.vec_id
        WHERE r.rn <= 2 AND r.vec_id % 7 = 0 AND r.vec_id < 70
    ),
    sim AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm) AS sim_raw
        FROM qc q
        JOIN vc c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, round(sim_raw, 4) AS cosine_sim, rank
    FROM (
        SELECT *,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id
            ) AS INTEGER) AS rank
        FROM sim
    )
    WHERE rank <= 3
    """


@query("ann_incremental", oracle=_ANN_INCREMENTAL_ORACLE)
def ann_incremental_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN under the value-hash gate: the standing corpus
    (vec_id % 7 <> 0) is cell-assigned once into a persisted
    VersionedTable IVF index; the new batch (vec_id % 7 = 0) probes the
    INDEX SCAN with nprobe=2, exact-cosine reranks the candidates
    (corpus embeddings read only for candidate ids), and the batch
    merges into the index (append commit). Served queries are the
    vec_id < 70 slice of the batch; the whole batch still merges. The
    oracle recomputes the same md5-centroid assignments for both roles —
    the index round-trip is exact, so the persisted path and the
    recompute agree bit-for-bit (same determinism argument as
    ``dedup_incremental``)."""
    import shutil
    import tempfile

    emb = load(spark, "embeddings", sf_dir)
    corpus = emb.filter(F.col("vec_id") % 7 != 0)
    batch = emb.filter(F.col("vec_id") % 7 == 0)
    serve = batch.filter(F.col("vec_id") < 70).select("vec_id")
    work = tempfile.mkdtemp(prefix="ann_incremental_")
    try:
        out = incremental_ivf_topk(corpus, batch, work, serve_ids=serve)
        # candidates are checkpointed inside the operator; the returned
        # plan reads only the embeddings table and in-memory blocks
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# IVF+PQ (Jégou et al. 2011, §IV "IVFADC"; the FAISS IndexIVFPQ shape):
# coarse quantizer partitions the corpus into cells, PQ encodes each
# vector's RESIDUAL against its cell centroid, and a query ADC-scores
# candidates from ONLY its nprobe probed cells with a per-(query, cell)
# lookup table. This composes the two halves already verified separately
# — IVF probing (ann_ivf_kmeans_verified) and PQ/ADC scoring
# (ann_pq_verified) — into the index that actually serves billion-vector
# corpora in production.
# ---------------------------------------------------------------------------


def _ivf_centroids(spark: SparkSession, n_cells: int = 4, dim: int = 64):
    """The fixed md5 ``iv:{c}`` centroid table — the ONE construction the
    coarse-assignment path (:func:`md5_cell_assignments`, hence the
    incremental index and the IVF-PQ build AND probe sides) broadcasts;
    a tag/dim change here cannot desynchronize them."""
    return F.broadcast(
        spark.createDataFrame(
            [(c, _md5_const_vector(f"iv:{c}", dim)) for c in range(n_cells)],
            "cell int, cw array<double>",
        )
    )


def _residual_subspaces(
    assigned: DataFrame, cents, idn: str
) -> DataFrame:
    """(id, cell, s, sub): the PQ subspaces of each vector's residual
    against its assigned (or probed) cell centroid. Residual = elementwise
    subtract, then slice — both exact double ops, identical either way."""
    res = F.zip_with(
        F.col("__v"), F.col("cw"), lambda x, y: x - y
    )
    return (
        assigned.join(cents, "cell")
        .select(
            F.col(assigned.columns[0]).alias(idn),
            "cell",
            F.posexplode(
                F.array(
                    *[
                        F.slice(res, s * _PQ_SUB + 1, _PQ_SUB)
                        for s in range(_PQ_M)
                    ]
                )
            ).alias("s", "sub"),
        )
    )


def ivf_pq_adc_topk_md5(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 4,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search with residual encoding and ADC, md5-fixed coarse
    centroids AND codebook so every stage is SQL-mirrorable.

    Build side: one coarse assignment pass (argmax-dot vs the broadcast
    ``n_cells``-row centroid table), residual vs the assigned centroid,
    PQ argmin per subspace → the index is (id, cell, s, c): m 4-bit codes
    plus a cell id per vector — the float corpus is never read at query
    time.

    Query side: each query probes its ``nprobe`` best cells and builds a
    LUT PER PROBED CELL (exact subspace distances of the query's
    *cell-specific residual* to every codeword — the residual trick is
    why IVFADC needs per-cell LUTs). LUT entries are floor-half-up
    e6-scaled BIGINTs; a candidate's distance is an EXACT integer sum of
    its m entries, so aggregation order cannot perturb ranking.

    Scale: the ADC join keys on (cell, s, c) — with the persisted index
    partitioned by cell, only the probed cells' code partitions are
    scanned (the same pruning `tbl_skipping_report` proves on stats); the
    LUT side is |queries| x nprobe x m x k rows, broadcast. Candidates
    meet a query at most once (one cell per corpus vector, distinct
    probed cells per query), so no pre-rank dedup is needed."""
    spark = vectors.sparkSession
    cents = _ivf_centroids(spark, n_cells)
    cb = _pq_codebook(spark)

    def with_vec(df: DataFrame, idn: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idn),
            F.col("embedding").cast("array<double>").alias("__v"),
        )

    v = with_vec(vectors, "neighbor_id")
    v_cells = v.join(
        md5_cell_assignments(vectors, 1, n_cells, id_col=id_col).select(
            F.col(id_col).alias("neighbor_id"), "cell"
        ),
        "neighbor_id",
    ).select("neighbor_id", "__v", "cell")
    codes = (
        _residual_subspaces(v_cells, cents, "neighbor_id")
        .join(cb, "s")
        .select(
            "neighbor_id",
            "cell",
            "s",
            "c",
            _sub_d2(F.col("sub"), F.col("w")).alias("d2"),
        )
    )
    w_code = Window.partitionBy("neighbor_id", "s").orderBy("d2", "c")
    index = (
        codes.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cell", "s", "c")
    )

    q = with_vec(queries, "query_id")
    q_cells = q.join(
        md5_cell_assignments(queries, nprobe, n_cells, id_col=id_col).select(
            F.col(id_col).alias("query_id"), "cell"
        ),
        "query_id",
    ).select("query_id", "__v", "cell")
    lut = (
        _residual_subspaces(q_cells, cents, "query_id")
        .join(cb, "s")
        .select(
            "query_id",
            "cell",
            "s",
            "c",
            F.floor(_sub_d2(F.col("sub"), F.col("w")) * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("lut_e6"),
        )
    )
    approx = (
        index.join(F.broadcast(lut), ["cell", "s", "c"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("lut_e6").cast("bigint").alias("e6"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("e6", "neighbor_id")
    return (
        approx.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("e6").cast("double") / F.lit(1e6)).alias("approx_d2"),
            "rank",
        )
    )


def _ivf_pq_oracle() -> str:
    sub = _PQ_SUB
    return f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    cents AS (
        SELECT cell,
               list_transform(range(1, 65), d ->
                   (CAST(concat('0x', substr(md5(
                        'iv:' || CAST(cell AS VARCHAR) || ':'
                               || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS cw
        FROM unnest(range(4)) AS t(cell)
    ),
    cb AS (
        SELECT s, c,
               list_transform(range(1, {sub + 1}), d ->
                   (CAST(concat('0x', substr(md5(
                        'pq:' || CAST(s AS VARCHAR) || ':' || CAST(c AS VARCHAR)
                              || ':' || CAST(d - 1 AS VARCHAR)), 1, 8))
                         AS BIGINT) % 2001 - 1000) / 1000.0) AS w
        FROM unnest(range({_PQ_M})) AS ts(s), unnest(range({_PQ_K})) AS tc(c)
    ),
    assigned AS (
        SELECT vec_id, cell, rn FROM (
            SELECT v.vec_id, cents.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.emb, cents.cw) DESC,
                                cents.cell) AS rn
            FROM v, cents
        )
    ),
    v_subs AS (
        SELECT a.vec_id AS neighbor_id, a.cell, t.s,
               list_transform(range(1, {sub + 1}), i ->
                   v.emb[s * {sub} + i] - cents.cw[s * {sub} + i]) AS sub
        FROM assigned a
        JOIN v ON v.vec_id = a.vec_id
        JOIN cents ON cents.cell = a.cell,
        unnest(range({_PQ_M})) AS t(s)
        WHERE a.rn = 1
    ),
    codes AS (
        SELECT neighbor_id, cell, s, c FROM (
            SELECT v_subs.neighbor_id, v_subs.cell, v_subs.s, cb.c,
                   ROW_NUMBER() OVER (
                       PARTITION BY v_subs.neighbor_id, v_subs.s
                       ORDER BY list_dot_product(
                           list_transform(range(1, {sub + 1}), i -> sub[i] - w[i]),
                           list_transform(range(1, {sub + 1}), i -> sub[i] - w[i])
                       ), cb.c) AS rn
            FROM v_subs JOIN cb USING (s)
        ) WHERE rn = 1
    ),
    q_subs AS (
        SELECT a.vec_id AS query_id, a.cell, t.s,
               list_transform(range(1, {sub + 1}), i ->
                   v.emb[s * {sub} + i] - cents.cw[s * {sub} + i]) AS sub
        FROM assigned a
        JOIN v ON v.vec_id = a.vec_id
        JOIN cents ON cents.cell = a.cell,
        unnest(range({_PQ_M})) AS t(s)
        WHERE a.rn <= 2 AND a.vec_id < 10
    ),
    lut AS (
        SELECT query_id, cell, s, c,
               CAST(floor(list_dot_product(
                   list_transform(range(1, {sub + 1}), i -> sub[i] - w[i]),
                   list_transform(range(1, {sub + 1}), i -> sub[i] - w[i])
               ) * 1000000.0 + 0.5) AS BIGINT) AS lut_e6
        FROM q_subs JOIN cb USING (s)
    ),
    approx AS (
        SELECT lut.query_id, codes.neighbor_id,
               CAST(SUM(lut_e6) AS BIGINT) AS e6
        FROM codes JOIN lut USING (cell, s, c)
        WHERE lut.query_id <> codes.neighbor_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           CAST(e6 AS DOUBLE) / 1000000.0 AS approx_d2,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY e6, neighbor_id) AS rn
        FROM approx
    ) WHERE rn <= 5
    """


@query("ann_ivf_pq_verified", oracle=_ivf_pq_oracle())
def ann_ivf_pq_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC under the value-hash contract: md5 coarse centroids (4
    cells), residual PQ (4x16 sub-codes), per-(query, probed-cell) LUTs,
    nprobe=2, exact e6-integer ADC, per-query top-5 for the 10 fixed
    queries. A production deployment trains both quantizers with k-means
    (`train_codebook` for the coarse, per-subspace for the PQ) and keeps
    this exact assign/encode/LUT/ADC dataflow over a cell-partitioned
    persisted index (`incremental_ivf_topk` holds the serve/merge
    half)."""
    emb = load(spark, "embeddings", sf_dir)
    return ivf_pq_adc_topk_md5(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# NN-descent: graph-based ANN (the HNSW/NN-descent family) — iteratively
# improve a cheap multi-blocking init kNN graph via neighbors-of-neighbors
# ---------------------------------------------------------------------------

#: md5 salts for the init bucketings. ONE random blocking strands the
#: graph inside its blocks (a block's top-K all share the block, so
#: two-hop expansion never crosses block lines — measured recall stays at
#: the init's ~0.06); three independent blockings make the init graph
#: connected across the corpus and three descent rounds then reach ~0.95
#: recall@5 on the testdata. This connectivity-of-init requirement is the
#: distributed analog of NN-descent's random-init assumption.
_NND_SALTS = ("", ":s2", ":s3")
_NND_BUCKETS = 8
#: graph degree K: candidate volume per round is O(n * (2K)^2), so K is
#: the bench's dominant knob (VERDICT r11 #8 asked for a trim). Measured
#: at sf0.1 (recall@5 / wall): K=24 0.950/18.9s, K=20 0.877/15.2s,
#: K=18 0.833/14.4s, K=16+3rounds 0.843/23.7s — the recall cliff is
#: steeper than the time slope, so 24 stays: every cheaper config loses
#: >=7 recall points to save <5 seconds.
_NND_K = 24
_NND_ROUNDS = 2
#: degree cap applied to the SYMMETRIZED graph before two-hop expansion —
#: the deterministic analog of NN-descent's reverse-neighbor sampling
#: (rho). Without it a hub node (everyone's nearest neighbor) has
#: unbounded in-degree and the two-hop join goes quadratic through it:
#: at 2000 vectors the uncapped oracle spilled >100 GB; capped, candidate
#: volume is <= n * cap^2 per round at ANY corpus size.
_NND_CAP = 2 * _NND_K


def nndescent_topk(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_mod: int = 25,
) -> DataFrame:
    """NN-descent (Dong et al. 2011, "Efficient K-Nearest Neighbor Graph
    Construction for Generic Similarity Measures") — the graph-ANN
    family (NN-descent/HNSW) next to the space-partitioning family
    (IVF/PQ/LSH) already in the suite:

    1. INIT: md5-bucket the ids under ``_NND_SALTS`` independent
       blockings; the init graph is the union of exact top-K within
       each block (quadratic per block, linear overall), trimmed to K.
    2. DESCEND x ``_NND_ROUNDS``: symmetrize the graph (reverse edges
       are as informative as forward) and propose every two-hop
       neighbor: if v is near u and w is near v, w is a candidate for
       u. Exact cosine over candidates, keep top-K. Every round is two
       equi-joins + one bounded per-node window — candidate volume is
       O(n * (2K)^2) per round REGARDLESS of corpus size, which is why
       NN-descent builds billion-row kNN graphs without an n^2 pass.

    Fully deterministic: md5 blockings, sequential-fold cosines
    (bit-identical to DuckDB's list_dot_product), (sim DESC, id)
    tie-breaks. Output: refined top-``k`` for the ``id % query_mod``
    sample, each neighbor flagged against the EXACT global top-k
    (``in_exact_topk``), so the value hash pins init, symmetrization,
    candidate expansion, every round's ranking, and the recall
    accounting."""
    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    # normalize ONCE at the checkpoint: every downstream similarity is
    # then a single fold (dot) instead of dot + two norms — 3x fewer
    # interpreted array traversals on the millions of candidate pairs
    raw = F.col(vec_col)
    nrm = F.sqrt(
        F.aggregate(
            F.transform(raw, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.transform(raw, lambda x: x.cast("double") / nrm).alias("emb"),
    ).localCheckpoint()  # feeds every round's vector fetch

    # -- init: union of per-blocking exact top-K ---------------------------
    # All _NND_SALTS blockings ride ONE self-join keyed (salt, bucket) —
    # identical pair set and per-blocking top-K to the former per-salt
    # loop, but the quadratic-per-block dot work spreads over
    # salts x buckets join keys instead of 3 sequential jobs whose tiny
    # (2000-row) exchanges AQE coalesced to ONE task each (r14 opt:
    # event-log profile showed 3 x ~3s single-task stages here).
    par = vectors.sparkSession.sparkContext.defaultParallelism
    vb = v.select(
        "vid",
        "emb",
        F.explode(
            F.array(
                *[
                    (
                        md5_prefix_long(
                            F.concat(
                                F.col("vid").cast("string"), F.lit(salt)
                            ),
                            8,
                        )
                        % _NND_BUCKETS
                        + _NND_BUCKETS * si
                    ).alias(f"b{si}")
                    for si, salt in enumerate(_NND_SALTS)
                ]
            )
        ).alias("sbkt"),
    ).repartition(par, "sbkt")
    a, b = vb.alias("a"), vb.alias("b")
    sim0 = a.join(
        b,
        (F.col("a.sbkt") == F.col("b.sbkt"))
        & (F.col("a.vid") != F.col("b.vid")),
    ).select(
        F.col("a.sbkt").alias("sbkt"),
        F.col("a.vid").alias("u"),
        F.col("b.vid").alias("nb"),
        dot(F.col("a.emb"), F.col("b.emb")).alias("s"),
    )
    w0 = Window.partitionBy("sbkt", "u").orderBy(F.desc("s"), "nb")
    g = (
        sim0.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") <= _NND_K)
        .select("u", "nb", "s")
    )
    wk = Window.partitionBy("u").orderBy(F.desc("s"), "nb")
    g = (
        g.dropDuplicates(["u", "nb"])
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _NND_K)
        .select("u", "nb", "s")
        .localCheckpoint()
    )

    # -- descent rounds ----------------------------------------------------
    vu = v.select(F.col("vid").alias("u"), F.col("emb").alias("ue"))
    vn = v.select(F.col("vid").alias("nb"), F.col("emb").alias("ne"))
    wcap = Window.partitionBy("u").orderBy(F.desc("s"), "nb")
    for _ in range(_NND_ROUNDS):
        # symmetrize, then CAP each node's degree (rho-sampling): both
        # directions of a pair carry the identical cosine, so the
        # (u, nb) dedup is value-unambiguous
        und = (
            g.select("u", "nb", "s")
            .unionByName(
                g.select(
                    F.col("nb").alias("u"), F.col("u").alias("nb"), "s"
                )
            )
            .dropDuplicates(["u", "nb"])
            .withColumn("rn", F.row_number().over(wcap))
            .filter(F.col("rn") <= _NND_CAP)
            .select("u", "nb")
        )
        # the two-hop expansion fans ~96k capped edges out to millions of
        # candidate pairs: broadcast the probe side and PIN the stream
        # side's partition count (explicit N disables AQE coalescing,
        # which otherwise folds the tiny pre-fanout exchange to ONE
        # partition and runs the whole expansion + dot + dedup on a
        # single core — r14 opt: 6.4s single-task stages per round)
        ua, ub = und.repartition(par).alias("ua"), und.alias("ub")
        two_hop = (
            ua.join(F.broadcast(ub), F.col("ua.nb") == F.col("ub.u"))
            .select(F.col("ua.u").alias("u"), F.col("ub.nb").alias("nb"))
            .filter(F.col("u") != F.col("nb"))
        )
        cand = (
            und.unionByName(two_hop).distinct().repartition(par, "u")
        )
        sim = (
            cand.join(F.broadcast(vu), "u")
            .join(F.broadcast(vn), "nb")
            .select("u", "nb", dot(F.col("ue"), F.col("ne")).alias("s"))
        )
        # localCheckpoint per round: truncates the growing lineage, same
        # as every other iterative operator here (pagerank/BFS/PPR)
        g = (
            sim.withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") <= _NND_K)
            .select("u", "nb", "s")
            .localCheckpoint()
        )

    # -- serve the sample queries + exact-recall flags ---------------------
    g1 = (
        g.filter(F.col("u") % query_mod == 0)
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
    )
    qs = v.filter(F.col("vid") % query_mod == 0).select(
        F.col("vid").alias("u"), F.col("emb").alias("ue")
    )
    ex_sim = (
        v.repartition(par)
        .crossJoin(F.broadcast(qs))
        .filter(F.col("u") != F.col("vid"))
        .select(
            "u",
            F.col("vid").alias("nb"),
            dot(F.col("ue"), F.col("emb")).alias("s"),
        )
    )
    exact = (
        ex_sim.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("u", "nb", F.lit(True).alias("in_exact_topk"))
    )
    return g1.join(exact, ["u", "nb"], "left").select(
        F.col("u").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        F.col("nb").alias("neighbor_id"),
        F.round("s", 4).alias("cosine_sim"),
        F.coalesce("in_exact_topk", F.lit(False)).alias("in_exact_topk"),
    )


def _register_nndescent_oracle() -> None:
    """Unrolled-CTE mirror of nndescent_topk (the PPR-oracle pattern):
    the generator emits one init CTE per blocking salt and one
    (und/cand/sim/graph) CTE chain per descent round, so the SQL stays
    in lockstep with _NND_SALTS/_NND_BUCKETS/_NND_K/_NND_ROUNDS."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    cos = "list_dot_product({a}.emb, {b}.emb)"
    inits = []
    for i, salt in enumerate(_NND_SALTS):
        inits.append(f"""
    b{i} AS (
        SELECT vid, emb,
               CAST(concat('0x', substr(md5(CAST(vid AS VARCHAR) || '{salt}'),
                    1, 8)) AS BIGINT) % {_NND_BUCKETS} AS bkt
        FROM v
    ),
    t{i} AS (
        SELECT u, nb, s FROM (
            SELECT a.vid AS u, b.vid AS nb, {cos.format(a='a', b='b')} AS s,
                   row_number() OVER (
                       PARTITION BY a.vid
                       ORDER BY {cos.format(a='a', b='b')} DESC, b.vid) AS rn
            FROM b{i} a JOIN b{i} b ON a.bkt = b.bkt AND a.vid <> b.vid
        ) WHERE rn <= {_NND_K}
    )""")
    union_inits = "\n        UNION\n        ".join(
        f"SELECT u, nb, s FROM t{i}" for i in range(len(_NND_SALTS))
    )
    rounds = []
    prev = "g0"
    for r in range(1, _NND_ROUNDS + 1):
        rounds.append(f"""
    undA{r} AS MATERIALIZED (
        SELECT u, nb, s FROM {prev}
        UNION
        SELECT nb AS u, u AS nb, s FROM {prev}
    ),
    und{r} AS MATERIALIZED (
        SELECT u, nb FROM (
            SELECT u, nb,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY s DESC, nb) AS rn
            FROM undA{r}
        ) WHERE rn <= {_NND_CAP}
    ),
    cand{r} AS MATERIALIZED (
        SELECT u, nb FROM und{r}
        UNION
        SELECT a.u, b.nb FROM und{r} a JOIN und{r} b ON a.nb = b.u
        WHERE a.u <> b.nb
    ),
    g{r} AS MATERIALIZED (
        SELECT u, nb, s FROM (
            SELECT c.u, c.nb, {cos.format(a='a', b='b')} AS s,
                   row_number() OVER (
                       PARTITION BY c.u
                       ORDER BY {cos.format(a='a', b='b')} DESC, c.nb) AS rn
            FROM cand{r} c JOIN v a ON a.vid = c.u JOIN v b ON b.vid = c.nb
        ) WHERE rn <= {_NND_K}
    )""")
        prev = f"g{r}"
    ORACLE_SQL["ann_nndescent"] = f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id AS vid,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   x -> x / sqrt(list_dot_product(
                            CAST(embedding AS DOUBLE[]),
                            CAST(embedding AS DOUBLE[])))) AS emb
        FROM embeddings
    ),{",".join(inits)},
    g0 AS MATERIALIZED (
        SELECT u, nb, s FROM (
            SELECT u, nb, s,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY s DESC, nb) AS rn
            FROM ({union_inits})
        ) WHERE rn <= {_NND_K}
    ),{",".join(rounds)},
    served AS (
        SELECT u, nb, s, rank FROM (
            SELECT u, nb, s,
                   CAST(row_number() OVER (PARTITION BY u
                                           ORDER BY s DESC, nb) AS INTEGER)
                       AS rank
            FROM {prev} WHERE u % 25 = 0
        ) WHERE rank <= 5
    ),
    exact AS (
        SELECT u, nb FROM (
            SELECT q.vid AS u, t.vid AS nb,
                   row_number() OVER (
                       PARTITION BY q.vid
                       ORDER BY {cos.format(a='q', b='t')} DESC, t.vid) AS rn
            FROM v q JOIN v t ON q.vid <> t.vid
            WHERE q.vid % 25 = 0
        ) WHERE rn <= 5
    )
    SELECT s.u AS query_id, s.rank, s.nb AS neighbor_id,
           round(s.s, 4) AS cosine_sim,
           (e.nb IS NOT NULL) AS in_exact_topk
    FROM served s LEFT JOIN exact e ON e.u = s.u AND e.nb = s.nb
    """


@query("ann_nndescent")
def ann_nndescent_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refined kNN (2 NN-descent rounds over a 3-blocking md5 init,
    internal K=24, symmetrized degree capped at 48) for the
    vec_id % 25 == 0 sample, each neighbor flagged against the exact
    global top-5 (0.95 recall@5 at sf0.1's 2000 vectors; the flags make
    recall part of the hashed value — a third round buys 0.978 at ~1.5x
    the wall time, the knob a production build would expose)."""
    emb = load(spark, "embeddings", sf_dir)
    return nndescent_topk(emb, k=5, query_mod=25)


_register_nndescent_oracle()
