"""Deduplication operators: exact, token-Jaccard, MinHash+LSH, SimHash.

The reference's only dedup is full-row dropDuplicates on every table build
(Capstone/scripts/etl.py:172,203 — a 28-column-wide shuffle; SURVEY.md §4.1).
This module generalizes dedup into the family an LLM-training-data pipeline
needs, each built scale-first:

- exact:   hash-groupBy on a content key — one shuffle on a 64-bit key, not
           the full row payload.
- jaccard: all-pairs token-set Jaccard *within a blocking key* — exact but
           quadratic per block; the correctness baseline for the approximate
           methods. At 100 TB you only ever run this inside small blocks
           (LSH buckets, same-source shards...).
- minhash: MinHash signatures + banded LSH — near-dup candidate generation in
           O(n) with one shuffle per... actually a single explode+groupBy
           shuffle on (band, bucket-hash); candidates verified with true
           Jaccard so false positives drop out. The standard web-scale dedup
           (Broder 1997; same construction as Spark MLlib's MinHashLSH,
           re-expressed on native columns — no Vector UDT, no Python loop).
- simhash: 64-bit SimHash fingerprints (Charikar 2002) via per-token hash
           bit-votes; near-dup = small Hamming distance, blocked on 16-bit
           chunks (pigeonhole: d<=3 pairs share at least one of 4 chunks).

All hashing is xxhash64 (JVM-side, deterministic across runs/partitionings —
unlike monotonically_increasing_id, SURVEY §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.functions.text import normalize_text, tokens, word_shingles
from data_engineering_nd_spark.registry import query

# ---------------------------------------------------------------------------
# library API
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keep one row per key (content-defined). Shuffles only the key hash +
    payload once; Catalyst plans this as partial+final hash aggregate."""
    return df.dropDuplicates(key_cols)


def exact_dedup_groups(
    df: DataFrame, id_col: str, content: Column
) -> DataFrame:
    """Group rows by identical content; emit (keeper_id, n_copies) —
    keeper = min id, the deterministic survivor choice."""
    return (
        df.select(F.col(id_col), content.alias("__content"))
        .groupBy("__content")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__content")
        .select("keeper_id", "n_copies")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-set Jaccard over all pairs sharing ``block_col``.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    The block join is an equi-join -> shuffles once on the block key; pairs
    are generated inside each block only. Quadratic per block by design —
    use minhash_lsh_pairs for unblocked corpora.
    """
    sets = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    )
    a = sets.alias("a")
    b = sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id")))
        # filter on the raw ratio (mirrors the oracle), round only for output
        .filter(jac >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


import random

# Universal-hash constants for MinHash: g_i(h) = (a_i * h32 + b_i) mod P.
# Fixed seed -> identical signatures across runs/sessions/partitionings.
# h32 = xxhash64(shingle) & 0xFFFFFFFF keeps a_i*h32+b_i < 2^63, so bigint
# arithmetic can't overflow (Spark 4 runs ANSI mode: overflow would throw).
_MINHASH_P = (1 << 61) - 1
_rng = random.Random(0xDE5EED)
_MINHASH_AB = [
    (_rng.randrange(1, 1 << 31), _rng.randrange(0, 1 << 31)) for _ in range(256)
]


def _derived_hash(h32: Column, i: int) -> Column:
    a, b = _MINHASH_AB[i]
    return (h32 * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_P)


def minhash_signature(text_col: str | Column, num_hashes: int = 64, shingle_k: int = 3) -> Column:
    """MinHash signature as array<bigint>: for hash i, min over shingles of
    g_i(xxhash64(shingle)). Column-level form (transform/array_min, stays in
    codegen); the pairs operator below uses the equivalent explode +
    hash-aggregate shape, which is the scalable one."""
    sh = word_shingles(text_col, k=shingle_k)
    h32s = F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))
    return F.when(F.size(sh) == 0, F.lit(None)).otherwise(
        F.array(*[F.array_min(F.transform(h32s, lambda h: _derived_hash(h, i))) for i in range(num_hashes)])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int | None = 512,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with true
    shingle Jaccard.

    Candidate generation: signature split into ``bands`` bands of
    num_hashes/bands rows; docs agreeing on any full band land in the same
    bucket (bucket key = xxhash64 of the band slice). One explode (x bands)
    + one groupBy-join shuffle on the bucket key — O(n·bands) work, never
    O(n^2). Verification recomputes exact Jaccard on the candidate pairs
    only. With 64 hashes / 16 bands the S-curve midpoint is ~(1/16)^(1/4)
    ≈ 0.5, so recall at threshold 0.7 is high; false positives are removed
    by verification.

    Skew guard: buckets with more than ``max_bucket`` members are dropped
    before the self-join. A hot bucket is degenerate — boilerplate or
    empty-ish text colliding across millions of docs — and at corpus scale
    a single 1M-doc bucket alone would emit 5·10^11 candidate pairs. True
    near-dups inside a dropped bucket almost always re-pair through their
    other ``bands - 1`` bands, so the recall cost is negligible while the
    worst-case join output becomes bounded by n·bands·max_bucket. The cap
    count rides the same (band, bucket) shuffle key as the join itself.
    """
    rows_per_band = num_hashes // bands
    # The shingle frame feeds THREE consumers (signature explode, and both
    # sides of the verification join); without materialization the
    # regex+split+transform shingle build runs three times — measured 2.5x
    # slower cold at sf0.1. localCheckpoint computes it once. At corpus
    # scale swap for persist(DISK_ONLY) if executor memory is the
    # constraint; the frame is (id, array<string>) — already the pruned
    # minimum.
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, k=shingle_k).alias("shingles"),
    ).filter(F.size("shingles") > 0).localCheckpoint()

    # Signature via explode + hash-aggregate: one xxhash64 per (doc, shingle),
    # then num_hashes cheap multiply-mod derived hashes, min-aggregated per
    # doc. One shuffle of (id, 64 longs) after map-side partial min — scales
    # linearly, vs. a 64-way nested array fold per row (which profiled ~25x
    # slower at sf0.1).
    ex = base.select("id", F.explode("shingles").alias("sh")).select(
        "id", F.xxhash64("sh").bitwiseAND(F.lit(0xFFFFFFFF)).alias("h32")
    )
    # SQL-string builds (one parse each) — the Column-API loops here cost
    # hundreds of py4j round trips per plan build; operators unchanged
    sig = ex.groupBy("id").agg(
        *[
            F.expr(
                f"min((h32 * {_MINHASH_AB[i][0]} + {_MINHASH_AB[i][1]}) "
                f"% {_MINHASH_P})"
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    # band bucket key = xxhash64 over that band's signature columns directly.
    band_structs = ", ".join(
        "named_struct('band', {b}, 'bucket', xxhash64({b}, {cols}))".format(
            b=b,
            cols=", ".join(
                f"h{b * rows_per_band + j}" for j in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    bucketed = sig.select(
        "id",
        F.explode(F.expr(f"array({band_structs})")).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if max_bucket is not None:
        from pyspark.sql.window import Window

        bucket_w = Window.partitionBy("band", "bucket")
        bucketed = (
            bucketed.withColumn("_bsz", F.count(F.lit(1)).over(bucket_w))
            .filter(F.col("_bsz") <= max_bucket)
            .drop("_bsz")
        )
    shingle_map = base  # (id, shingles) for verification

    a = bucketed.alias("a")
    b = bucketed.alias("b")
    # candidates shuffle only (band, bucket, id) triples; shingle arrays are
    # joined back just for the surviving distinct pairs.
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = shingle_map.select(F.col("id"), F.col("shingles"))
    cand = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return (
        cand.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash of each document's token multiset -> (id, fp: bigint).

    Per token: h = xxhash64(token); each of the 64 bit positions votes +1/-1;
    fingerprint bit b = 1 iff the vote sum is positive (Charikar 2002).

    Shape chosen for scale: explode tokens -> one hash per (doc, token) ->
    single hash-aggregate on doc id with 64 conditional-sum vote columns.
    That's one shuffle of (id, 64 small ints after map-side partial agg) and
    stays entirely in whole-stage codegen — vs. evaluating 64 nested array
    folds per row. Empty documents produce no tokens and drop out (SimHash
    is undefined for them).
    """
    # vote aggregates and the 64-bit fold are SQL strings parsed in one
    # F.expr each: the Column-API loops cost ~500 py4j round trips
    # (~1.5s of driver Python per plan build, measured) for expressions
    # the JVM parses in milliseconds. Operators are identical.
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    ).select("id", F.xxhash64("tok").alias("h"))
    votes = ex.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 "
                "THEN 1 ELSE -1 END)"
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    fp = F.expr(
        " | ".join(
            f"(CASE WHEN b{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) "
            "ELSE CAST(0 AS BIGINT) END)"
            for b in range(64)
        )
    )
    return votes.select("id", fp.alias("fp"))


def hamming_blocked_pairs(
    fp: DataFrame, bits: int = 64, max_hamming: int = 3
) -> DataFrame:
    """Generic pigeonhole near-dup pairing: an (id, fp) fingerprint frame
    -> all pairs at Hamming distance <= max_hamming, with EXACT recall and
    no O(n²) scan. The fingerprint splits into max_hamming+1 chunks; any
    pair within distance max_hamming agrees on >= 1 full chunk
    (pigeonhole), so candidates come from one equi-join per chunk
    (explode × chunks, one shuffle) and only collisions pay the XOR
    verification. Shared by SimHash text dedup and perceptual-hash image
    dedup (`multimodal.image_dhash_pairs`); at very large n, chunk-key
    buckets are uniform (~n/2^chunk_bits) unless the fingerprint space is
    degenerate — cap hot buckets upstream the way `minhash_lsh_pairs`
    does if the corpus has giant boilerplate families."""
    n_chunks = max_hamming + 1
    bounds = [round(i * bits / n_chunks) for i in range(n_chunks + 1)]
    spans = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("fp", start)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i, (start, width) in enumerate(spans)
                ]
            )
        ).alias("ck"),
    ).select("id", "fp", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    xor = F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(xor).cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: the 64-bit fingerprint splits into max_hamming+1 chunks; by
    pigeonhole, any pair within distance max_hamming agrees on >=1 full
    chunk, so candidates come from an equi-join per chunk (explode x chunks,
    one shuffle) — exact recall, no O(n^2) scan. More chunks = shorter
    chunk keys = more candidates to verify; keep max_hamming small.
    """
    n_chunks = max_hamming + 1
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]
    spans = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]
    fp = simhash64(df, id_col, text_col)
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("fp", start)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i, (start, width) in enumerate(spans)
                ]
            )
        ).alias("ck"),
    ).select("id", "fp", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    xor = F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# driver queries
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_groups",
    oracle=r"""
    SELECT
        MIN(doc_id) AS keeper_id,
        COUNT(*) AS n_copies
    FROM (
        SELECT doc_id,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS content
        FROM documents
    )
    GROUP BY content
    """,
)
def dedup_exact_groups_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return exact_dedup_groups(docs, "doc_id", normalize_text("text"))


@query(
    "dedup_jaccard_pairs",
    oracle=r"""
    WITH sets AS (
        SELECT doc_id AS id,
               lang AS block,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
        FROM documents
        WHERE doc_id < 200
    )
    SELECT
        a.id AS id_a,
        b.id AS id_b,
        round(
            CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE),
            6
        ) AS jaccard
    FROM sets a
    JOIN sets b ON a.block = b.block AND a.id < b.id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          >= 0.5
    """,
)
def dedup_jaccard_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_id < 200 bounds the quadratic-per-block work at large SF; the
    # unbounded path is minhash_lsh below.
    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    return jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)


@query("dedup_minhash_lsh")  # xxhash64-based: not SQL-expressible -> rows-only check
def dedup_minhash_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Default max_bucket=512 verified a no-op at both gate SFs (sf0.01: 25
    # pairs capped and uncapped; sf0.1: 254 both) — the r02/r03-recorded
    # row counts are unchanged by the skew guard (ADVICE r04 #3).
    from data_engineering_nd_spark.catalog import ensure_parallelism

    # single-file testdata arrives as 1 split; fan the CPU-heavy shingle
    # kernel out across cores before hashing
    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.7)


@query("dedup_simhash")  # xxhash64-based: not SQL-expressible -> rows-only check
def dedup_simhash_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


def ngram_coverage(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Per-document duplicated-span coverage: what fraction of a document's
    distinct word k-grams appears in at least one OTHER place in the corpus.
    The scalable approximation of exact substring dedup (the suffix-array
    pass of Lee et al.'s "Deduplicating Training Data Makes Language Models
    Better") — a high dup_fraction marks boilerplate/templated documents
    that pairwise whole-doc dedup misses because no single pair crosses the
    similarity threshold.

    Scale shape: one explode to ~n_tokens gram rows per document, hashed to
    a fixed-width md5 digest scan-side so the corpus-frequency aggregate
    and the join back both shuffle 32-byte keys, never gram text — the
    inverted-index shape shared with tfidf_cosine_pairs. Per-doc grams are
    pre-deduplicated (word_shingles is distinct), so the frequency table is
    document frequency and the join fan-out is bounded by document length.
    """
    # g feeds both the frequency aggregate and the join back — materialize
    # the exploded+hashed frame once (same shape as minhash's shingle
    # frame, dedup.py LSH path) instead of re-running the tokenize+explode
    # kernel twice.
    g = (
        df.select(
            F.col(id_col), F.explode(word_shingles(text_col, k)).alias("gram")
        )
        .select(id_col, F.md5("gram").alias("gh"))
        .localCheckpoint()
    )
    dfreq = g.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    return (
        g.join(dfreq, "gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("df") >= 2).cast("int")).cast("bigint").alias("n_dup_grams"),
        )
        .withColumn(
            "dup_fraction",
            F.round(
                F.col("n_dup_grams").cast("double") / F.col("n_grams").cast("double"),
                4,
            ),
        )
    )


@query(
    "dedup_ngram_coverage",
    # Exact mirror of tokens()/word_shingles(k=5): documents shorter than
    # 5 words contribute one whole-text shingle; otherwise n-4 sliding
    # 5-grams, deduplicated per document. Integer counts and an exact
    # int/int division keep the 4-dp round engine-stable.
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents
    ),
    g0 AS (
        SELECT doc_id,
               CASE WHEN len(toks) <= 5 THEN [array_to_string(toks, ' ')]
                    ELSE list_transform(range(1, len(toks) - 3),
                                        i -> array_to_string(toks[i:i+4], ' '))
               END AS grams
        FROM t
    ),
    g AS (
        SELECT DISTINCT doc_id, gram
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g0)
    ),
    c AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN c.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams,
           round(CAST(SUM(CASE WHEN c.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS dup_fraction
    FROM g JOIN c USING (gram)
    GROUP BY g.doc_id
    """,
)
def dedup_ngram_coverage_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return ngram_coverage(docs, "doc_id", "text", k=5)


def embedding_cosine_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity.

    Blocked on ``block_col`` (a coarse cluster/cell id) so the pair space is
    quadratic per block, not per corpus — same IVF trade as
    similarity.ivf_topk. Each block's pairs are computed as ONE float64
    Gram matrix (numpy BLAS) inside applyInPandas: a single shuffle on the
    cell id, then O(b²·d) vectorized work per cell with no per-pair
    expression evaluation. At 100 TB you bound the cell size (split hot
    cells) and this stays one matmul per task.

    With block_col=None it degrades to all-pairs via a self-join with the
    JVM-side fold dot product (correctness baseline; never run that
    unblocked at scale).
    """
    if block_col is None:
        from data_engineering_nd_spark.operators.similarity import dot, l2_norm

        v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        a, b = v.alias("a"), v.alias("b")
        denom = l2_norm(F.col("a.vec")) * l2_norm(F.col("b.vec"))
        # zero vectors -> cosine 0 (ANSI mode would throw on x/0)
        sim = F.when(
            denom > 0, dot(F.col("a.vec"), F.col("b.vec")) / denom
        ).otherwise(F.lit(0.0))
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .filter(sim >= threshold)
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(sim, 4).alias("cosine_sim"),
            )
        )

    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine_sim": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors -> cosine 0, not NaN
        sims = (mat @ mat.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[iu[keep]],
                "id_b": ids[ju[keep]],
                "cosine_sim": np.round(sims[iu[keep], ju[keep]], 4),
            }
        )

    return (
        vectors.select(F.col(id_col), F.col(vec_col), F.col(block_col))
        .groupBy(block_col)
        .applyInPandas(block_pairs, "id_a bigint, id_b bigint, cosine_sim double")
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        FROM embeddings
    )
    SELECT
        a.vec_id AS id_a,
        b.vec_id AS id_b,
        round(
            list_dot_product(a.emb, b.emb)
              / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb))),
            4
        ) AS cosine_sim
    FROM v a
    JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.emb, b.emb)
          / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
          >= 0.35
    """,
)
def dedup_embedding_cosine_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # threshold 0.35 surfaces the near-dup tail of the synthetic embeddings
    # (max intra-cell cosine ~0.47); production near-dup removal uses ~0.9+.
    emb = load(spark, "embeddings", sf_dir)
    return embedding_cosine_pairs(emb, threshold=0.35)


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond").
    Returns (id, comp) with comp = the component's minimum node id.

    Why this beats plain min-label propagation at web scale: propagation
    needs diameter-many rounds (a 1M-long dup chain = 1M shuffles); the
    star operations square away path length, converging in
    O(log^2 n) — in practice a handful — of rounds on any topology, and
    every round is still just groupBy-min + equi-join on node id.

    large-star: every node u sends m = min(u, Γ(u)) to its LARGER
    neighbors; small-star: u collapses its smaller-or-equal neighborhood
    onto that minimum. Both strictly shrink sum(dst) while preserving
    connectivity, so the (checksum, count) fixed point is a true
    convergence witness. The per-round frames carry only (bigint, bigint)
    pairs — node payloads never enter the loop.
    """
    from pyspark.sql import Observation

    def _sig_obs():
        """(count, xxhash-checksum) observation riding a checkpoint job —
        the convergence witness costs no separate action (decimal
        accumulation: a sum of 64-bit hashes overflows bigint under ANSI
        mode)."""
        return Observation(), [
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ]

    und = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    ob0, metrics0 = _sig_obs()
    cur = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .observe(ob0, *metrics0)
        .localCheckpoint()
    )

    def _adj_both(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    def _large_star(e: DataFrame) -> DataFrame:
        adj = _adj_both(e)
        m = adj.groupBy("src").agg(
            F.least(F.first("src"), F.min("dst")).alias("m")
        )
        return (
            adj.join(m, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        adj = _adj_both(e).filter(F.col("dst") <= F.col("src"))
        m = adj.groupBy("src").agg(
            F.least(F.first("src"), F.min("dst")).alias("m")
        )
        with_m = adj.join(m, "src")
        out = with_m.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
            with_m.select("src", F.col("m").alias("dst"))
        )
        return out.filter(F.col("src") != F.col("dst")).distinct()

    m0 = ob0.get
    prev = (m0["n"], m0["h"])
    converged = False
    for _ in range(max_iterations):
        ob, metrics = _sig_obs()
        cur = (
            _small_star(_large_star(cur))
            .observe(ob, *metrics)
            .localCheckpoint()
        )
        m = ob.get
        sig = (m["n"], m["h"])
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        # Falling through without the (count, checksum) fixed point means
        # cur may NOT be a star forest yet — surface it instead of
        # returning a silently-wrong labelling (ADVICE r04).
        raise RuntimeError(
            "connected_components_star: no convergence within "
            f"{max_iterations} rounds; raise max_iterations "
            "(O(log^2 n) rounds expected — this indicates a pathological "
            "or adversarial edge set)"
        )
    # converged: cur is a star forest (v -> component-min root)
    return (
        cur.select(F.col("src").alias("id"), F.col("dst").alias("comp"))
        .union(cur.select(F.col("dst").alias("id"), F.col("dst").alias("comp")))
        .groupBy("id")
        .agg(F.min("comp").alias("comp"))
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Near-duplicate pair list -> cluster assignment (connected components
    by iterative min-label propagation): every doc gets cluster_id = the
    smallest doc id reachable through the pair graph, so "keep one per
    cluster" is a deterministic filter (id == cluster_id).

    Each iteration is one join + one min-aggregate; localCheckpoint cuts
    the lineage so plan size stays constant across iterations. Iterations
    needed = graph diameter — fine for near-dup clusters, which are
    shallow (dup chains, not long paths). ``connected_components_star``
    above is the diameter-independent web-scale variant; both produce the
    identical (id, min-reachable-id) labelling (pinned equal on random
    graphs in tests/test_dedup.py), so callers choose by topology.
    """
    from pyspark.sql import Observation

    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint()
    # labels only ever decrease, so sum(comp) is a strictly decreasing
    # fixed-point witness: equal sums on consecutive rounds == converged.
    # The witness rides each round's checkpoint job via observe — no
    # separate aggregate action per round.
    ob0 = Observation()
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("id"), F.col("src").alias("comp"))
        .observe(ob0, F.sum("comp").alias("s"))
        .localCheckpoint()
    )
    prev_sum = ob0.get["s"]
    converged = False
    for _ in range(max_iterations):
        e, l = edges.alias("e"), labels.alias("l")
        neigh = e.join(l, F.col("e.dst") == F.col("l.id")).select(
            F.col("e.src").alias("id"), F.col("l.comp").alias("comp")
        )
        ob = Observation()
        labels = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .observe(ob, F.sum("comp").alias("s"))
            .localCheckpoint()
        )
        new_sum = ob.get["s"]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            "dedup_clusters: min-label propagation did not converge within "
            f"{max_iterations} rounds — the pair graph's diameter exceeds "
            "the budget; raise max_iterations or switch to "
            "connected_components_star (diameter-independent)"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


# Shared by the propagation and star-CC cluster queries (and the keep-best
# assembly step in operators.datasets): all must produce the identical
# (doc_id, min-reachable-id) labelling over the jaccard-0.5 pair graph, so
# they verify against the same recursive-SQL closure. Split into the CTE
# block + final select so composite oracles can extend the same CTEs.
PAIR_EDGE_CTES = r"""
    sets AS (
        SELECT doc_id AS id,
               lang AS block,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
        FROM documents
        WHERE doc_id < 200
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM sets a
        JOIN sets b ON a.block = b.block AND a.id < b.id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    )
    """

CLUSTER_ORACLE_CTES = "\n    WITH RECURSIVE" + PAIR_EDGE_CTES + r""",
    reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    )
    """

_CLUSTER_ORACLE = CLUSTER_ORACLE_CTES + r"""
    SELECT id AS doc_id, MIN(r) AS cluster_id
    FROM reach
    GROUP BY id
    """


@query("dedup_cluster_assignment", oracle=_CLUSTER_ORACLE)
def dedup_cluster_assignment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the jaccard-0.5 pair graph (same pair
    source as dedup_jaccard_pairs)."""
    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    return dedup_clusters(pairs)


@query("dedup_cluster_star", oracle=_CLUSTER_ORACLE)
def dedup_cluster_star_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract as dedup_cluster_assignment, computed with
    the diameter-independent large-star/small-star algorithm — the variant
    that holds when dup chains are long (propagation needs diameter-many
    shuffle rounds; this needs O(log^2 n)). Hash-verified against the same
    recursive-SQL closure, pinning that both implementations agree."""
    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pairs = jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.5)
    return connected_components_star(pairs, src="id_a", dst="id_b").select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


def md5_shingle_base(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int = 3
) -> DataFrame:
    """(id, shingles) frame for the md5 LSH family, materialized once
    (it feeds both the signature explode and the verification join)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, k=shingle_k).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .localCheckpoint()
    )


def md5_band_buckets(
    base: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(id, band, bucket) banded-LSH index rows from an (id, shingles)
    frame — the PERSISTABLE unit of the md5 MinHash family (bucket is a
    deterministic string of the band's signature slice, so index rows
    written today join exactly against rows computed tomorrow). One
    explode(x perms) + two hash-aggs; never O(n^2)."""
    rows_per_band = num_hashes // bands
    hashed = (
        base.select("id", F.explode("shingles").alias("sh"))
        .withColumn("p", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
        .select(
            "id",
            "p",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("sh"), F.lit(":"), F.col("p").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("mh"),
        )
    )
    sig = hashed.groupBy("id", "p").agg(F.min("mh").alias("mh"))
    return sig.groupBy(
        "id", (F.col("p") / F.lit(rows_per_band)).cast("int").alias("band")
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "mh"))),
                lambda x: x["mh"].cast("string"),
            ),
            ",",
        ).alias("bucket")
    )


def minhash_lsh_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash + banded LSH with an md5-derived hash family — the
    SQL-MIRRORABLE sibling of :func:`minhash_lsh_pairs`.

    The production path keys everything off xxhash64 (fastest JVM hash,
    but with no DuckDB equivalent, so the driver can only row-count it).
    This variant derives each permutation as the first 60 bits of
    ``md5(shingle ':' perm)`` — md5 exists verbatim in both engines, so
    the ENTIRE pipeline (shingle -> 16-perm signature -> 4-row band
    buckets -> candidate join -> exact-Jaccard verification) value-hashes
    against a straight SQL transcription. Same asymptotics as the fast
    path: one explode(x perms) + hash-agg for signatures, one equi-join
    on (band, bucket key), verification only on collisions. Use THIS one
    when you need the audit trail, the xxhash64 one for raw throughput.
    """
    base = md5_shingle_base(df, id_col, text_col, shingle_k=shingle_k)
    bands_df = md5_band_buckets(base, num_hashes=num_hashes, bands=bands)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return jaccard_verified_pairs(cand, base, threshold)


def jaccard_verified_pairs(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidates against an
    (id, shingles) frame — only collisions pay the set intersection."""
    cand = cand.join(
        sets.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"),
        "id_a",
    ).join(
        sets.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        cand.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


@query(
    "dedup_minhash_verified",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id AS id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents
        -- empty/whitespace-only docs: Spark's tokens() yields an empty
        -- array (doc dropped) while string_split('', ' ') yields ['']
        -- (kept, hashable '' token) — guard so the mirror stays exact if
        -- the corpus ever gains empty texts (ADVICE r05 #3)
        WHERE trim(text) <> ''
    ),
    sets AS (
        SELECT id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   i -> array_to_string(w[i:i+2], ' '))) AS shingles
        FROM toks
        WHERE len(list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   i -> array_to_string(w[i:i+2], ' ')))) > 0
    ),
    hashed AS (
        SELECT id, p,
               MIN(CAST(concat('0x',
                   substr(md5(s || ':' || CAST(p AS VARCHAR)), 1, 15))
                   AS BIGINT)) AS mh
        FROM (SELECT id, unnest(shingles) AS s FROM sets),
             unnest(range(16)) AS t(p)
        GROUP BY id, p
    ),
    bands AS (
        SELECT id, CAST(p // 4 AS INT) AS band,
               STRING_AGG(CAST(mh AS VARCHAR), ',' ORDER BY p) AS bucket
        FROM hashed GROUP BY id, p // 4
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / CAST(len(sa.shingles) + len(sb.shingles)
                        - len(list_intersect(sa.shingles, sb.shingles))
                   AS DOUBLE), 6) AS jaccard
    FROM cand
    JOIN sets sa ON sa.id = cand.id_a
    JOIN sets sb ON sb.id = cand.id_b
    WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles))
                  AS DOUBLE), 6) >= 0.5
    """,
)
def dedup_minhash_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash-LSH dedup pipeline under a VALUE-HASH contract:
    signatures, banded buckets, candidate join, and exact-Jaccard
    verification all mirrored in SQL via the md5 hash family. The
    xxhash64 `dedup_minhash_lsh` remains the throughput path; this query
    pins that the LSH construction itself (not just its row count) is
    correct."""
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return minhash_lsh_pairs_md5(docs, "doc_id", "text", threshold=0.5)


_SIMHASH_MD5_BITS = 60  # 15 hex chars of md5 -> fits BIGINT in both engines


def simhash_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash with an md5-derived token hash — the SQL-mirrorable
    sibling of :func:`simhash64` (same vote/assembly shape, same single
    hash-aggregate scale profile; see `minhash_lsh_pairs_md5` for why the
    md5 family exists)."""
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    ).select(
        "id",
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    # SQL-string builds, one parse per expression (see simhash64)
    votes = ex.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 "
                "THEN 1 ELSE -1 END)"
            ).alias(f"b{b}")
            for b in range(_SIMHASH_MD5_BITS)
        ]
    )
    fp = F.expr(
        " | ".join(
            f"(CASE WHEN b{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) "
            "ELSE CAST(0 AS BIGINT) END)"
            for b in range(_SIMHASH_MD5_BITS)
        )
    )
    return votes.select("id", fp.alias("fp"))


def simhash_pairs_md5(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs at Hamming <= max_hamming over the md5 SimHash, with
    the same pigeonhole chunk blocking as :func:`simhash_pairs`."""
    bits = _SIMHASH_MD5_BITS
    n_chunks = max_hamming + 1
    bounds = [round(i * bits / n_chunks) for i in range(n_chunks + 1)]
    spans = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]
    fp = simhash_md5(df, id_col, text_col)
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("fp", start)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i, (start, width) in enumerate(spans)
                ]
            )
        ).alias("ck"),
    ).select("id", "fp", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    xor = F.col("a.fp").bitwiseXOR(F.col("b.fp"))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(xor).cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


@query("dedup_simhash_verified")  # oracle registered below (generated SQL)
def dedup_simhash_verified_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash near-dup pipeline under a VALUE-HASH contract (votes,
    fingerprint assembly, pigeonhole chunking, Hamming verification) via
    the md5 hash family; `dedup_simhash` (xxhash64) stays the throughput
    path."""
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return simhash_pairs_md5(docs, "doc_id", "text", max_hamming=3)


def _register_simhash_md5_oracle() -> None:
    from data_engineering_nd_spark.registry import ORACLE_SQL

    bits = _SIMHASH_MD5_BITS
    n_chunks = 4
    bounds = [round(i * bits / n_chunks) for i in range(n_chunks + 1)]
    spans = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]
    vote_cols = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    fp_expr = "\n               + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    chunk_case = " ".join(
        f"WHEN {i} THEN (fp >> {start}) & {(1 << width) - 1}"
        for i, (start, width) in enumerate(spans)
    )
    ORACLE_SQL["dedup_simhash_verified"] = rf"""
    WITH tok AS (
        SELECT doc_id AS id,
               unnest(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        FROM documents
        -- guard: Spark drops empty docs (empty token array), DuckDB's
        -- string_split('', ' ') would keep a '' token (ADVICE r05 #3)
        WHERE trim(text) <> ''
    ),
    h AS (
        SELECT id,
               CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM tok
    ),
    votes AS (
        SELECT id,
               {vote_cols}
        FROM h GROUP BY id
    ),
    fps AS (
        SELECT id,
               CAST({fp_expr} AS BIGINT) AS fp
        FROM votes
    ),
    chunks AS (
        SELECT id, fp, c,
               CASE c {chunk_case} END AS key
        FROM fps, unnest(range({n_chunks})) AS t(c)
    )
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
    FROM chunks a
    JOIN chunks b ON a.c = b.c AND a.key = b.key AND a.id < b.id
    WHERE bit_count(xor(a.fp, b.fp)) <= 3
    """


_register_simhash_md5_oracle()


# ---------------------------------------------------------------------------
# LSH quality evaluation: recall of the banded construction vs exact Jaccard
# ---------------------------------------------------------------------------


def lsh_recall_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """One-row report comparing the md5 MinHash-LSH pipeline against the
    exact all-pairs Jaccard ground truth on the SAME corpus: document
    count, true pair count, LSH-recovered pair count, and recall in
    exact e4 units. This is the evaluation loop a dedup pipeline owner
    runs when tuning (num_hashes, bands, threshold) — the S-curve math
    predicts recall, this measures it.

    LSH output is verified against true Jaccard at the same threshold,
    so it is a SUBSET of the exact pair set by construction — recall is
    the whole story (precision is 1 after verification). The exact side
    is a deliberate all-pairs self-join: run it on a bounded evaluation
    SAMPLE (the caller gates the corpus), never the full corpus — the
    point of LSH is that the full corpus can't afford this join, and the
    report quantifies what that shortcut costs on a slice that can.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, k=shingle_k).alias("shingles"),
    ).filter(F.size("shingles") > 0).localCheckpoint()
    a = base.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    exact = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    lsh = minhash_lsh_pairs_md5(
        df, id_col, text_col, threshold=threshold, shingle_k=shingle_k
    ).select("id_a", "id_b")
    n_docs = base.count()
    stats = exact.withColumn("_x", F.lit(1)).join(
        lsh.withColumn("_l", F.lit(1)), ["id_a", "id_b"], "full_outer"
    ).agg(
        F.count(F.when(F.col("_x").isNotNull(), 1)).alias("n_exact_pairs"),
        F.count(F.when(F.col("_l").isNotNull(), 1)).alias("n_lsh_pairs"),
        F.count(F.when(F.col("_x").isNotNull() & F.col("_l").isNotNull(), 1)).alias(
            "n_matched"
        ),
    )
    return stats.select(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.col("n_exact_pairs").cast("bigint"),
        F.col("n_lsh_pairs").cast("bigint"),
        F.col("n_matched").cast("bigint"),
        F.when(
            F.col("n_exact_pairs") > 0,
            F.expr("n_matched * 10000 div n_exact_pairs"),
        )
        .cast("bigint")
        .alias("recall_e4"),
    )


@query(
    "dedup_lsh_recall",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id AS id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents
        WHERE doc_id < 200 AND trim(text) <> ''
    ),
    sets AS (
        SELECT id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   i -> array_to_string(w[i:i+2], ' '))) AS shingles
        FROM toks
        WHERE len(list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   i -> array_to_string(w[i:i+2], ' ')))) > 0
    ),
    exact AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM sets a JOIN sets b ON a.id < b.id
        WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                    / CAST(len(a.shingles) + len(b.shingles)
                           - len(list_intersect(a.shingles, b.shingles))
                      AS DOUBLE), 6) >= 0.5
    ),
    hashed AS (
        SELECT id, p,
               MIN(CAST(concat('0x',
                   substr(md5(s || ':' || CAST(p AS VARCHAR)), 1, 15))
                   AS BIGINT)) AS mh
        FROM (SELECT id, unnest(shingles) AS s FROM sets),
             unnest(range(16)) AS t(p)
        GROUP BY id, p
    ),
    bands AS (
        SELECT id, CAST(p // 4 AS INT) AS band,
               STRING_AGG(CAST(mh AS VARCHAR), ',' ORDER BY p) AS bucket
        FROM hashed GROUP BY id, p // 4
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
    ),
    lsh AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sets sa ON sa.id = c.id_a
        JOIN sets sb ON sb.id = c.id_b
        WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                    / CAST(len(sa.shingles) + len(sb.shingles)
                           - len(list_intersect(sa.shingles, sb.shingles))
                      AS DOUBLE), 6) >= 0.5
    )
    SELECT (SELECT COUNT(*) FROM sets) AS n_docs,
           (SELECT COUNT(*) FROM exact) AS n_exact_pairs,
           (SELECT COUNT(*) FROM lsh) AS n_lsh_pairs,
           (SELECT COUNT(*) FROM exact e
            WHERE EXISTS (SELECT 1 FROM lsh l
                          WHERE l.id_a = e.id_a AND l.id_b = e.id_b))
               AS n_matched,
           CASE WHEN (SELECT COUNT(*) FROM exact) > 0 THEN
               (SELECT COUNT(*) FROM exact e
                WHERE EXISTS (SELECT 1 FROM lsh l
                              WHERE l.id_a = e.id_a AND l.id_b = e.id_b))
                   * 10000 // (SELECT COUNT(*) FROM exact)
           END AS recall_e4
    """,
)
def dedup_lsh_recall_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the 16-hash/4-band md5 MinHash-LSH against the
    exact all-pairs Jaccard-0.5 ground truth on the doc_id<200 evaluation
    slice — both sides AND the comparison value-hashed cross-engine."""
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(
        load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    )
    return lsh_recall_report(docs, "doc_id", "text", threshold=0.5)


# ---------------------------------------------------------------------------
# Incremental dedup against a PERSISTED signature index (VERDICT r06 #4):
# the shape a crawl pipeline actually runs daily — signatures for the
# standing corpus are computed ONCE, persisted, and every new batch joins
# against the index instead of re-fingerprinting the corpus.
# ---------------------------------------------------------------------------


def candidate_pairs_against_index(
    index_bands: DataFrame, batch_bands: DataFrame
) -> DataFrame:
    """LSH candidate pairs of a new batch: cross pairs against the
    persisted (id, band, bucket) index plus intra-batch pairs. The index
    side is WHATEVER FRAME IS PASSED — for the incremental contract that
    is a parquet scan of the persisted index, with zero signature
    recomputation above it (plan-pinned in tests/test_plans.py). Ids are
    canonicalized (least, greatest) so multi-band collisions dedup."""
    i, b = index_bands.alias("i"), batch_bands.alias("b")
    cross = i.join(
        b,
        (F.col("i.band") == F.col("b.band"))
        & (F.col("i.bucket") == F.col("b.bucket"))
        & (F.col("i.id") != F.col("b.id")),
    ).select(
        F.least(F.col("i.id"), F.col("b.id")).alias("id_a"),
        F.greatest(F.col("i.id"), F.col("b.id")).alias("id_b"),
    )
    c = batch_bands.alias("c")
    intra = b.join(
        c,
        (F.col("b.band") == F.col("c.band"))
        & (F.col("b.bucket") == F.col("c.bucket"))
        & (F.col("b.id") < F.col("c.id")),
    ).select(F.col("b.id").alias("id_a"), F.col("c.id").alias("id_b"))
    return cross.unionByName(intra).dropDuplicates(["id_a", "id_b"])


def incremental_minhash_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    index_root: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Dedup a NEW batch against a standing corpus through a persisted
    banded-signature index, then merge the batch into the index.

    Flow (the daily-crawl shape at 100 TB):

    1. bootstrap: if the ``VersionedTable`` at ``index_root`` is empty,
       fingerprint the corpus once and commit its (id, band, bucket)
       rows — the ONLY time corpus text is fully scanned for signatures;
    2. fingerprint the batch only (one explode + two hash-aggs over the
       new documents — work proportional to the BATCH, not the corpus);
    3. candidates = batch bands vs index scan + intra-batch, exact
       Jaccard verified; corpus text is read only for candidate ids
       (semi-join pushdown), never re-fingerprinted;
    4. merge: append the batch bands to the index (one commit), so
       tomorrow's batch joins against corpus+today.

    Returns verified pairs (id_a, id_b, jaccard). Caller contract:
    corpus and batch ids are disjoint."""
    from data_engineering_nd_spark.tables import VersionedTable

    spark = batch.sparkSession
    table = VersionedTable(spark, index_root)
    if table.latest_version() is None:
        corpus_base = md5_shingle_base(corpus, id_col, text_col, shingle_k)
        table.commit(
            md5_band_buckets(corpus_base, num_hashes=num_hashes, bands=bands)
        )
    idx = table.snapshot()

    batch_base = md5_shingle_base(batch, id_col, text_col, shingle_k)
    # three consumers (cross join, intra join, merge commit) — compute once
    batch_bands = md5_band_buckets(
        batch_base, num_hashes=num_hashes, bands=bands
    ).localCheckpoint()

    # candidate ids are output-sized; materializing them severs the plan
    # from the index files so callers may retire old index versions
    cand = candidate_pairs_against_index(idx, batch_bands).localCheckpoint()

    # verification shingles: batch side is already materialized; corpus
    # side reads text ONLY for candidate ids (left-semi prune, broadcast
    # at real scale) — a lookup, not a recompute
    cand_ids = cand.select(F.col("id_a").alias("id")).unionByName(
        cand.select(F.col("id_b").alias("id"))
    ).distinct()
    corpus_sets = (
        corpus.select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, k=shingle_k).alias("shingles"),
        )
        .join(F.broadcast(cand_ids), "id", "left_semi")
    )
    sets = batch_base.unionByName(corpus_sets)

    table.commit(batch_bands, mode="append")  # the index merge
    return jaccard_verified_pairs(cand, sets, threshold)


_INCREMENTAL_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id AS id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents
        WHERE trim(text) <> ''
    ),
    sets AS (
        SELECT id,
               list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   i -> array_to_string(w[i:i+2], ' '))) AS shingles
        FROM toks
        WHERE len(list_distinct(list_transform(
                   range(1, greatest(len(w) - 2, 1) + 1),
                   i -> array_to_string(w[i:i+2], ' ')))) > 0
    ),
    hashed AS (
        SELECT id, p,
               MIN(CAST(concat('0x',
                   substr(md5(s || ':' || CAST(p AS VARCHAR)), 1, 15))
                   AS BIGINT)) AS mh
        FROM (SELECT id, unnest(shingles) AS s FROM sets),
             unnest(range(16)) AS t(p)
        GROUP BY id, p
    ),
    bands AS (
        SELECT id, CAST(p // 4 AS INT) AS band,
               STRING_AGG(CAST(mh AS VARCHAR), ',' ORDER BY p) AS bucket
        FROM hashed GROUP BY id, p // 4
    ),
    cand AS (
        -- cross: persisted corpus index (id % 7 <> 0) vs the new batch
        SELECT DISTINCT least(a.id, b.id) AS id_a,
                        greatest(a.id, b.id) AS id_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.id % 7 <> 0 AND b.id % 7 = 0
        UNION
        -- intra-batch
        SELECT DISTINCT a.id, b.id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                    AND a.id < b.id
        WHERE a.id % 7 = 0 AND b.id % 7 = 0
    )
    SELECT id_a, id_b,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / CAST(len(sa.shingles) + len(sb.shingles)
                        - len(list_intersect(sa.shingles, sb.shingles))
                   AS DOUBLE), 6) AS jaccard
    FROM cand
    JOIN sets sa ON sa.id = cand.id_a
    JOIN sets sb ON sb.id = cand.id_b
    WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles))
                  AS DOUBLE), 6) >= 0.5
    """


@query("dedup_incremental", oracle=_INCREMENTAL_ORACLE)
def dedup_incremental_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-crawl incremental dedup under the value-hash gate: the
    standing corpus (doc_id % 7 <> 0) is fingerprinted once into a
    persisted VersionedTable signature index, the new batch (doc_id % 7
    = 0) joins its signatures against the INDEX SCAN plus itself, exact
    Jaccard verifies the collisions, and the batch merges into the index
    (append commit). The oracle recomputes the same md5-family bands for
    both roles — the index round-trip is exact, so the persisted path
    and the recompute agree bit-for-bit."""
    import shutil
    import tempfile

    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    work = tempfile.mkdtemp(prefix="dedup_incremental_")
    try:
        return incremental_minhash_pairs(
            corpus, batch, work, "doc_id", "text", threshold=0.5
        )
    finally:
        # candidates are checkpointed inside the operator; the returned
        # plan reads only the documents table and in-memory blocks
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Containment (asymmetric near-dup): |A ∩ B| / |A| — catches SUBSET
# duplicates Jaccard misses. A 40-token quote pasted inside a 4000-token
# page has Jaccard ~0.01 but containment ~1.0; training-data pipelines
# drop (or down-weight) the contained side. Broder's "containment" measure
# from the same resemblance paper the MinHash kernel cites (Broder 1997).
# ---------------------------------------------------------------------------


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Directed token-set containment over all pairs sharing ``block_col``:
    (doc_id, contained_in, containment) where containment(A in B) =
    |A ∩ B| / |A| >= threshold and doc_id != contained_in. Directed — a
    near-equal pair qualifies in BOTH directions, a quote-in-page pair in
    one.

    The threshold test is INTEGER arithmetic (inter * 1/t >= |A| scaled),
    so no float compare sits on the keep/drop boundary; the ratio is
    rounded only for display. Same one-shuffle block-join shape as
    :func:`jaccard_pairs` (quadratic per block by design — run inside LSH
    buckets / source shards at corpus scale, like the verify step of
    minhash_lsh_pairs)."""
    # integer threshold: inter/|A| >= num/den  <=>  inter*den >= |A|*num
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1000)
    num, den = frac.numerator, frac.denominator
    sets = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    )
    a = sets.alias("a")
    b = sets.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    size_a = F.size(F.col("a.toks"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .filter(inter * F.lit(den) >= size_a * F.lit(num))
        .select(
            F.col("a.id").alias("doc_id"),
            F.col("b.id").alias("contained_in"),
            size_a.cast("int").alias("n_tokens"),
            F.size(F.col("b.toks")).cast("int").alias("n_tokens_super"),
            inter.cast("int").alias("n_common"),
            F.round(inter.cast("double") / size_a.cast("double"), 6).alias(
                "containment"
            ),
        )
    )


@query(
    "dedup_containment",
    oracle=r"""
    WITH sets AS (
        SELECT doc_id AS id,
               lang AS block,
               list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS toks
        FROM documents
        WHERE doc_id < 200
    )
    SELECT a.id AS doc_id,
           b.id AS contained_in,
           CAST(len(a.toks) AS INT) AS n_tokens,
           CAST(len(b.toks) AS INT) AS n_tokens_super,
           CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS n_common,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / CAST(len(a.toks) AS DOUBLE), 6) AS containment
    FROM sets a
    JOIN sets b ON a.block = b.block AND a.id <> b.id
    WHERE len(list_intersect(a.toks, b.toks)) * 5 >= len(a.toks) * 4
    """,
)
def dedup_containment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment >= 0.8 over the same blocked doc_id < 200
    corpus slice as the Jaccard family — the subset-duplicate report
    (which docs are mostly inside another doc). Same sets construction as
    PAIR_EDGE_CTES, so the oracle shares its tokenization exactly."""
    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    return containment_pairs(docs, "doc_id", "text", "lang", threshold=0.8)


# ---------------------------------------------------------------------------
# Survivorship (golden record): the step AFTER matching in every entity-
# resolution pipeline — fuzzy pairs (q91's blocking + edit-distance match)
# become clusters (star-contraction CC), and each cluster elects one
# canonical record by deterministic survivorship rules. This is the
# MDM/customer-360 shape: match -> cluster -> survive.
# ---------------------------------------------------------------------------


@query(
    "dedup_survivorship",
    # Recursive-CTE closure over the SAME match graph q91 gates: rep =
    # lexicographic min of the component; survivorship rules (longest
    # name, then lexicographic max as tiebreak) are struct-max arithmetic
    # in both engines. Singletons survive as their own golden record.
    oracle="""
    WITH RECURSIVE names AS (
        SELECT p_name,
               split_part(p_name, ' ', 1) AS adj,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1, 2
    ),
    mpairs AS (
        SELECT a.p_name AS na, b.p_name AS nb
        FROM names a JOIN names b ON a.adj = b.adj AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    medges AS (
        SELECT na AS src, nb AS dst FROM mpairs
        UNION
        SELECT nb, na FROM mpairs
    ),
    reach(n, r) AS (
        SELECT p_name, p_name FROM names
        UNION
        SELECT e.dst, reach.r FROM medges e JOIN reach ON e.src = reach.n
    ),
    comp AS (SELECT n AS p_name, MIN(r) AS rep FROM reach GROUP BY 1)
    SELECT c.rep AS rep_name,
           CAST(COUNT(*) AS BIGINT) AS n_names,
           CAST(SUM(m.n_parts) AS BIGINT) AS n_parts,
           max({'l': length(m.p_name), 'nm': m.p_name}).nm AS longest_name
    FROM names m JOIN comp c USING (p_name)
    GROUP BY 1
    """,
)
def dedup_survivorship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden records over part names: q91's match graph (first-token
    blocking, Levenshtein <= 3) clustered by star-contraction connected
    components, then one survivor row per cluster — the lexicographic-min
    representative, member/row tallies, and the longest member name (the
    'most complete value wins' survivorship rule; ties broken
    lexicographically via struct comparison, identical in both engines).

    Scale shape: matching is q91's blocked pair join over DISTINCT
    entities; clustering is star-contraction (O(log^2 n) rounds of
    groupBy-min + equi-join — never diameter-bound); survivorship is one
    hash-agg over members keyed by representative. Every stage partitions
    on entity/cluster keys; nothing is driver-side."""
    part = load(spark, "part", sf_dir)
    names = (
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .withColumn("adj", F.split(F.col("p_name"), " ").getItem(0))
    )
    a = names.select(
        F.col("p_name").alias("na"), F.col("adj").alias("adj_a")
    )
    b = names.select(
        F.col("p_name").alias("nb"), F.col("adj").alias("adj_b")
    )
    mpairs = a.join(
        b,
        (F.col("adj_a") == F.col("adj_b")) & (F.col("na") < F.col("nb")),
    ).filter(F.levenshtein(F.col("na"), F.col("nb")) <= 3)
    comp = connected_components_star(
        mpairs.select(F.col("na").alias("src"), F.col("nb").alias("dst"))
    )
    members = names.join(
        comp.select(F.col("id").alias("p_name"), F.col("comp").alias("rep0")),
        "p_name",
        "left",
    ).withColumn("rep", F.coalesce(F.col("rep0"), F.col("p_name")))
    return members.groupBy(F.col("rep").alias("rep_name")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_names"),
        F.sum("n_parts").cast("bigint").alias("n_parts"),
        F.max(
            F.struct(
                F.length("p_name").alias("l"), F.col("p_name").alias("nm")
            )
        )["nm"].alias("longest_name"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtering similarity join (AllPairs/PPJoin): EXACT Jaccard pairs
# without blocking and without per-block quadratic work
# ---------------------------------------------------------------------------


def ppjoin_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact token-set Jaccard similarity join via prefix filtering
    (Bayardo et al. 2007 "Scaling Up All Pairs Similarity Search";
    Xiao et al. 2008 PPJoin) — the DETERMINISTIC scale path next to the
    probabilistic MinHash/LSH family: same exact output as brute-force
    all-pairs, no false negatives by construction, no RNG.

    Mechanics: order every document's distinct tokens by GLOBAL ascending
    document frequency (rare first, token text tie-break); a document of
    size s keeps only its first ``s - ceil(t*s) + 1`` tokens as its
    PREFIX. Any pair with Jaccard >= t provably shares the min-order
    intersection token inside BOTH prefixes, so equi-joining prefixes on
    the token generates a complete candidate set — but candidate volume
    is driven by RARE tokens (stopword-sized posting lists never reach a
    prefix at realistic thresholds, because frequent tokens sort last).
    Candidates are size-filtered (t*max(sa,sb) <= min(sa,sb) is necessary
    for J >= t) and then verified with the exact intersection count.

    Scale shape: token explode (~doc length rows), one hash-agg for df,
    a per-DOCUMENT window for prefix ranks (bounded partitions, never a
    global sort), a prefix self-equi-join whose fan-out is sum of
    prefix-posting-list^2 (small by the rare-first ordering), and a
    verification join that touches candidate pairs only. Everything is
    an equi-join or hash-agg — no crossJoin, no UDF."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
    ).localCheckpoint()  # feeds df-counts, prefixes, AND verification
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    w = Window.partitionBy("id").orderBy("df", "tok")
    prefix = (
        toks.join(dfreq, "tok")
        .withColumn("rnk", F.row_number().over(w))
        .join(sizes, "id")
        .filter(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
        )
        .select("id", "tok", "sz")
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        # length filter: J(x,y) >= t forces t*max <= min
        .filter(
            F.lit(threshold) * F.greatest("sz_a", "sz_b")
            <= F.least("sz_a", "sz_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("id_b"), "tok")
    verified = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    union = F.col("sz_a") + F.col("sz_b") - F.col("inter")
    jac = F.col("inter").cast("double") / union.cast("double")
    return verified.filter(jac >= threshold).select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    )


@query(
    "dedup_ppjoin",
    oracle=r"""
    WITH sets AS (
        SELECT doc_id AS id,
               CASE WHEN trim(text) = ''
                    THEN CAST([] AS VARCHAR[])
                    ELSE list_distinct(
                        string_split_regex(lower(trim(text)), '\s+'))
               END AS toks
        FROM documents
        WHERE doc_id < 600
    )
    SELECT a.id AS id_a,
           b.id AS id_b,
           round(
               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / CAST(len(a.toks) + len(b.toks)
                      - len(list_intersect(a.toks, b.toks)) AS DOUBLE),
               6
           ) AS jaccard
    FROM sets a
    JOIN sets b ON a.id < b.id
    WHERE len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) > 0
      AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / CAST(len(a.toks) + len(b.toks)
                 - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          >= 0.9
    """,
)
def dedup_ppjoin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard join vs a BRUTE-FORCE oracle: DuckDB
    computes ground truth as unblocked all-pairs over the same slice, so
    the hash proves the prefix filter's completeness claim (no lost pair)
    and the verification's exactness (no surviving false positive) — not
    merely that two copies of the same algorithm agree. doc_id < 600
    bounds the ORACLE's quadratic work; the Spark side is the unbounded
    scale path (cf. dedup_jaccard_pairs, which needs a blocking key and
    goes quadratic per block)."""
    docs = load(spark, "documents", sf_dir).filter(F.col("doc_id") < 600)
    return ppjoin_pairs(docs, "doc_id", "text", threshold=0.9)
