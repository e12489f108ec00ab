"""Training-dataset assembly operators: deterministic splits, benchmark
contamination checks, and domain-weighted sampling.

These are the dataset-curation steps an LLM training pipeline runs after
dedup/quality filtering (the reference has no equivalent — its pipeline
stops at warehouse tables; this extends the engine's training-data surface
alongside ``operators/dedup.py`` and ``operators/text_analysis.py``).

Determinism is the design center: every sampling/assignment decision is a
pure function of a row's content key (md5 buckets, as q42), never of RNG
state or partitioning — so retries, re-runs, backfills, and different
engines produce byte-identical datasets, and every operator here is
hash-checkable against the DuckDB oracle.

Scale shapes:
- split assignment is a narrow projection (no shuffle; the per-split
  report is one hash-agg);
- contamination is a shingle equi-join — the industry-standard n-gram
  overlap check — whose join key is a fixed-width md5 digest, so the
  shuffle moves 32-byte keys, not raw shingles; quadratic blowup is
  impossible because matches group by (corpus_doc, benchmark_doc);
- domain-weighted sampling is one small per-domain aggregate broadcast
  back onto the corpus: the fact table shuffles zero times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query

def _md5_bucket(key: Column, n_hex: int = 2) -> Column:
    """0..16^n_hex-1 integer bucket from the md5 hex prefix of a key —
    identical in Spark and DuckDB (and anything else with md5)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, n_hex), 16, 10
    ).cast("int")


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
) -> DataFrame:
    """Deterministic train/val/test assignment: a doc's split is a pure
    function of its key (256 md5 buckets, cumulative thresholds), so the
    partition is stable under re-runs, appends, and engine changes — the
    property that stops train/test leakage when a corpus is rebuilt.
    Narrow (no shuffle); the added column is one codegen'd expression."""
    bucket = _md5_bucket(F.col(key_col))
    cum = 0.0
    expr = None
    for name, frac in splits[:-1]:
        cum += frac
        cond = bucket < int(256 * cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(splits[-1][0])
    return df.withColumn("split", expr)


def shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Distinct (id, md5(shingle)) pairs: word n-grams over the family's
    shared normalization (``functions.text.tokens``), keyed by a
    fixed-width digest so downstream joins shuffle 32-byte keys instead
    of raw n-gram strings. Documents shorter than ``n`` words emit
    nothing (strict n-grams — unlike ``word_shingles``' whole-text
    fallback, matching the decontamination convention and the SQL
    oracle). The WHEN guard matters: Spark's ``sequence(1, stop)``
    produces a DESCENDING sequence when stop < 1, not an empty one."""
    from data_engineering_nd_spark.functions.text import tokens

    toks = tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .select(id_col, F.md5("shingle").alias("sh_key"))
        .dropDuplicates()
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: corpus documents sharing >=
    ``min_overlap`` distinct word ``n``-grams with any benchmark document
    (the standard eval-set decontamination join). One equi-join on the
    shingle digest + one hash-agg on the doc pair; at 100 TB the join is
    linear in total shingle count and the hot side can additionally be
    bloom-pruned by the (small) benchmark shingle set."""
    c = shingles(corpus, id_col, text_col, n).withColumnRenamed(
        id_col, "corpus_doc"
    )
    b = shingles(benchmark, id_col, text_col, n).withColumnRenamed(
        id_col, "benchmark_doc"
    )
    return (
        c.join(b, "sh_key")
        .groupBy("corpus_doc", "benchmark_doc")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= min_overlap)
    )


def domain_weighted_sample(
    df: DataFrame, domain_col: str, key_col: str, cap: int
) -> DataFrame:
    """Per-domain quota sampling: every domain keeps at most ~``cap`` rows,
    chosen deterministically by md5 bucket (so the mix is reproducible).
    The keep rule ``bucket * n_domain < 256 * cap`` is pure integer
    arithmetic — no float thresholds to diverge across engines. The
    per-domain counts are a tiny aggregate broadcast back onto the fact:
    the fact itself never shuffles."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    bucket = _md5_bucket(F.col(key_col))
    return (
        df.join(F.broadcast(counts), domain_col)
        .filter(
            (F.col("__n") <= cap)
            | (bucket * F.col("__n") < F.lit(256) * F.lit(cap))
        )
        .drop("__n")
    )


# ---------------------------------------------------------------------------
# driver queries (gate cost class: after the round's backlog — see
# registry._COST_CLASS)
# ---------------------------------------------------------------------------

_SPLIT_CASE_SQL = """
    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 204
         THEN 'train'
         WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 230
         THEN 'val'
         ELSE 'test' END
"""


@query(
    "ds_split_assignment",
    oracle=f"""
    SELECT source, {_SPLIT_CASE_SQL} AS split,
           COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
    FROM documents
    GROUP BY source, split
    """,
)
def ds_split_assignment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, split) inventory of the deterministic 80/10/10
    assignment — the report a pipeline publishes alongside a dataset build
    so the mix is auditable."""
    docs = load(spark, "documents", sf_dir)
    return (
        assign_split(docs, "doc_id")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_SHINGLE_SQL = """
    WITH toks AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(w[i:i+7], ' ')) AS sh_key
        FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
        WHERE len(w) >= 8
    )
"""


@query(
    "ds_contamination_check",
    oracle=f"""
    {_SHINGLE_SQL},
    bench AS (
        SELECT doc_id AS benchmark_doc, sh_key FROM sh
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    ),
    corp AS (
        SELECT doc_id AS corpus_doc, sh_key FROM sh
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
    )
    SELECT corpus_doc, benchmark_doc, COUNT(*) AS n_shared_shingles
    FROM corp JOIN bench USING (sh_key)
    GROUP BY corpus_doc, benchmark_doc
    HAVING COUNT(*) >= 3
    """,
)
def ds_contamination_check_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination sweep: a deterministic ~1/16 of documents plays the
    held-out benchmark; corpus docs sharing >=3 distinct 8-grams with a
    benchmark doc are flagged (the documents table's planted near-dups
    make this non-empty)."""
    docs = load(spark, "documents", sf_dir)
    is_bench = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    return contamination_pairs(
        docs.filter(~is_bench), docs.filter(is_bench), n=8, min_overlap=3
    )


@query(
    "ds_domain_mix_sample",
    oracle="""
    WITH counted AS (
        SELECT doc_id, source,
               COUNT(*) OVER (PARTITION BY source) AS n_domain,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS bucket
        FROM documents
    )
    SELECT source,
           MIN(n_domain) AS n_total,
           COUNT(CASE WHEN n_domain <= 15 OR bucket * n_domain < 256 * 15
                      THEN 1 END) AS n_kept
    FROM counted
    GROUP BY source
    """,
)
def ds_domain_mix_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing report: every source capped at ~15 docs via
    the deterministic integer-bucket rule; output is the per-domain
    before/after the pipeline logs when flattening a skewed source mix."""
    docs = load(spark, "documents", sf_dir)
    kept = domain_weighted_sample(docs, "source", "doc_id", cap=15)
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept_counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return totals.join(kept_counts, "source", "left").select(
        "source",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
