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
from pyspark.sql.window import Window

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
    # Full SQL mirror of quality_score/stopword_ratio (functions/text.py):
    # same stopword literals, same arithmetic order, same round placement.
    oracle=r"""
    WITH t AS (
        SELECT
            doc_id,
            length(text) AS n_chars_actual,
            string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE)
            END AS praw
        FROM documents
    ), s AS (
        SELECT
            doc_id, n_chars_actual, praw,
            CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['the','a','an','and','or','but','if','then','of','to','in',
                         'on','for','with','at','by','from','is','are','was','were',
                         'be','been','it','this','that','as','not','no','so','we',
                         'you','they','he','she','has','have','had','will','would'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE)
            END AS sraw
        FROM t
    )
    SELECT
        doc_id,
        n_chars_actual,
        n_tokens,
        round(praw, 4) AS punct_ratio,
        round(sraw, 4) AS stopword_ratio,
        round((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
               + (1.0 - abs(sraw - 0.4))
               + (1.0 - least(praw * 4, 1.0))) / 3.0, 4) AS quality_score
    FROM s
    """,
)
def text_quality_scores_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return text_stats(docs, "doc_id", "text")


@query(
    "text_token_count_by_source",
    oracle=r"""
    SELECT
        source,
        CAST(SUM(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))) AS BIGINT) AS total_tokens,
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


@query(
    "text_detect_language",
    # Argmax over the 4 marker-hit ratios; tie-break = lexicographically
    # smallest language code (mirrors the struct-greatest trick in
    # detect_language above, so the CASE checks de < en < es < fr in order).
    oracle=r"""
    WITH t AS (
        SELECT
            doc_id,
            string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT
            doc_id,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['the','and','of','to','in','is','that','for','with','on'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_en,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['el','la','de','que','y','en','un','una','los','las'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_es,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['le','la','de','et','les','des','un','une','est','dans'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_fr,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['der','die','das','und','ist','von','mit','den','ein','eine'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_de
        FROM t
    )
    SELECT
        doc_id,
        CASE WHEN greatest(s_en, s_es, s_fr, s_de) >= 0.05 THEN
            CASE WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
                 WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                 WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                 ELSE 'fr' END
        ELSE 'unknown' END AS predicted_lang,
        greatest(s_en, s_es, s_fr, s_de) AS lang_score
    FROM s
    """,
)
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


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher/C4-style quality filters): how much of a
# document is the same word over and over. The distributed shape is
# explode -> (doc, word) hash-aggregate (map-side partial combine does the
# heavy lifting: per-partition word counts are tiny) -> per-doc rollup.
# Both shuffles key on doc_id+word / doc_id — no skew beyond document
# length, which the explode already spreads across partitions.
# ---------------------------------------------------------------------------


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document word-repetition profile: word count, distinct words,
    duplicate-word ratio, and the dominant word + its mass fraction
    (ties break lexicographically for cross-engine determinism)."""
    from pyspark.sql.window import Window

    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.desc("c"), "w")
    )
    per_doc = (
        wc.withColumn("rn", rn)
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("distinct_words"),
            F.max(F.when(F.col("rn") == 1, F.col("w"))).alias("top_word"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("top_word_count"),
        )
    )
    n = F.col("n_words").cast("double")
    return per_doc.select(
        id_col,
        "n_words",
        "distinct_words",
        F.round(
            F.lit(1.0) - F.col("distinct_words").cast("double") / n, 4
        ).alias("dup_word_ratio"),
        "top_word",
        "top_word_count",
        F.round(F.col("top_word_count").cast("double") / n, 4).alias(
            "top_word_ratio"
        ),
    )


@query(
    "text_repetition_metrics",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
        SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY c DESC, w
        ) AS rn FROM wc
    )
    SELECT
        doc_id,
        CAST(SUM(c) AS BIGINT) AS n_words,
        COUNT(*) AS distinct_words,
        round(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS dup_word_ratio,
        MAX(CASE WHEN rn = 1 THEN w END) AS top_word,
        MAX(CASE WHEN rn = 1 THEN c END) AS top_word_count,
        round(
            MAX(CASE WHEN rn = 1 THEN c END) / CAST(SUM(c) AS DOUBLE), 4
        ) AS top_word_ratio
    FROM ranked GROUP BY doc_id
    """,
)
def text_repetition_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return repetition_metrics(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# PII detection / redaction. Patterns are written in the common subset of
# Java regex (Spark) and RE2 (DuckDB): no lookaround, no backreferences,
# non-capturing groups only — which is also what keeps them cheap enough to
# run inside codegen over 100 TB. Redaction order is fixed (email, ssn,
# phone, ip) so outputs are reproducible.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def detect_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document match counts for every PII pattern, plus a has_pii
    flag. Pure column expressions — narrow, codegen'd, no shuffle."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(
            f"n_{name}"
        )
        for name, pat in PII_PATTERNS.items()
    ]
    keep = [c for c in df.columns if c not in (id_col, text_col)]
    out = df.select(F.col(id_col), *keep, *counts)
    any_pii = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn("has_pii", any_pii)


def redact_pii(text_col: str) -> Column:
    """Replace every PII match with a typed placeholder ([EMAIL], [SSN],
    [PHONE], [IPV4]), applied in fixed pattern order."""
    col = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, f"[{name.upper()}]")
    return col


@query(
    "text_pii_scan",
    oracle=r"""
    SELECT
        source,
        COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
            AS n_email,
        CAST(SUM(len(regexp_extract_all(text,
            '\b\d{3}-\d{2}-\d{4}\b'))) AS BIGINT) AS n_ssn,
        CAST(SUM(CASE WHEN
            regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
            OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')
            OR regexp_matches(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')
            OR regexp_matches(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')
        THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
    FROM documents
    GROUP BY source
    """,
)
def text_pii_scan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level PII audit by source. (The synthetic corpus is PII-free —
    zero counts here; the pattern semantics are pinned by handcrafted unit
    tests in tests/test_quality.py.)"""
    docs = load(spark, "documents", sf_dir)
    pii = detect_pii(docs.select("doc_id", "source", "text"), "doc_id", "text")
    return pii.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_email"),
        F.sum("n_ssn").cast("bigint").alias("n_ssn"),
        F.sum(F.col("has_pii").cast("int")).cast("bigint").alias("n_docs_with_pii"),
    )


# ---------------------------------------------------------------------------
# Composite corpus-filter decision (C4/Gopher-style): every heuristic
# signal evaluated in ONE narrow projection — token count, stopword and
# punctuation density, distinct-token repetition, PII flags — folded into a
# keep/drop decision with the first failing rule as the reason. No shuffle
# anywhere: this is the shape that filters 100 TB at scan speed.
# ---------------------------------------------------------------------------

#: (reason, rule) in priority order; first match wins.
FILTER_RULES: tuple[tuple[str, str], ...] = (
    ("too_short", "n_tokens < 20"),
    ("high_punct", "punct_ratio > 0.10"),
    ("low_stopword", "stopword_ratio < 0.02"),
    ("high_repetition", "dup_token_ratio > 0.60"),
    ("has_pii", "any PII pattern matches"),
)


def filter_decisions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document keep/drop decision with audit columns. All ratios are
    rounded to 4 dp BEFORE thresholding so boundary comparisons are
    engine-independent (same contract as the rest of this module)."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    dup = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double")
    )
    pii_any = None
    for pat in PII_PATTERNS.values():
        c = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)) > 0
        pii_any = c if pii_any is None else (pii_any | c)

    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(dup, 4).alias("dup_token_ratio"),
        pii_any.alias("has_pii"),
    )
    reason = (
        F.when(F.col("n_tokens") < 20, F.lit("too_short"))
        .when(F.col("punct_ratio") > 0.10, F.lit("high_punct"))
        .when(F.col("stopword_ratio") < 0.02, F.lit("low_stopword"))
        .when(F.col("dup_token_ratio") > 0.60, F.lit("high_repetition"))
        .when(F.col("has_pii"), F.lit("has_pii"))
        .otherwise(F.lit("ok"))
    )
    return base.withColumn("reason", reason).withColumn(
        "decision",
        F.when(F.col("reason") == "ok", F.lit("keep")).otherwise(F.lit("drop")),
    )


@query(
    "text_filter_decision",
    oracle=r"""
    WITH t AS (
        SELECT
            doc_id,
            text,
            string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
            CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE)
            END AS praw
        FROM documents
    ), s AS (
        SELECT
            doc_id,
            CAST(len(toks) AS BIGINT) AS n_tokens,
            round(praw, 4) AS punct_ratio,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['the','a','an','and','or','but','if','then','of','to','in',
                         'on','for','with','at','by','from','is','are','was','were',
                         'be','been','it','this','that','as','not','no','so','we',
                         'you','they','he','she','has','have','had','will','would'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 4) AS stopword_ratio,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 4) AS dup_token_ratio,
            (regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
             OR regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')
             OR regexp_matches(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')
             OR regexp_matches(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS has_pii
        FROM t
    ), r AS (
        SELECT *,
            CASE WHEN n_tokens < 20 THEN 'too_short'
                 WHEN punct_ratio > 0.10 THEN 'high_punct'
                 WHEN stopword_ratio < 0.02 THEN 'low_stopword'
                 WHEN dup_token_ratio > 0.60 THEN 'high_repetition'
                 WHEN has_pii THEN 'has_pii'
                 ELSE 'ok' END AS reason
        FROM s
    )
    SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, dup_token_ratio,
           has_pii, reason,
           CASE WHEN reason = 'ok' THEN 'keep' ELSE 'drop' END AS decision
    FROM r
    """,
)
def text_filter_decision_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return filter_decisions(docs, "doc_id", "text")


def tfidf_top_terms(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document, fully distributed.

    Classic training-corpus weighting: tf = term count within the document,
    idf = ln(N / df) with df = number of documents containing the term.
    Tokenization is a plain whitespace split (matching the oracle's
    string_split); N arrives via a broadcast single-row aggregate, never a
    driver-side collect. Scores are rounded to 6 dp before ranking so the
    (score DESC, term ASC) order is total and engine-independent.

    Scale: two hash aggregates on (doc, term) / (term) — both map-side
    combined — plus one per-document window for the top-k. The widest
    shuffle key is (doc_id, term), which is near-unique, so skew is bounded
    by the most repetitive single document, not the corpus.
    """
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = words.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    words AS (SELECT doc_id, term FROM w WHERE term <> ''),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT
            tf.doc_id,
            tf.term,
            round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
)
def text_tfidf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


def unigram_logprob_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    unigram model — the CCNet-style LM-perplexity quality filter, reduced
    to its scalable skeleton (a real deployment swaps the unigram table
    for KenLM scores; the join/agg shape is identical).

    Shape: one explode -> one token-count agg (the "model", ~|vocab| rows)
    -> broadcast join back onto the exploded tokens -> per-doc agg. The
    token fact shuffles once on doc id; the model is broadcast, never
    shuffled. Low scores = typical text, high scores = outlier/garbage.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    neg_ll = -F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.round(F.avg(neg_ll), 4).alias("mean_neg_logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


@query(
    "text_unigram_logprob",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT SUM(cnt) AS total FROM vocab)
    SELECT
        t.doc_id,
        round(AVG(-ln(CAST(v.cnt AS DOUBLE) / CAST(total.total AS DOUBLE))), 4)
            AS mean_neg_logprob,
        COUNT(*) AS n_tokens
    FROM toks t JOIN vocab v USING (tok), total
    GROUP BY t.doc_id
    ORDER BY mean_neg_logprob DESC, doc_id
    LIMIT 100
    """,
)
def text_unigram_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 most-surprising documents under the corpus unigram model (the
    quality-filter ranking a pipeline thresholds on)."""
    docs = load(spark, "documents", sf_dir)
    return (
        unigram_logprob_score(docs)
        .orderBy(F.desc("mean_neg_logprob"), "doc_id")
        .limit(100)
    )


def bigram_logprob_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log P(w_i | w_{i-1}) under the corpus's
    own bigram MLE — the next step up from unigram_logprob_score toward a
    real LM-perplexity filter, with the same swap-in point for KenLM.

    Bigram pairs are built with a JVM-side transform over an index
    sequence (one pass per doc, no window, no Python), then exploded. The
    model is two hash-aggregates — conditional counts c(w1,w2) and context
    counts c(w1) — joined back onto the bigram stream. Both model joins
    key on near-uniform word hashes; AQE picks broadcast when the model
    fits (it always does for the context table, |vocab| rows). Per-doc
    rollup shuffles once on doc id."""
    from data_engineering_nd_spark.functions.text import _bind

    def pairs_of(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    bg = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(_bind(tokens(text_col), pairs_of)).alias("bg"),
    ).select("__id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    m12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    m1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    neg_ll = -F.log(F.col("c12").cast("double") / F.col("c1").cast("double"))
    return (
        bg.join(m12, ["w1", "w2"])
        .join(F.broadcast(m1), "w1")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.round(F.avg(neg_ll), 4).alias("mean_neg_logprob_bigram"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


@query(
    "text_bigram_logprob",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents WHERE trim(text) <> ''
    ),
    seq AS (
        SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
        FROM t
    ),
    bg AS (
        SELECT doc_id, tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        FROM seq QUALIFY w2 IS NOT NULL
    ),
    m12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    m1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1)
    SELECT b.doc_id,
           round(AVG(-ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))), 4)
               AS mean_neg_logprob_bigram,
           COUNT(*) AS n_bigrams
    FROM bg b JOIN m12 USING (w1, w2) JOIN m1 USING (w1)
    GROUP BY b.doc_id
    ORDER BY mean_neg_logprob_bigram DESC, doc_id
    LIMIT 100
    """,
)
def text_bigram_logprob_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 most-surprising documents under the corpus bigram model."""
    docs = load(spark, "documents", sf_dir)
    return (
        bigram_logprob_score(docs)
        .orderBy(F.desc("mean_neg_logprob_bigram"), "doc_id")
        .limit(100)
    )


@query(
    "text_redact_pii",
    # Redaction is pure regexp_replace chains in the Java∩RE2 subset, so
    # the whole transform round-trips through the oracle: every doc's
    # redacted text value-hashes against DuckDB applying the identical
    # patterns in the identical fixed order. (The synthetic corpus is
    # PII-free, so redacted == original here; the pattern semantics are
    # pinned by handcrafted docs in tests/test_quality.py.)
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                       '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
               '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IPV4]', 'g') AS redacted_text
    FROM documents
    """,
)
def text_redact_pii_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacted copy of every document (typed placeholders, fixed pattern
    order) — one narrow shuffle-free projection."""
    docs = load(spark, "documents", sf_dir)
    return docs.select("doc_id", redact_pii("text").alias("redacted_text"))


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    max_df: int = 100,
) -> DataFrame:
    """Sparse near-duplicate pairs by TF-IDF cosine over an inverted
    index — the classic IR construction, complementing the dense
    embedding-cosine path in ``operators.dedup``.

    Pipeline: (doc, term, tf) -> df-capped idf weights -> L2-normalize per
    doc -> self-join the postings on term -> sum of weight products per
    pair = cosine. The ``max_df`` cap is the scale guard AND a quality
    choice: terms in more than ``max_df`` documents contribute near-zero
    idf anyway, and dropping them bounds every posting list, so the
    term-keyed self-join emits at most df² pairs per term — never the
    corpus quadratic. All shuffles key on term or (id_a, id_b); document
    text never moves. Cosines are rounded to 4 dp before thresholding so
    the cross-engine comparison is exact."""
    words = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = (
        words.groupBy("term")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") <= max_df)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfc, "term")
        .join(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("wt"),
        )
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm"))
    wn = w.join(norms, "id").select(
        "id", "term", (F.col("wt") / F.col("nrm")).alias("wn")
    )
    a, b = wn.alias("a"), wn.alias("b")
    return (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.round(F.sum(F.col("a.wn") * F.col("b.wn")), 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


@query(
    "text_tfidf_cosine_pairs",
    oracle=r"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), words2 AS (
        SELECT doc_id, term FROM words WHERE term <> ''
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM words2 GROUP BY 1, 2
    ), dfc AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM words2
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) <= 100
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), w AS (
        SELECT doc_id, tf.term,
               CAST(tf.tf AS DOUBLE)
               * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfc.df AS DOUBLE)) AS wt
        FROM tf JOIN dfc ON tf.term = dfc.term, n
    ), norms AS (
        SELECT doc_id, sqrt(SUM(wt * wt)) AS nrm FROM w GROUP BY 1
    ), wn AS (
        SELECT w.doc_id, term, wt / nrm AS wn FROM w JOIN norms USING (doc_id)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(SUM(a.wn * b.wn), 4) AS cosine_sim
    FROM wn a JOIN wn b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING round(SUM(a.wn * b.wn), 4) >= 0.8
    """,
)
def text_tfidf_cosine_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at TF-IDF cosine >= 0.8 (df-capped inverted index)."""
    docs = load(spark, "documents", sf_dir)
    return tfidf_cosine_pairs(docs, "doc_id", "text")


@query(
    "text_pretoken_stats",
    # Same pattern string on both sides (PRETOKEN_PATTERN is inside the
    # Java-regex ∩ RE2 subset — no lookahead, leftmost-first alternation
    # in both engines), so the per-class splits value-hash exactly.
    oracle=r"""
    WITH p AS (
        SELECT doc_id,
               regexp_extract_all(text,
                   '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'
               ) AS pts,
               length(text) AS n_chars
        FROM documents
    )
    SELECT doc_id,
           CAST(len(pts) AS BIGINT) AS n_pretokens,
           CAST(len(list_filter(pts, x -> regexp_matches(x, '^ ?[A-Za-z]+$')))
                AS BIGINT) AS n_word,
           CAST(len(list_filter(pts, x -> regexp_matches(x, '^ ?[0-9]+$')))
                AS BIGINT) AS n_numeric,
           round(CASE WHEN n_chars = 0 THEN 0.0
                      ELSE CAST(len(pts) AS DOUBLE) / CAST(n_chars AS DOUBLE)
                 END, 4) AS pretokens_per_char
    FROM p
    """,
)
def text_pretoken_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE pre-token accounting per document: total pre-tokens, word and
    digit-run classes, and the pretokens-per-char ratio (the standard
    cheap proxy for post-BPE token cost — high ratios flag text that will
    tokenize expensively). One narrow shuffle-free projection: the regex
    runs JVM-side in whole-stage codegen, counting 100 TB at scan speed
    alongside the other text signals."""
    from data_engineering_nd_spark.functions.text import pretokens

    docs = load(spark, "documents", sf_dir)
    pts = pretokens("text")
    n_chars = F.length("text")
    return docs.select(
        "doc_id",
        F.size(pts).cast("bigint").alias("n_pretokens"),
        F.size(F.filter(pts, lambda x: x.rlike("^ ?[A-Za-z]+$")))
        .cast("bigint")
        .alias("n_word"),
        F.size(F.filter(pts, lambda x: x.rlike("^ ?[0-9]+$")))
        .cast("bigint")
        .alias("n_numeric"),
        F.round(
            F.when(n_chars == 0, F.lit(0.0)).otherwise(
                F.size(pts).cast("double") / n_chars.cast("double")
            ),
            4,
        ).alias("pretokens_per_char"),
    )


def entropy_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document word-distribution entropy: Shannon entropy in bits of
    the token frequency distribution, plus the normalized form (entropy /
    log2(n_types), in [0,1]). Low entropy flags templated/repetitive text
    that ratio-based repetition metrics can miss; it is the
    information-theoretic cousin of dup_token_ratio in
    ``repetition_metrics``.

    Determinism contract: H = log2(n) - (1/n) * sum(c * log2(c)) — the
    per-term doubles are rounded to 1e-6 and summed as INTEGERS, so the
    cross-engine value hash never rides on float summation order (the
    same e4/e6 trick as ds_quality_gate's score masses). The reported
    entropy derives from exact integers through one identical expression
    in both engines.

    Scale shape: one explode to token rows, two hash-aggs
    ((doc, token) then doc) — the inverted-index shuffle on near-uniform
    keys; text itself never shuffles."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tc = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = tc.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(
            F.round(F.col("c").cast("double") * F.log2(F.col("c").cast("double")) * 1e6, 0).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("sum_clog2c_e6"),
    )
    ent = F.log2(F.col("n_tokens")) - (
        F.col("sum_clog2c_e6").cast("double") / F.lit(1000000.0)
    ) / F.col("n_tokens")
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_types",
        F.round(ent, 4).alias("entropy_bits"),
        F.when(F.col("n_types") > 1, F.round(ent / F.log2(F.col("n_types")), 4))
        .otherwise(F.lit(0.0))
        .alias("normalized_entropy"),
    )


@query(
    "text_entropy_metrics",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
    d AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT)
                   AS sum_clog2c_e6
        FROM tc GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           round(log2(n_tokens)
                 - (CAST(sum_clog2c_e6 AS DOUBLE) / 1000000.0) / n_tokens, 4)
               AS entropy_bits,
           CASE WHEN n_types > 1
                THEN round((log2(n_tokens)
                            - (CAST(sum_clog2c_e6 AS DOUBLE) / 1000000.0) / n_tokens)
                           / log2(n_types), 4)
                ELSE 0.0 END AS normalized_entropy
    FROM d
    """,
)
def text_entropy_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return entropy_metrics(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# Vocabulary tokenization (encode): the step between tokenizer induction
# (ds_bpe_merge_candidates trains; this applies) and sequence packing
# ---------------------------------------------------------------------------


def vocab_encode_summary(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 256
) -> DataFrame:
    """Encode every document against a corpus-derived word vocabulary and
    return a verifiable per-document encoding summary.

    Vocabulary: the ``vocab_size`` most frequent corpus words (count
    DESC, word ASC tie-break), token id = rank 1..V; out-of-vocabulary
    words map to id V+1 (the single UNK id). Rather than returning the
    encoded id arrays (huge, and pointless to hash through the driver),
    each document reports its token/OOV counts plus a position-weighted
    checksum sum((pos+1) * id) — order-sensitive, so the checksum equals
    the oracle's ONLY if every token id AND its position match: the full
    encoding is verified without materializing it.

    Scale shape: vocab = one corpus explode + hash-agg, then
    TakeOrderedAndProject top-V (bounded heap per partition + driver
    merge of V·partitions rows — no global sort) and a V-row window for
    ranks; encoding = one posexplode + broadcast hash join on the V-row
    vocab + one per-doc hash-agg. The corpus is read twice, shuffled only
    by doc_id for the final agg; ids stay in exact BIGINT arithmetic."""
    unk = vocab_size + 1
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = wc.orderBy(F.desc("n"), "w").limit(vocab_size)
    w_rank = Window.orderBy(F.desc("n"), "w")
    vocab = top.withColumn("token_id", F.row_number().over(w_rank)).select(
        "w", "token_id"
    )
    enc = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "w")
    ).join(F.broadcast(vocab), "w", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(unk))
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count(F.when(F.col("token_id").isNull(), F.lit(1)))
        .cast("bigint")
        .alias("n_oov"),
        F.sum((F.col("pos") + 1).cast("bigint") * tid.cast("bigint"))
        .cast("bigint")
        .alias("encoding_checksum"),
    )


@query(
    "text_vocab_encode",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        FROM documents
        WHERE trim(text) <> ''
    ),
    wc AS (
        SELECT w, COUNT(*) AS n
        FROM (SELECT unnest(w) AS w FROM t)
        GROUP BY w
    ),
    vocab AS (
        SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) AS INTEGER)
                   AS token_id
        FROM wc ORDER BY n DESC, w LIMIT 256
    ),
    enc AS (
        SELECT t.doc_id, CAST(p AS BIGINT) AS pos, t.w[CAST(p AS INT)] AS tok
        FROM t, unnest(range(1, len(w) + 1)) AS u(p)
    )
    SELECT enc.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           CAST(SUM(pos * COALESCE(v.token_id, 257)) AS BIGINT)
               AS encoding_checksum
    FROM enc LEFT JOIN vocab v ON enc.tok = v.w
    GROUP BY enc.doc_id
    """,
)
def text_vocab_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vocabulary encoding summary for every document: top-256
    word vocabulary (id = frequency rank), per-doc token/OOV counts, and
    the position-weighted checksum that value-verifies the entire encoded
    sequence — ids and order — against the SQL mirror."""
    from data_engineering_nd_spark.catalog import ensure_parallelism

    docs = ensure_parallelism(load(spark, "documents", sf_dir))
    return vocab_encode_summary(docs, "doc_id", "text", vocab_size=256)


# ---------------------------------------------------------------------------
# BM25 ranking: the production lexical retrieval scorer (tf saturation +
# document-length normalization), completing the lexical family alongside
# the raw TF-IDF weights above.
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under Okapi BM25
    (Robertson et al.): score(d, Q) = sum over t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avg_len)),
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1).

    Determinism: tf/df/len/avg_len are exact integers (avg_len is kept as
    the exact total/count division); per-term scores are rounded to 6 dp
    and SUMMED AS e6-SCALED BIGINTs, so the document score is an exact
    integer sum — no float-accumulation order hazard across terms — and
    only the final display value returns to DOUBLE. Ranking is
    (score DESC, doc_id) — total.

    Scale: terms filter pushes into the (doc, term) explode before the tf
    aggregate; df and the corpus stats are term-count-sized broadcasts;
    the final top-k is TakeOrderedAndProject-eligible."""
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    lens = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("len_d"))
    stats = lens.agg(
        F.sum("len_d").cast("bigint").alias("total_len"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    qw = words.filter(F.col("term").isin(query_terms))
    tf = qw.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = qw.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    return _bm25_rank(tf, df_counts, lens, stats, id_col, k)


def _bm25_rank(
    tf: DataFrame,
    df_counts: DataFrame,
    lens: DataFrame,
    stats: DataFrame,
    id_col: str,
    k: int,
) -> DataFrame:
    """The BM25 scoring tail shared by the from-text path (bm25_topk) and
    the inverted-index path (incremental_bm25_topk): identical arithmetic
    from (tf, df, len, corpus stats) components, whatever produced them."""
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    avg_len = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    denom = F.col("tf").cast("double") + F.lit(_BM25_K1) * (
        F.lit(1.0 - _BM25_B)
        + F.lit(_BM25_B) * F.col("len_d").cast("double") / avg_len
    )
    term_score = idf * F.col("tf").cast("double") * F.lit(_BM25_K1 + 1.0) / denom
    per_term = (
        tf.join(F.broadcast(df_counts), "term")
        .join(lens, id_col)
        .join(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.floor(term_score * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("score_e6"),
        )
    )
    scored = per_term.groupBy(id_col).agg(
        F.sum("score_e6").cast("bigint").alias("e6"),
        F.count(F.lit(1)).cast("bigint").alias("n_matched_terms"),
    )
    return (
        scored.orderBy(F.desc("e6"), id_col)
        .limit(k)
        .select(
            F.col(id_col),
            "n_matched_terms",
            (F.col("e6").cast("double") / F.lit(1e6)).alias("bm25_score"),
        )
    )


#: full-corpus BM25 for the fixed query terms — the oracle of BOTH the
#: from-text query (text_bm25_topk) and the incremental-index query
#: (text_incremental_bm25): the served index path must reproduce the
#: batch recompute exactly.
_BM25_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    words AS (SELECT doc_id, term FROM w WHERE term <> ''),
    lens AS (SELECT doc_id, COUNT(*) AS len_d FROM words GROUP BY 1),
    stats AS (
        SELECT CAST(SUM(len_d) AS BIGINT) AS total_len,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM lens
    ),
    qw AS (
        SELECT doc_id, term FROM words
        WHERE term IN ('scan', 'join', 'window', 'stream')
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qw GROUP BY 1, 2),
    dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qw GROUP BY 1),
    per_term AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                      / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                   * CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0}
                   / (CAST(tf AS DOUBLE) + {_BM25_K1}
                      * ({1.0 - _BM25_B} + {_BM25_B} * CAST(len_d AS DOUBLE)
                         / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
                   * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        FROM tf
        JOIN dfc USING (term)
        JOIN lens USING (doc_id)
        CROSS JOIN stats
    ),
    scored AS (
        SELECT doc_id,
               CAST(SUM(score_e6) AS BIGINT) AS e6,
               CAST(COUNT(*) AS BIGINT) AS n_matched_terms
        FROM per_term GROUP BY doc_id
    )
    SELECT doc_id, n_matched_terms,
           CAST(e6 AS DOUBLE) / 1000000.0 AS bm25_score
    FROM scored
    ORDER BY e6 DESC, doc_id
    LIMIT 10
    """


@query("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the fixed query {scan, join, window, stream} over
    the documents corpus — tf saturation, document-length normalization,
    and the e6-integer score accumulation all value-hashed cross-engine."""
    docs = load(spark, "documents", sf_dir)
    return bm25_topk(docs, ["scan", "join", "window", "stream"], k=10)


# ---------------------------------------------------------------------------
# BPE encode: apply a LEARNED merge list iteratively — the tokenizer inner
# loop (ds_bpe_merge_candidates ranks merges; this APPLIES them).
# ---------------------------------------------------------------------------

#: fixed learned merge table for the gate (rank = priority, lower first).
#: Deliberately includes rank-order traps over the corpus vocabulary:
#: "agg" sees both (g,g)@8 and (a,g)@9 — min-rank must pick gg;
#: "row" sees (r,o)@11 and (o,w)@12 — and chains ((t,h)->(th,e),
#: (i,n)->(in,e)) that need multiple rounds.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("e", "r"), ("o", "r"), ("a", "t"),
    ("s", "t"), ("a", "n"), ("i", "n"), ("g", "g"), ("a", "g"),
    ("in", "e"), ("r", "o"), ("o", "w"),
]


#: separator inside pair keys — pairs compare as (left, right) SYMBOL
#: tuples, never concatenations: ("a","bc") and ("ab","c") must differ.
#: Tab is collision-safe (symbols come from whitespace-split tokens) and
#: keeps plan dumps (PLANS.md) plain text, unlike a NUL byte
_BPE_SEP = "\t"
#: above this merge-table size the literal-expression strategy would bloat
#: the plan; fall back to per-round broadcast joins
_BPE_LITERAL_MAX = 256


def _bpe_pair_keys(syms: Column) -> Column:
    """Adjacent-pair keys of a symbol array (empty for 0/1-symbol words —
    the guard also keeps sequence() from going descending)."""
    return F.when(
        F.size(syms) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat(
                F.element_at(syms, i), F.lit(_BPE_SEP), F.element_at(syms, i + 1)
            ),
        )
    )


def _bpe_merge_fold(
    syms: Column, lft: Column, rgt: Column, merged: Column
) -> Column:
    """One left-to-right non-overlapping merge pass over ``syms`` as an
    O(n) JVM fold (``F.aggregate`` with an (out, held) struct
    accumulator): the held symbol merges with the next exactly when the
    two equal the chosen (lft, rgt) pair, so a freshly merged token
    cannot re-pair within the same pass — GPT-2 ``bpe()`` semantics."""
    return F.aggregate(
        syms,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(None).cast("string").alias("held"),
        ),
        lambda acc, s: F.when(
            acc["held"].isNull(),
            F.struct(acc["out"].alias("out"), s.alias("held")),
        )
        .when(
            (acc["held"] == lft) & (s == rgt),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("held"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["held"])).alias("out"),
                s.alias("held"),
            )
        ),
        lambda acc: F.when(acc["held"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["held"]))
        ),
    )


def bpe_encode(
    words: DataFrame,
    word_col: str,
    merges: list[tuple[str, str]],
    max_rounds: int = 6,
    early_stop: bool = True,
    strategy: str | None = None,
) -> DataFrame:
    """Apply a learned BPE merge list to every word (GPT-2 ``bpe()``
    semantics, distributed): per round, each word merges ALL occurrences
    of its lowest-ranked applicable pair (left-to-right, non-overlapping,
    via :func:`_bpe_merge_fold`); rounds repeat until no pair applies or
    ``max_rounds``.

    Two rank-selection strategies:

    - ``literal`` (default for <= 256 merges): the merge table rides into
      the plan as a literal map (pair-key → rank) plus rank-indexed
      literal arrays, so choosing the min-rank pair and merging are pure
      NARROW projections — zero shuffles, zero joins, whatever the vocab
      size. Each round is one map stage.
    - ``join`` (production-size tables, e.g. a 50k-merge tokenizer):
      per round, explode the current pairs, broadcast-join the merge
      table, take the per-word min rank — one vocab-keyed shuffle per
      round, merge table only ever broadcast.

    Convergence: every applied round strictly shrinks some word, so
    rounds needed <= min(max word length, len(merges)); with
    ``early_stop`` the loop also stops after the first round in which no
    word changed (one driver action per round). Either way, callers
    verify completion via :func:`bpe_remaining_pairs` (value-hashed in
    the gate) rather than trusting the bound. localCheckpoint per round
    keeps the plan constant-size — without it the round expressions nest
    multiplicatively.

    Scale shape: run this on the WORD VOCABULARY (Zipf-bounded), then
    join encodings back to the corpus by word — the corpus itself is
    never re-scanned per round.

    Returns ``words`` plus ``syms`` (final symbol array) and
    ``rounds_applied``."""
    if strategy is None:
        strategy = "literal" if len(merges) <= _BPE_LITERAL_MAX else "join"
    spark = words.sparkSession
    w = F.col(word_col)
    state = words.select(
        "*",
        F.transform(
            F.sequence(F.lit(1), F.length(w)), lambda i: F.substr(w, i, F.lit(1))
        ).alias("syms"),
        F.lit(0).alias("rounds_applied"),
    ).localCheckpoint()
    carry = list(words.columns)

    if strategy == "literal":
        rank_map = F.create_map(
            *[
                c
                for i, (l, r) in enumerate(merges)
                for c in (F.lit(l + _BPE_SEP + r), F.lit(i))
            ]
        )
        lfts = F.array(*[F.lit(l) for l, _ in merges])
        rgts = F.array(*[F.lit(r) for _, r in merges])
        mrgs = F.array(*[F.lit(l + r) for l, r in merges])
        for _ in range(max_rounds):
            ranks = F.filter(
                F.transform(
                    _bpe_pair_keys(F.col("syms")),
                    lambda k: F.element_at(rank_map, k),
                ),
                lambda x: x.isNotNull(),
            )
            # stage the chosen rank/pair as NAMED columns before the fold:
            # embedding these higher-order expressions directly inside the
            # fold's lambda nests lambda scopes and mis-binds variables;
            # as multi-use non-cheap aliases they also survive
            # CollapseProject, so the staging is not re-inlined
            staged = state.select(
                *carry,
                "syms",
                "rounds_applied",
                F.array_min(ranks).alias("__best"),  # null: no pair applies
            ).select(
                "*",
                F.element_at(lfts, F.col("__best") + 1).alias("__lft"),
                F.element_at(rgts, F.col("__best") + 1).alias("__rgt"),
                F.element_at(mrgs, F.col("__best") + 1).alias("__mrg"),
            )
            state = staged.select(
                *carry,
                F.when(F.col("__best").isNull(), F.col("syms"))
                .otherwise(
                    _bpe_merge_fold(
                        F.col("syms"),
                        F.col("__lft"),
                        F.col("__rgt"),
                        F.col("__mrg"),
                    )
                )
                .alias("syms"),
                (
                    F.col("rounds_applied")
                    + F.when(F.col("__best").isNull(), 0).otherwise(1)
                ).alias("rounds_applied"),
                F.col("__best").isNotNull().alias("__changed"),
            )
            # the changed-count witness rides the checkpoint job itself
            # (observe) — no separate filter/isEmpty action per round
            from pyspark.sql import Observation

            ob = Observation()
            state = state.observe(
                ob,
                F.sum(F.when(F.col("__changed"), 1).otherwise(0)).alias("c"),
            ).localCheckpoint()
            if early_stop and not ob.get["c"]:
                break
        return state.drop("__changed")

    mt = spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, lft string, rgt string, merged string",
    )
    for _ in range(max_rounds):
        pr = state.filter(F.size("syms") >= 2).select(
            w.alias("__w"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("lft"),
                        F.element_at("syms", i + 1).alias("rgt"),
                    ),
                )
            ).alias("p"),
        ).select("__w", "p.lft", "p.rgt")
        # checkpoint + observe: the old isEmpty probe executed the
        # pr-join-agg subplan once, then the state join re-executed it —
        # now it runs once per round and the emptiness witness rides the
        # same job
        from pyspark.sql import Observation

        ob = Observation()
        chosen = (
            pr.join(F.broadcast(mt), ["lft", "rgt"])
            .groupBy("__w")
            .agg(F.min("rank").alias("rank"))
            .join(F.broadcast(mt), "rank")
            .select("__w", "lft", "rgt", "merged")
            .observe(ob, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if early_stop and ob.get["n"] == 0:
            break
        st = state.join(chosen, state[word_col] == chosen["__w"], "left")
        folded = _bpe_merge_fold(
            F.col("syms"), F.col("lft"), F.col("rgt"), F.col("merged")
        )
        state = st.select(
            *carry,
            F.when(F.col("__w").isNull(), F.col("syms"))
            .otherwise(folded)
            .alias("syms"),
            (
                F.col("rounds_applied")
                + F.when(F.col("__w").isNull(), 0).otherwise(1)
            ).alias("rounds_applied"),
        ).localCheckpoint()
    return state


def bpe_remaining_pairs(
    encoded: DataFrame, word_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Per-word count of merge-table pairs still applicable to ``syms`` —
    the convergence PROOF for :func:`bpe_encode` (0 everywhere when the
    loop ran to fixpoint), value-hashed in the gate rather than assumed.
    A narrow projection: the pair keys probe the same literal map the
    literal strategy encodes with."""
    rank_map = F.create_map(
        *[
            c
            for i, (l, r) in enumerate(merges)
            for c in (F.lit(l + _BPE_SEP + r), F.lit(i))
        ]
    )
    n_rem = F.size(
        F.filter(
            F.transform(
                _bpe_pair_keys(F.col("syms")),
                lambda k: F.element_at(rank_map, k),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return encoded.select(
        *encoded.columns, n_rem.cast("bigint").alias("n_remaining")
    )


@query(
    "text_bpe_encode",
    oracle=None,  # generated below (round-unrolled CTEs)
)
def text_bpe_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus word vocabulary through the fixed BPE merge
    table: per word — corpus frequency, final symbol sequence, symbol
    count, rounds applied, and the remaining-applicable-pairs count
    (the convergence proof, 0 at fixpoint). The oracle replays every
    round in SQL with a position-window formulation of the same
    left-to-right non-overlapping merge scan, so rank order, chained
    merges, and overlap resolution are all value-hashed."""
    docs = load(spark, "documents", sf_dir)
    vocab = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # early_stop off: the 6-round bound covers this merge table and the
    # per-round isEmpty actions cost more than the spare no-op rounds;
    # convergence is still PROVEN by the value-hashed n_remaining column
    enc = bpe_encode(vocab, "w", BPE_MERGES, max_rounds=6, early_stop=False)
    out = bpe_remaining_pairs(enc, "w", BPE_MERGES)
    return out.select(
        "w",
        "n",
        F.array_join("syms", " ").alias("encoded"),
        F.size("syms").cast("bigint").alias("n_symbols"),
        F.col("rounds_applied").cast("int").alias("rounds_applied"),
        "n_remaining",
    )


def _register_bpe_encode_oracle(max_rounds: int = 6) -> None:
    """Round-unrolled DuckDB mirror. Each round: choose the min-rank
    applicable pair per word, enumerate positions, resolve overlapping
    candidate runs left-to-right ((pos - run_min) % 2 = 0 over maximal
    consecutive-candidate runs — equivalent to the sequential scan), and
    reassemble the symbol list. Words without an applicable pair carry
    through unchanged. A deliberately DIFFERENT formulation from the
    Spark-side fold, so a semantics bug in either cannot self-confirm."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    values = ", ".join(
        f"({i}, '{l}', '{r}', '{l + r}')"
        for i, (l, r) in enumerate(BPE_MERGES)
    )
    parts = [
        f"""
    WITH merges(rank, lft, rgt, merged) AS (VALUES {values}),
    r0 AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
               list_transform(range(1, length(w) + 1),
                              i -> substr(w, CAST(i AS INT), 1)) AS toks,
               0 AS rounds_applied
        FROM (
            SELECT unnest(string_split(
                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
            FROM documents
        )
        GROUP BY w
    )"""
    ]
    for k in range(max_rounds):
        parts.append(
            f""",
    cp{k} AS MATERIALIZED (
        SELECT b.w, m2.lft, m2.rgt, m2.merged
        FROM (
            SELECT pr.w, MIN(m.rank) AS rk
            FROM (
                SELECT s.w, s.toks[CAST(u.i AS INT)] AS lft,
                       s.toks[CAST(u.i AS INT) + 1] AS rgt
                FROM r{k} s, UNNEST(range(1, len(s.toks))) u(i)
            ) pr JOIN merges m ON m.lft = pr.lft AND m.rgt = pr.rgt
            GROUP BY pr.w
        ) b JOIN merges m2 ON m2.rank = b.rk
    ),
    pos{k} AS MATERIALIZED (
        SELECT s.w, CAST(u.i AS INT) AS pos, s.toks[CAST(u.i AS INT)] AS tok,
               c.merged,
               CASE WHEN s.toks[CAST(u.i AS INT)] = c.lft
                     AND s.toks[CAST(u.i AS INT) + 1] = c.rgt
                    THEN 1 ELSE 0 END AS cand
        FROM r{k} s JOIN cp{k} c USING (w),
             UNNEST(range(1, len(s.toks) + 1)) u(i)
    ),
    real{k} AS MATERIALIZED (
        SELECT w, pos FROM (
            SELECT w, pos, MIN(pos) OVER (PARTITION BY w, run_key) AS run_min
            FROM (
                SELECT w, pos,
                       pos - ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos)
                           AS run_key
                FROM pos{k} WHERE cand = 1
            )
        ) WHERE (pos - run_min) % 2 = 0
    ),
    nxt{k} AS MATERIALIZED (
        SELECT p.w,
               list(CASE WHEN rm.pos IS NOT NULL THEN p.merged ELSE p.tok END
                    ORDER BY p.pos)
                   FILTER (WHERE rs.pos IS NULL) AS toks
        FROM pos{k} p
        LEFT JOIN real{k} rm ON rm.w = p.w AND rm.pos = p.pos
        LEFT JOIN real{k} rs ON rs.w = p.w AND rs.pos = p.pos - 1
        GROUP BY p.w
    ),
    r{k + 1} AS MATERIALIZED (
        SELECT s.w, s.n, COALESCE(x.toks, s.toks) AS toks,
               s.rounds_applied
                   + CASE WHEN x.w IS NULL THEN 0 ELSE 1 END AS rounds_applied
        FROM r{k} s LEFT JOIN nxt{k} x USING (w)
    )"""
        )
    last = f"r{max_rounds}"
    parts.append(
        f""",
    rem AS MATERIALIZED (
        SELECT w, COUNT(*) AS n_remaining
        FROM (
            SELECT s.w, s.toks[CAST(u.i AS INT)] AS lft,
                   s.toks[CAST(u.i AS INT) + 1] AS rgt
            FROM {last} s, UNNEST(range(1, len(s.toks))) u(i)
        ) pr JOIN merges m ON m.lft = pr.lft AND m.rgt = pr.rgt
        GROUP BY w
    )
    SELECT s.w, s.n, array_to_string(s.toks, ' ') AS encoded,
           CAST(len(s.toks) AS BIGINT) AS n_symbols,
           CAST(s.rounds_applied AS INT) AS rounds_applied,
           CAST(COALESCE(r.n_remaining, 0) AS BIGINT) AS n_remaining
    FROM {last} s LEFT JOIN rem r USING (w)
    """
    )
    ORACLE_SQL["text_bpe_encode"] = "".join(parts)


_register_bpe_encode_oracle()


# ---------------------------------------------------------------------------
# Incremental lexical retrieval: a PERSISTED inverted index served and
# merged per batch — the text-side member of the incremental trilogy
# (dedup_incremental over signatures, ann_incremental over cells, this
# over postings).
# ---------------------------------------------------------------------------


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """One tokenization pass -> the two index relations: postings
    (id, term, tf) and doc lengths (id, len_d). Both are exact integers,
    so they round-trip through parquet bit-for-bit — the property that
    makes the served path reproduce the recompute path exactly."""
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    postings = words.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    lens = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("len_d"))
    return postings, lens


def incremental_bm25_topk(
    corpus: DataFrame,
    batch: DataFrame,
    index_root: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """BM25 top-k over corpus+batch THROUGH a persisted inverted index —
    the daily shape of a growing retrieval corpus at 100 TB:

    1. bootstrap: if the ``VersionedTable`` pair under ``index_root`` is
       empty, tokenize the corpus ONCE (the only full-corpus text scan
       ever) and commit postings + doc lengths;
    2. tokenize the BATCH only — work proportional to the new documents;
    3. serve: query-term postings come from the INDEX SCAN (the term
       filter pushes into the parquet read; at production scale the
       postings table is written clustered by term, so the scan touches
       only the query terms' row ranges) unioned with the batch's own
       postings; df/tf/len/avg_len then feed the exact same
       ``_bm25_rank`` arithmetic as the from-text path;
    4. merge: append the batch's postings and lengths (two commits), so
       tomorrow's queries see corpus+today without any re-tokenization.

    The corpus text column is NEVER read after bootstrap — the gated
    ``text_incremental_bm25`` pins that (its oracle is the FULL-corpus
    recompute, and tests/test_plans.py pins exactly one tokenize explode,
    over the batch, in the served plan). Caller contract: corpus and
    batch ids are disjoint."""
    from data_engineering_nd_spark.tables import VersionedTable

    spark = batch.sparkSession
    posts_t = VersionedTable(spark, index_root + "/postings")
    lens_t = VersionedTable(spark, index_root + "/doclens")
    # the two relations commit separately, so guard their consistency:
    # a crash between the bootstrap commits self-heals (the bootstrap is
    # a pure function of the corpus — recommitting both is exact), and a
    # version skew after appends fails LOUDLY instead of silently
    # undercounting stats or dropping unfindable docs. (A production
    # deployment makes the pair atomic outright: both relations in one
    # table-format transaction.)
    pv, lv = posts_t.latest_version(), lens_t.latest_version()
    if pv is None or lv is None:
        cp, cl = build_postings(corpus, id_col, text_col)
        # commit only what is missing: recommitting a surviving relation
        # would advance its version past its sibling's and manufacture
        # the very skew the guard below rejects
        if pv is None:
            posts_t.commit(cp)
        if lv is None:
            lens_t.commit(cl)
    elif pv != lv:
        raise RuntimeError(
            f"inconsistent index at {index_root}: postings v{pv} vs "
            f"doclens v{lv} — a merge crashed between commits; restore "
            "both relations to a common version before serving"
        )

    bp, bl = build_postings(batch, id_col, text_col)
    # three consumers each (serve union + merge commit) — compute once
    bp = bp.localCheckpoint()
    bl = bl.localCheckpoint()

    posts = posts_t.snapshot().unionByName(bp)
    lens = lens_t.snapshot().unionByName(bl)

    qp = posts.filter(F.col("term").isin(query_terms))
    tf = qp.select(id_col, "term", "tf")
    df_counts = qp.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    stats = lens.agg(
        F.sum("len_d").cast("bigint").alias("total_len"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    out = _bm25_rank(tf, df_counts, lens, stats, id_col, k)
    # sever the result from the pre-merge snapshot files before the
    # index advances (same contract as ann_incremental's candidates)
    out = out.localCheckpoint()

    posts_t.commit(bp, mode="append")
    lens_t.commit(bl, mode="append")
    return out


@query("text_incremental_bm25", oracle=_BM25_ORACLE)
def text_incremental_bm25_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-index serve must reproduce the full-corpus BM25
    recompute bit-for-bit: corpus (doc_id % 5 <> 0) is indexed once,
    batch (doc_id % 5 = 0) is tokenized and unioned at serve time, and
    the oracle is the SAME full-corpus SQL that gates text_bm25_topk —
    integer postings round-trip exactly, so the persisted path cannot
    drift from the recompute."""
    import shutil
    import tempfile

    docs = load(spark, "documents", sf_dir)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    work = tempfile.mkdtemp(prefix="text_inc_bm25_")
    try:
        return incremental_bm25_topk(
            corpus, batch, work, ["scan", "join", "window", "stream"], k=10
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Boolean conjunctive retrieval with proximity: the AND-query primitive
# under every filtered search ("docs containing ALL of these terms, close
# together") — the unranked counterpart of BM25's scored top-k, and the
# candidate generator a phrase/proximity reranker runs behind. Positions
# come from the posting list (posexplode ordinals), so the proximity test
# is exact integer arithmetic.
# ---------------------------------------------------------------------------

_BOOL_TERMS = ("spark", "stream", "vector")
_BOOL_WINDOW = 8     # first-occurrence span threshold for the proximity flag


def boolean_retrieval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    window: int,
) -> DataFrame:
    """Docs containing ALL ``terms``, with total term frequency, the span
    between the terms' first occurrences, and a proximity flag
    (span <= window). One posexplode filtered to the query terms (the
    posting-list slice), one hash-agg per doc with conditional-min first
    positions — COUNT(DISTINCT term) == k is the AND.

    Scale shape: the exploded frame holds only query-term hits (a few
    rows per doc, not the corpus token stream); the agg is map-side
    combinable and partitions on doc id. At 100 TB the same shape runs
    against a PERSISTED posting index (text_incremental_bm25's table)
    instead of tokenizing raw text — this operator is the query side."""
    from data_engineering_nd_spark.functions.text import tokens

    hits = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("ord", "tok")
    ).filter(F.col("tok").isin(list(terms)))
    first_pos = [
        F.min(F.when(F.col("tok") == t, F.col("ord"))).alias(f"fp_{i}")
        for i, t in enumerate(terms)
    ]
    agg = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("tf_total"),
        F.countDistinct("tok").alias("n_terms"),
        *first_pos,
    )
    fps = [F.col(f"fp_{i}") for i in range(len(terms))]
    span = (F.greatest(*fps) - F.least(*fps)).cast("int")
    return (
        agg.filter(F.col("n_terms") == len(terms))
        .select(
            F.col(id_col),
            "tf_total",
            span.alias("first_span"),
            F.when(span <= window, F.lit(1)).otherwise(F.lit(0)).alias(
                "proximity_ok"
            ),
        )
    )


@query(
    "text_boolean_retrieval",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS toks
        FROM documents WHERE trim(text) <> ''
    ),
    seq AS (
        SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ord
        FROM t
    ),
    hits AS (
        SELECT doc_id, tok, ord FROM seq
        WHERE tok IN ('{_BOOL_TERMS[0]}', '{_BOOL_TERMS[1]}', '{_BOOL_TERMS[2]}')
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS tf_total,
               COUNT(DISTINCT tok) AS n_terms,
               MIN(CASE WHEN tok = '{_BOOL_TERMS[0]}' THEN ord END) AS fp_0,
               MIN(CASE WHEN tok = '{_BOOL_TERMS[1]}' THEN ord END) AS fp_1,
               MIN(CASE WHEN tok = '{_BOOL_TERMS[2]}' THEN ord END) AS fp_2
        FROM hits GROUP BY 1
    )
    SELECT doc_id, tf_total,
           CAST(greatest(fp_0, fp_1, fp_2) - least(fp_0, fp_1, fp_2) AS INT)
               AS first_span,
           CASE WHEN greatest(fp_0, fp_1, fp_2) - least(fp_0, fp_1, fp_2)
                     <= {_BOOL_WINDOW}
                THEN 1 ELSE 0 END AS proximity_ok
    FROM agg WHERE n_terms = 3
    """,
)
def text_boolean_retrieval_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-retrieval of ('spark', 'stream', 'vector') over documents with
    an 8-token first-occurrence proximity flag. Span arithmetic uses the
    same ordinal base on both engines (the base cancels in the
    difference); ties and duplicates are handled by MIN per term."""
    docs = load(spark, "documents", sf_dir)
    return boolean_retrieval(
        docs, "doc_id", "text", _BOOL_TERMS, _BOOL_WINDOW
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction: stopword-delimited candidate phrases scored by
# word degree/frequency co-occurrence (Rose et al. 2010)
# ---------------------------------------------------------------------------

#: fixed stopword alternation — the phrase delimiters. Kept tiny and
#: hard-coded so the Spark regex and the DuckDB oracle regex are the
#: same literal (both Java regex and RE2 support \b word boundaries).
_RAKE_STOPS = (
    "the|a|an|and|or|of|to|in|on|for|with|is|are|was|were|be|as|at|by|"
    "it|this|that|from|but|not"
)


def rake_keywords(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 15
) -> DataFrame:
    """Corpus-level RAKE: candidate phrases are maximal stopword-free
    token runs; each word's score is degree/frequency where frequency
    counts the word's phrase occurrences and degree sums the lengths of
    the phrases it appears in (co-occurrence degree, including itself);
    a phrase scores the sum of its words' scores. Top-k distinct phrases
    by score.

    Determinism: word scores are e6-scaled BIGINTs via pure integer
    arithmetic (floor(deg*1e6/freq + 0.5) computed as
    (2*deg*1e6 + freq) div (2*freq)), and phrase scores are BIGINT sums
    of those — multi-term float accumulation never happens, so engine
    summation order cannot perturb the ranking (the established e6
    pattern from BM25/PQ).

    Scale shape: one regexp pass per document (JVM codegen, no UDF), two
    explodes (phrases, then words), two hash-aggs (word stats, phrase
    stats), one broadcast-sized join of distinct-phrase words onto the
    word-score table, and a TakeOrderedAndProject for the top-k — no
    window over the corpus, no driver loop."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    sep = F.regexp_replace(norm, r"\b(" + _RAKE_STOPS + r")\b", "|")
    phr = (
        df.select(F.explode(F.split(sep, r"\|")).alias("rawp"))
        .select(F.trim(F.col("rawp")).alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    # occurrence-level word rows feed freq/degree
    occ_words = phr.select(
        F.split("phrase", " ").alias("ws")
    ).select(
        F.size("ws").alias("plen"), F.explode("ws").alias("w")
    ).filter(F.col("w") != "")
    word_scores = occ_words.groupBy("w").agg(
        F.expr(
            "CAST((2 * CAST(SUM(plen) AS BIGINT) * 1000000 + COUNT(*)) "
            "DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("ws_e6"),
    )
    phrases_dist = phr.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    pwords = phrases_dist.select(
        "phrase",
        "n_occurrences",
        F.explode(F.split("phrase", " ")).alias("w"),
    ).filter(F.col("w") != "")
    scored = (
        pwords.join(F.broadcast(word_scores), "w")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("ws_e6").cast("bigint").alias("score_e6"),
        )
    )
    return (
        scored.orderBy(F.desc("score_e6"), "phrase")
        .limit(top_k)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            (F.col("score_e6").cast("double") / 1000000.0).alias("score"),
        )
    )


@query(
    "text_rake_keywords",
    oracle=r"""
    WITH rep AS (
        SELECT regexp_replace(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                   '\b(the|a|an|and|or|of|to|in|on|for|with|is|are|was|were|be|as|at|by|it|this|that|from|but|not)\b',
                   '|', 'g') AS t
        FROM documents
    ),
    phr AS (
        SELECT trim(p) AS phrase
        FROM rep, unnest(string_split(t, '|')) AS u(p)
        WHERE trim(p) <> ''
    ),
    occ_words AS (
        SELECT len(list_filter(string_split(phrase, ' '), x -> x <> ''))
                   AS plen,
               w
        FROM phr, unnest(string_split(phrase, ' ')) AS uw(w)
        WHERE w <> ''
    ),
    word_scores AS (
        SELECT w,
               (2 * CAST(SUM(plen) AS BIGINT) * 1000000 + COUNT(*))
                   // (2 * COUNT(*)) AS ws_e6
        FROM occ_words GROUP BY w
    ),
    phrases_dist AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM phr GROUP BY phrase
    ),
    pwords AS (
        SELECT p.phrase, p.n_occurrences, w
        FROM phrases_dist p, unnest(string_split(p.phrase, ' ')) AS uw(w)
        WHERE w <> ''
    ),
    scored AS (
        SELECT pw.phrase, pw.n_occurrences,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(s.ws_e6) AS BIGINT) AS score_e6
        FROM pwords pw JOIN word_scores s ON s.w = pw.w
        GROUP BY pw.phrase, pw.n_occurrences
    )
    SELECT phrase, n_words, n_occurrences,
           CAST(score_e6 AS DOUBLE) / 1000000.0 AS score
    FROM scored
    ORDER BY score_e6 DESC, phrase
    LIMIT 15
    """,
)
def text_rake_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 RAKE keyword phrases over the document corpus, scored by
    exact integer degree/frequency arithmetic."""
    docs = load(spark, "documents", sf_dir)
    return rake_keywords(docs, "doc_id", "text", top_k=15)


# ---------------------------------------------------------------------------
# PMI collocations: pointwise mutual information over adjacent bigrams —
# the classic collocation detector (Church & Hanks 1990)
# ---------------------------------------------------------------------------


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by PMI = ln(p(a,b)/(p(a)p(b)))
    with p(a,b) over the bigram stream and p(w) over the token stream.

    Determinism: the PMI argument is assembled as ONE division of two
    exact BIGINT products — c12 * N_uni^2 over N_bi * c1 * c2 — so the
    ranking key is a single IEEE op on integers (bit-identical across
    engines); ln() is applied only to the already-ranked value and
    rounded for display (the established ln-at-the-edge pattern).
    ``min_pair`` floors the pair count — raw PMI famously promotes
    hapax pairs, and the floor also bounds the candidate set.

    Scale shape: same kernel as bigram_logprob_score (JVM transform over
    an index sequence, no window over the corpus), two hash-aggs for the
    models, two 1-row total aggregates broadcast onto the pair table,
    and a TakeOrderedAndProject for the top-k."""
    from data_engineering_nd_spark.functions.text import _bind

    def pairs_of(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    toks = docs.select(
        F.explode(tokens(text_col)).alias("tok")
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_uni = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_uni"))
    bg = docs.select(
        F.explode(_bind(tokens(text_col), pairs_of)).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pair")
    ).filter(F.col("n_pair") >= min_pair)
    n_bi = bg.agg(F.count(F.lit(1)).cast("bigint").alias("n_bi"))
    scored = (
        c12.join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "n_pair",
            (
                (F.col("n_pair") * F.col("n_uni") * F.col("n_uni"))
                .cast("double")
                / (F.col("n_bi") * F.col("c1") * F.col("c2")).cast("double")
            ).alias("ratio"),
        )
    )
    return (
        scored.orderBy(F.desc("ratio"), "w1", "w2")
        .limit(top_k)
        .select(
            "w1", "w2", "n_pair", F.round(F.log("ratio"), 6).alias("pmi")
        )
    )


@query(
    "text_pmi_collocations",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                            ' ') AS toks
        FROM documents WHERE trim(text) <> ''
    ),
    seq AS (
        SELECT doc_id, unnest(toks) AS tok,
               generate_subscripts(toks, 1) AS ord
        FROM t
    ),
    uni AS (SELECT tok, COUNT(*) AS c FROM seq GROUP BY tok),
    nuni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_uni FROM seq),
    bg AS (
        SELECT tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        FROM seq QUALIFY w2 IS NOT NULL
    ),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5
    ),
    nbi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM bg),
    scored AS (
        SELECT c12.w1, c12.w2, c12.n_pair,
               CAST(c12.n_pair * nuni.n_uni * nuni.n_uni AS DOUBLE)
                   / CAST(nbi.n_bi * u1.c * u2.c AS DOUBLE) AS ratio
        FROM c12
        JOIN uni u1 ON u1.tok = c12.w1
        JOIN uni u2 ON u2.tok = c12.w2
        CROSS JOIN nuni CROSS JOIN nbi
    )
    SELECT w1, w2, n_pair, round(ln(ratio), 6) AS pmi
    FROM scored
    ORDER BY ratio DESC, w1, w2
    LIMIT 20
    """,
)
def text_pmi_collocations_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations of the corpus by PMI (pair count floor 5)."""
    docs = load(spark, "documents", sf_dir)
    return pmi_collocations(docs)


# ---------------------------------------------------------------------------
# Edit-distance near-duplicate pairs: length/prefix-blocked Levenshtein join
# ---------------------------------------------------------------------------

_LEV_PREFIX = 12   # block key: first chars (identical under dist<=D edits
                   # whenever the difference lies past the prefix)
_LEV_SNIP = 80     # distance is computed over this snippet
_LEV_D = 20        # pair threshold
_LEV_CAP = 64      # hot-block cap: blocks larger than this are skipped


def levenshtein_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Character-level near-duplicate pairs by Levenshtein distance over
    a fixed snippet, found with PREFIX BLOCKING: only documents sharing
    (group, first ``_LEV_PREFIX`` chars) are compared — the classic
    edit-distance-join blocking (any pair differing inside the prefix is
    out of scope by construction), with a hot-block cap so a degenerate
    shared prefix can never go quadratic. Complements the token-set
    dedup family (``operators/dedup.py``): MinHash/Jaccard see BAGS OF
    SHINGLES and miss small character-level edits that reorder nothing;
    an edit-distance pass catches typo-level near-dups.

    Scale shape: one hash shuffle on the (group, prefix) block key, a
    within-block self-join bounded by the cap (≤ cap²/2 comparisons per
    block), Levenshtein evaluated JVM-side with Spark's early-exit
    threshold form — never an all-pairs product. Deterministic: blocks,
    cap and distance are pure functions of content.

    Returns per-group pair counts, total distance and an md5 pair
    checksum."""
    from pyspark.sql.window import Window

    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    d = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("grp"),
            F.substring(F.col(text_col), 1, _LEV_PREFIX).alias("blk"),
            F.substring(F.col(text_col), 1, _LEV_SNIP).alias("snip"),
        )
        .where(
            F.col(text_col).isNotNull()
            & (F.length(text_col) >= _LEV_PREFIX)
        )
    )
    sized = d.withColumn(
        "bn", F.count(F.lit(1)).over(Window.partitionBy("grp", "blk"))
    ).where(F.col("bn") <= _LEV_CAP)
    a, b = sized.alias("a"), sized.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.grp").alias("grp"),
            F.col("a.id").alias("da"),
            F.col("b.id").alias("db"),
            # threshold form short-circuits the DP once the bound is
            # exceeded (returns -1): O(D*n) per pair instead of O(n^2)
            F.levenshtein(F.col("a.snip"), F.col("b.snip"), _LEV_D).alias(
                "dist"
            ),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= _LEV_D))
    )
    return (
        pairs.groupBy(F.col("grp").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("dist").cast("bigint").alias("dist_total"),
            F.sum(
                md5_prefix_long(
                    F.concat_ws(
                        ":",
                        F.col("da").cast("string"),
                        F.col("db").cast("string"),
                    )
                )
            ).cast("bigint").alias("pair_checksum"),
        )
    )


@query(
    "text_levenshtein_pairs",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               substr(text, 1, {_LEV_PREFIX}) AS blk,
               substr(text, 1, {_LEV_SNIP}) AS snip
        FROM documents
        WHERE text IS NOT NULL AND length(text) >= {_LEV_PREFIX}
    ),
    sized AS (
        SELECT *, COUNT(*) OVER (PARTITION BY lang, blk) AS bn FROM d
    ),
    cand AS (SELECT * FROM sized WHERE bn <= {_LEV_CAP}),
    pairs AS (
        SELECT a.lang AS lang, a.doc_id AS da, b.doc_id AS db,
               levenshtein(a.snip, b.snip) AS dist
        FROM cand a JOIN cand b
          ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(dist) AS BIGINT) AS dist_total,
           CAST(SUM(CAST(concat('0x', substr(md5(
                concat(CAST(da AS VARCHAR), ':', CAST(db AS VARCHAR))),
                1, 10)) AS BIGINT)) AS BIGINT) AS pair_checksum
    FROM pairs WHERE dist <= {_LEV_D}
    GROUP BY lang
    """,
)
def text_levenshtein_pairs_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language typo-level near-duplicate pairs on documents."""
    docs = load(spark, "documents", sf_dir)
    return levenshtein_pairs(docs)


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix of predicted vs recorded language
# ---------------------------------------------------------------------------


@query(
    "text_langid_confusion",
    oracle=r"""
    WITH t AS (
        SELECT
            doc_id,
            string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents
    ), s AS (
        SELECT
            doc_id,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['the','and','of','to','in','is','that','for','with','on'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_en,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['el','la','de','que','y','en','un','una','los','las'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_es,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['le','la','de','et','les','des','un','une','est','dans'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_fr,
            round(CASE WHEN len(toks) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(toks, x -> list_contains(
                        ['der','die','das','und','ist','von','mit','den','ein','eine'], x))) AS DOUBLE)
                      / CAST(len(toks) AS DOUBLE) END, 6) AS s_de
        FROM t
    ), pred AS (
        SELECT
            doc_id,
            CASE WHEN greatest(s_en, s_es, s_fr, s_de) >= 0.05 THEN
                CASE WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
                     WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                     WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                     ELSE 'fr' END
            ELSE 'unknown' END AS predicted_lang
        FROM s
    )
    SELECT d.lang,
           p.predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(concat('0x',
                substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 10))
                AS BIGINT)) AS BIGINT) AS doc_checksum
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY d.lang, p.predicted_lang
    """,
)
def text_langid_confusion_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Language-ID EVALUATION: the confusion matrix of the n-gram
    heuristic's predictions (:func:`detect_language`) against the
    corpus's recorded ``lang`` labels — cell counts plus a per-cell doc
    checksum. The quality-measurement half every classifier-style
    pipeline operator needs: text_detect_language gates the PREDICTIONS
    row-by-row; this gates the aggregate ERROR STRUCTURE (which
    languages leak into which), the report a data-quality dashboard
    actually shows. One projection pass + one vocabulary-sized hash-agg;
    no shuffle beyond the group key."""
    docs = load(spark, "documents", sf_dir)
    pred = detect_language(docs, "doc_id", "text").select(
        "doc_id", "predicted_lang"
    )
    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(md5_prefix_long(F.col("doc_id").cast("string")))
            .cast("bigint")
            .alias("doc_checksum"),
        )
    )
