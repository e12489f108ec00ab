"""Text kernels for the document-pipeline operators (dedup, quality scoring,
language ID). All are native Spark column expressions — string ops stay inside
whole-stage codegen; nothing here crosses into Python.

No counterpart in the reference (its only string ops are UPPER/SPLIT/LIKE,
SURVEY.md §2.8); these extend the engine for LLM-training-data pipelines per
the driver north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Explicit class (not \p{Punct}) so the DuckDB oracle can use the identical
# regex — engine and oracle must agree character-for-character.
PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""

# Tiny embedded English stopword list — deterministic, dependency-free.
STOPWORDS = (
    "the", "a", "an", "and", "or", "but", "if", "then", "of", "to", "in",
    "on", "for", "with", "at", "by", "from", "is", "are", "was", "were",
    "be", "been", "it", "this", "that", "as", "not", "no", "so", "we",
    "you", "they", "he", "she", "has", "have", "had", "will", "would",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once and pass it to ``fn`` as a higher-order-function
    lambda variable.

    Catalyst does not common-subexpression-eliminate through lambda bodies:
    ``transform(starts, i -> f(expensive_expr, i))`` re-evaluates
    expensive_expr for EVERY array element (measured ~25x slowdown building
    shingles, where the expr is a regex+split). Wrapping the expr as the
    single element of an array makes it the lambda argument — computed once.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace to single spaces."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text, '' -> empty array."""
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined), deduplicated.

    Built with transform over an index sequence — stays JVM-side; this is the
    input to MinHash/Jaccard dedup. Documents shorter than k words yield a
    single shingle of the whole text (so they can still be compared).
    """

    def build(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        shingle_at = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))  # noqa: E731
        return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
            F.array_distinct(F.transform(starts, shingle_at))
        )

    return _bind(tokens(col), build)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Array of distinct character n-grams of the normalized text."""

    def build(norm: Column) -> Column:
        length = F.length(norm)
        starts = F.sequence(F.lit(1), F.greatest(length - n + 1, F.lit(1)))
        return F.when(length == 0, F.array().cast("array<string>")).otherwise(
            F.array_distinct(F.transform(starts, lambda i: F.substring(norm, i, n)))
        )

    return _bind(normalize_text(col), build)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation; '' -> 0.0."""
    c = _c(col)
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are English stopwords; no tokens -> 0.0."""

    def build(toks: Column) -> Column:
        sw = F.array(*[F.lit(w) for w in STOPWORDS])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))

    return _bind(tokens(col), build)


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]: rewards documents with a
    healthy length, moderate stopword density, low punctuation density.
    Deterministic arithmetic only — oracle-able in SQL."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.4))
    p_score = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    return F.round((len_score + sw_score + p_score) / 3.0, 4)


#: BPE-ish pre-tokenization pattern (GPT-2 style, lookahead-free).
#: Deliberately restricted to the Java-regex ∩ RE2 subset — no
#: `\s+(?!\S)` refinement, since RE2 (DuckDB) has no lookahead — so the
#: Spark expression and the SQL oracle tokenize identically. Alternation
#: is leftmost-FIRST in both engines, which the alternative order relies
#: on (contractions before words, words before residue).
PRETOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def pretokens(col: Column | str) -> Column:
    """GPT-2-style BPE pre-tokens of the RAW text (no normalization —
    BPE vocabularies are case- and whitespace-sensitive): contractions,
    space-prefixed words / digit runs / punctuation runs, whitespace
    residue. The unit a byte-pair tokenizer merges within; counting them
    is the standard fast proxy for post-BPE token cost."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PRETOKEN_PATTERN), 0)


def pretoken_count(col: Column | str) -> Column:
    return F.size(pretokens(col)).cast("bigint")
