"""Scalar kernels — all native Spark column expressions (JVM-side, codegen-
friendly). Python UDFs appear only where explicitly noted, to preserve the
reference's UDF surface (SURVEY.md §2.9) behind a tested native default."""

from data_engineering_nd_spark.functions.dates import (
    date_parts,
    flexible_date,
    register_sas_date_udf,
    sas_date,
    weekend_flag,
)
from data_engineering_nd_spark.functions.hashing import content_key
from data_engineering_nd_spark.functions.text import (
    char_ngrams,
    normalize_text,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "sas_date",
    "flexible_date",
    "date_parts",
    "weekend_flag",
    "register_sas_date_udf",
    "content_key",
    "normalize_text",
    "tokens",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "punct_ratio",
    "stopword_ratio",
]
