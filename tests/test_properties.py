"""Property-based tests (hypothesis) for the kernels whose input space is
adversarial: date strings and token sets. The reference shipped a date UDF
that returned NULL for EVERY input and never noticed (SURVEY §2.9) — exactly
the bug class property tests catch."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st


def _parse_flexible(spark, strings, years=(2016,)):
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.functions.dates import flexible_date

    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    rows = df.select(flexible_date("s", years).alias("d")).collect()
    return [r.d for r in rows]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.dates(datetime.date(2016, 1, 1), datetime.date(2016, 12, 31)),
        min_size=1,
        max_size=8,
    )
)
def test_flexible_date_roundtrips_both_formats(spark, dates):
    ymd = [d.strftime("%Y%m%d") for d in dates]
    mdy = [d.strftime("%m%d%Y") for d in dates]
    assert _parse_flexible(spark, ymd) == list(dates)
    assert _parse_flexible(spark, mdy) == list(dates)


@settings(max_examples=20, deadline=None)
@given(st.text(max_size=12).filter(lambda s: not s[:4].isdigit() and not s[-4:].isdigit()))
def test_flexible_date_junk_is_null_never_error(spark, junk):
    # anything without a valid-year prefix/suffix must parse to NULL —
    # including regex metacharacters, unicode, and empty strings
    assert _parse_flexible(spark, [junk]) == [None]


@settings(max_examples=15, deadline=None)
@given(st.integers(-100_000, 100_000))
def test_sas_date_is_epoch_offset(spark, offset):
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.functions.dates import sas_date

    df = spark.createDataFrame([(float(offset),)], ["x"])
    got = df.select(sas_date("x").alias("d")).collect()[0].d
    assert got == datetime.date(1960, 1, 1) + datetime.timedelta(days=offset)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=12),
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=1, max_size=12),
)
def test_jaccard_bounds_and_symmetry(spark, toks_a, toks_b):
    from data_engineering_nd_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, " ".join(toks_a), "blk"), (2, " ".join(toks_b), "blk")],
        ["doc_id", "text", "blk"],
    )
    rows = jaccard_pairs(docs, "doc_id", "text", "blk", threshold=0.0).collect()
    assert len(rows) == 1
    j = rows[0].jaccard
    assert 0.0 <= j <= 1.0
    sa, sb = set(toks_a), set(toks_b)
    expected = len(sa & sb) / len(sa | sb)
    assert abs(j - expected) < 1e-6
