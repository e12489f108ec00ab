"""Unit tests for the scalar kernels (dates, text, hashing) on tiny
in-memory frames — the per-operator test layer the reference lacks
(SURVEY.md §5)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_nd_spark.functions.dates import (
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
    word_shingles,
)


def test_sas_date_epoch_and_nulls(spark):
    df = spark.createDataFrame(
        [Row(x=0.0), Row(x=20545.0), Row(x=None), Row(x=1.9)]
    )
    out = [r.d for r in df.select(sas_date("x").alias("d")).collect()]
    assert out[0] == datetime.date(1960, 1, 1)
    assert out[1] == datetime.date(2016, 4, 1)  # known SAS offset (FIXTURES.md)
    assert out[2] is None
    assert out[3] == datetime.date(1960, 1, 2)  # double -> int truncation


def test_sas_date_udf_matches_native(spark):
    register_sas_date_udf(spark)
    df = spark.createDataFrame([Row(x=20545.0), Row(x=None), Row(x=366.0)])
    df.createOrReplaceTempView("t_sas")
    via_udf = [r.d for r in spark.sql("SELECT SASDateConverter(x) AS d FROM t_sas").collect()]
    via_native = [r.d for r in df.select(sas_date("x").alias("d")).collect()]
    assert via_udf == via_native


def test_flexible_date_intended_semantics(spark):
    # the reference's shipped UDF returns NULL for everything (etl.py:142-159
    # type bug); these are the *intended* semantics per the notebook prototype.
    rows = [
        Row(s="20160401"),  # yyyyMMdd, year prefix
        Row(s="10282016"),  # MMddyyyy, year suffix
        Row(s="D/S"),       # junk (real dtaddto value)
        Row(s="/   183D"),  # junk
        Row(s="20150401"),  # valid format, year not whitelisted
        Row(s=None),
    ]
    df = spark.createDataFrame(rows)
    out = [r.d for r in df.select(flexible_date("s").alias("d")).collect()]
    assert out[0] == datetime.date(2016, 4, 1)
    assert out[1] == datetime.date(2016, 10, 28)
    assert out[2] is None
    assert out[3] is None
    assert out[4] is None
    assert out[5] is None


def test_weekend_flag(spark):
    df = spark.createDataFrame(
        [Row(d=datetime.date(2016, 4, 2)), Row(d=datetime.date(2016, 4, 4))]
    )
    out = [r.f for r in df.select(weekend_flag("d").alias("f")).collect()]
    assert out == ["weekend", "weekday"]  # Saturday, Monday


def test_content_key_deterministic_across_repartition(spark):
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("row-"), F.col("id")).alias("name")
    )
    k1 = {r.id: r.k for r in df.select("id", content_key("id", "name").alias("k")).collect()}
    k2 = {
        r.id: r.k
        for r in df.repartition(7)
        .select("id", content_key("id", "name").alias("k"))
        .collect()
    }
    assert k1 == k2  # unlike monotonically_increasing_id (etl.py:204)
    assert len(set(k1.values())) == 100


def test_text_kernels(spark):
    df = spark.createDataFrame([Row(t="  The  quick, brown fox! "), Row(t="")])
    row = df.select(
        normalize_text("t").alias("norm"),
        token_count("t").alias("n"),
        punct_ratio("t").alias("p"),
        stopword_ratio("t").alias("s"),
        word_shingles("t", 2).alias("sh"),
        char_ngrams("t", 3).alias("ng"),
    ).collect()
    r = row[0]
    assert r.norm == "the quick, brown fox!"
    assert r.n == 4
    assert abs(r.p - 2 / 25) < 1e-12  # ',' and '!' over raw length 25
    assert abs(r.s - 1 / 4) < 1e-12  # 'the'
    assert r.sh == ["the quick,", "quick, brown", "brown fox!"]
    assert "the" in r.ng and len(r.ng) == len(set(r.ng))
    empty = row[1]
    assert empty.n == 0 and empty.p == 0.0 and empty.s == 0.0 and empty.sh == []


def test_pretokens_bpe_ish_classes(spark):
    """Pin the GPT-2-style pre-tokenization on handcrafted text:
    contractions split, words/digits keep their leading space, punct runs
    group, whitespace residue surfaces. (The pattern must stay in the
    Java-regex ∩ RE2 subset so the DuckDB oracle tokenizes identically.)"""
    from data_engineering_nd_spark.functions.text import pretoken_count, pretokens

    df = spark.createDataFrame(
        [("Don't stop 123 now!!",), ("  hello   world",), ("",)], ["t"]
    )
    got = [r.p for r in df.select(pretokens("t").alias("p")).collect()]
    assert got[0] == ["Don", "'t", " stop", " 123", " now", "!!"]
    assert got[1] == ["  ", "hello", "   ", "world"]
    assert got[2] == []
    counts = [r.c for r in df.select(pretoken_count("t").alias("c")).collect()]
    assert counts == [6, 4, 0]


def test_interpolate_hourly_linear_midpoints(spark, tmp_path):
    """Gap of 2 hours between observed values 10 and 40 -> interior hours
    get 20 and 30; edges (before first / after last observation) excluded."""
    import datetime as dt

    import pandas as pd

    from data_engineering_nd_spark.analytics import q66_interpolate_hourly

    rows = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": [dt.datetime(2024, 1, 1, 0, 30), dt.datetime(2024, 1, 1, 3, 15)],
            "user_id": [1, 1],
            "event_type": ["click", "click"],
            "value": [10.0, 40.0],
            "props": ["{}", "{}"],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows).write.parquet(str(sf / "events.parquet"))
    out = {
        str(r["hour"]): (r["value"], r["is_interpolated"])
        for r in q66_interpolate_hourly(spark, str(sf)).collect()
    }
    assert out["2024-01-01 00:00:00"] == (10.0, False)
    assert out["2024-01-01 01:00:00"] == (20.0, True)
    assert out["2024-01-01 02:00:00"] == (30.0, True)
    assert out["2024-01-01 03:00:00"] == (40.0, False)
    assert len(out) == 4


def test_trailing_week_range_frame_respects_calendar_gaps(spark, tmp_path):
    """Two orders 10 days apart: a ROWS frame would sum both; the RANGE
    frame must keep them in separate trailing-7-day windows."""
    import pandas as pd

    from data_engineering_nd_spark.analytics import q67_trailing_week_revenue

    rows = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 1],
            "o_orderstatus": ["F", "F", "F"],
            "o_totalprice": [100.0, 50.0, 25.0],
            # day 1, day 3 (inside the week), day 13 (outside)
            "o_orderdate": pd.to_datetime(
                ["1995-01-01", "1995-01-03", "1995-01-13"]
            ),
            "o_orderpriority": ["1-URGENT"] * 3,
            "o_clerk": ["c"] * 3,
            "o_shippriority": [0] * 3,
            "o_comment": ["x"] * 3,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows).write.parquet(str(sf / "orders.parquet"))
    got = {
        str(r["day"])[:10]: (r["trailing_7d_revenue"], r["trailing_7d_days"])
        for r in q67_trailing_week_revenue(spark, str(sf)).collect()
    }
    assert got["1995-01-01"] == (100.0, 1)
    assert got["1995-01-03"] == (150.0, 2)  # day 1 still inside the window
    assert got["1995-01-13"] == (25.0, 1)   # both earlier days aged out


def test_hll_registers_match_reference_loop(spark):
    """The Spark HLL registers and estimate must match a direct Python
    reimplementation of the same md5 construction on the same values —
    pins the bit arithmetic (register index, rho via binary length,
    exact-integer register sum) independently of the SQL oracle."""
    import hashlib

    from pyspark.sql import functions as F

    from data_engineering_nd_spark.analytics import (
        _HLL_ALPHA,
        _HLL_M,
        _HLL_TAIL_BITS,
    )

    values = [str(v) for v in range(1, 400)]
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        idx = h >> _HLL_TAIL_BITS
        tail = h & ((1 << _HLL_TAIL_BITS) - 1)
        rho = (
            _HLL_TAIL_BITS + 1
            if tail == 0
            else _HLL_TAIL_BITS + 1 - tail.bit_length()
        )
        regs[idx] = max(regs.get(idx, 0), rho)
    top = _HLL_TAIL_BITS + 1
    s = sum(1 << (top - m) for m in regs.values()) + (
        _HLL_M - len(regs)
    ) * (1 << top)
    expected_e = (_HLL_ALPHA * _HLL_M * _HLL_M) * float(1 << top) / s

    # same construction through the Spark column expressions
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    h = F.conv(F.substring(F.md5("x"), 1, 15), 16, 10).cast("long")
    slots = df.select(
        F.shiftright(h, _HLL_TAIL_BITS).alias("idx"),
        h.bitwiseAND(F.lit((1 << _HLL_TAIL_BITS) - 1)).alias("tail"),
    )
    rho = F.when(F.col("tail") == 0, F.lit(top)).otherwise(
        F.lit(top) - F.length(F.conv(F.col("tail").cast("string"), 10, 2))
    )
    got = {
        r["idx"]: r["m_j"]
        for r in slots.select("idx", rho.alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("m_j"))
        .collect()
    }
    assert got == regs
    got_s = sum(1 << (top - m) for m in got.values()) + (_HLL_M - len(got)) * (
        1 << top
    )
    assert got_s == s
    # estimate lands within the m=16 error envelope of the true 399
    assert abs(expected_e - 399) / 399 < 0.6


def test_hll_grouped_merge_law(spark, tmp_path):
    """register_sum (direct) == register_sum_merged (max-merge of two
    disjoint halves) for every group — the sketch-merge law q81 gates —
    and the estimate lands within the published ~26%/sqrt(m)-class error
    on a crafted frame with a KNOWN distinct count per group."""
    import pandas as pd

    from data_engineering_nd_spark.analytics import q81_hll_grouped_merge

    rows = pd.DataFrame(
        {
            "o_orderkey": range(1, 801),
            "o_custkey": [((k * 7) % 200) + 1 for k in range(1, 801)],
            "o_orderpriority": [
                f"{1 + (k % 2)}-P" for k in range(1, 801)
            ],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows).write.parquet(str(sf / "orders.parquet"))
    out = q81_hll_grouped_merge(spark, str(sf)).collect()
    assert len(out) == 2
    for r in out:
        assert r.register_sum == r.register_sum_merged
        assert r.n_exact == 100  # (k*7 % 200) splits evenly by parity of k
        assert abs(r.hll_estimate - r.n_exact) / r.n_exact < 0.8


def test_boolean_retrieval_and_semantics_and_span(spark):
    """AND semantics: docs missing a term drop out; the span is the
    first-occurrence spread; the proximity flag honors the window."""
    import pandas as pd

    from data_engineering_nd_spark.operators.text_analysis import (
        boolean_retrieval,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "spark stream vector tail tail",          # span 2, close
                    "spark x x x x x x x x x stream vector",  # span 11, far
                    "spark stream only",                      # missing vector
                ],
            }
        )
    )
    out = {
        r.doc_id: r
        for r in boolean_retrieval(
            docs, "doc_id", "text", ("spark", "stream", "vector"), 8
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].tf_total, out[1].first_span, out[1].proximity_ok) == (3, 2, 1)
    assert (out[2].tf_total, out[2].first_span, out[2].proximity_ok) == (3, 11, 0)
