"""Tests for the data-quality operators (DQ1-DQ3 re-built as functions)."""

from __future__ import annotations

from pyspark.sql import Row

from data_engineering_nd_spark.operators.quality import is_empty, null_audit


def test_is_empty(spark):
    assert is_empty(spark.createDataFrame([], "x int"))
    assert not is_empty(spark.createDataFrame([Row(x=1)]))


def test_null_audit_single_pass(spark):
    df = spark.createDataFrame(
        [
            Row(pk=1, val=1.0),
            Row(pk=None, val=float("nan")),
            Row(pk=3, val=None),
        ]
    )
    res = null_audit(df, ["pk", "val"], table="t")
    assert res.n_rows == 3
    assert res.null_counts == {"pk": 1, "val": 2}  # nan counts for floats
    assert res.failed_columns == ["pk", "val"]
    assert not res.ok


def test_null_audit_clean_table(spark):
    df = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    res = null_audit(df, ["pk"])
    assert res.ok and res.failed_columns == []


def test_detect_pii_handcrafted(spark):
    """Pattern semantics pinned on text that actually contains PII (the
    synthetic corpus is PII-free, so the oracle query only proves zeros)."""
    from pyspark.sql import Row

    from data_engineering_nd_spark.operators.text_analysis import detect_pii

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="mail me at jane.doe+x@corp.example.com now"),
            Row(doc_id=1, text="ssn 123-45-6789 and phone 555-867-5309 ok"),
            Row(doc_id=2, text="server at 10.0.255.1 port 80"),
            Row(doc_id=3, text="nothing sensitive here 1234 5678"),
        ]
    )
    out = {r.doc_id: r for r in detect_pii(df, "doc_id", "text").collect()}
    assert out[0].n_email == 1 and out[0].has_pii
    assert out[1].n_ssn == 1 and out[1].n_phone == 1 and out[1].has_pii
    assert out[2].n_ipv4 == 1 and out[2].has_pii
    assert not out[3].has_pii
    assert out[3].n_email == out[3].n_ssn == out[3].n_phone == out[3].n_ipv4 == 0


def test_redact_pii_handcrafted(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.text_analysis import redact_pii

    df = spark.createDataFrame(
        [Row(text="a@b.co or 123-45-6789 or 555-867-5309 or 10.0.0.1 end")]
    )
    got = df.select(redact_pii("text").alias("t")).first().t
    assert got == "[EMAIL] or [SSN] or [PHONE] or [IPV4] end"


def test_repetition_metrics_handcrafted(spark):
    from pyspark.sql import Row

    from data_engineering_nd_spark.operators.text_analysis import (
        repetition_metrics,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="a a a b"),          # 'a' dominates 3/4
            Row(doc_id=1, text="x y z w"),          # all distinct
            Row(doc_id=2, text="m m n n"),          # tie -> lexicographic 'm'
        ]
    )
    out = {r.doc_id: r for r in repetition_metrics(df, "doc_id", "text").collect()}
    assert out[0].n_words == 4 and out[0].distinct_words == 2
    assert out[0].top_word == "a" and out[0].top_word_ratio == 0.75
    assert out[0].dup_word_ratio == 0.5
    assert out[1].dup_word_ratio == 0.0 and out[1].top_word_count == 1
    assert out[2].top_word == "m"  # deterministic tie-break


def test_check_location(spark, tmp_path):
    """S12 location DQ: existence + data-file listing via the Hadoop FS
    API (same call shape for file:// and s3a:// URIs)."""
    from data_engineering_nd_spark.operators.quality import check_location

    out = str(tmp_path / "loc")
    spark.range(5).write.parquet(out)
    res = check_location(spark, out)
    assert res["ok"] and res["exists"] and res["n_data_files"] >= 1
    missing = check_location(spark, str(tmp_path / "nope"))
    assert not missing["exists"] and not missing["ok"]


def test_reconcile_distinguishes_null_position(spark):
    """(NULL,'x') vs ('x',NULL) must report value_mismatch — xxhash64
    skips NULL inputs, so without a sentinel both sides hash identically
    and the diff is silently dropped."""
    from data_engineering_nd_spark.operators.quality import reconcile

    left = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    right = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    got = {r.k: r.diff_status for r in reconcile(left, right, ["k"]).collect()}
    assert got == {1: "value_mismatch"}


def test_reconcile_classifies_all_diff_kinds(spark):
    from pyspark.sql import Row

    from data_engineering_nd_spark.operators.quality import reconcile

    left = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0), Row(k=2, a="y", b=2.0), Row(k=3, a="z", b=3.0)]
    )
    right = spark.createDataFrame(
        [Row(k=2, a="y", b=2.0), Row(k=3, a="z", b=9.9), Row(k=4, a="w", b=4.0)]
    )
    got = {r.k: r.diff_status for r in reconcile(left, right, ["k"]).collect()}
    assert got == {1: "only_left", 3: "value_mismatch", 4: "only_right"}

    with_equal = {
        r.k: r.diff_status
        for r in reconcile(left, right, ["k"], include_equal=True).collect()
    }
    assert with_equal[2] == "equal" and len(with_equal) == 4


def test_reconcile_rejects_misaligned_schemas(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from data_engineering_nd_spark.operators.quality import reconcile

    left = spark.createDataFrame([Row(k=1, a="x")])
    right = spark.createDataFrame([Row(k=1, z="x")])
    with _pytest.raises(ValueError):
        reconcile(left, right, ["k"])


def test_filter_decisions_rules_and_priority(spark):
    """Handcrafted docs hit each rule; priority = first failing rule."""
    from data_engineering_nd_spark.operators.text_analysis import (
        filter_decisions,
    )

    good = "we have a good document that " + " ".join(
        f"word{i} is here and" for i in range(10)
    )
    rows = [
        (1, "tiny doc"),  # too_short (and low stopword — priority wins)
        (2, "!!! ??? " * 12 + good),  # high_punct
        (3, " ".join(f"tok{i}" for i in range(30))),  # low_stopword
        (4, "the the the the the is is is is to to to and and a a " * 3),  # high_repetition
        (5, good + " mail me at someone@example.com please"),  # has_pii
        (6, good),  # keep
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.decision, r.reason)
        for r in filter_decisions(df, "doc_id", "text").collect()
    }
    assert got[1] == ("drop", "too_short")
    assert got[2] == ("drop", "high_punct")
    assert got[3] == ("drop", "low_stopword")
    assert got[4] == ("drop", "high_repetition")
    assert got[5] == ("drop", "has_pii")
    assert got[6] == ("keep", "ok")


def test_filter_decisions_is_shuffle_free(spark):
    """The composite filter must stay one narrow projection — zero
    exchanges — because it runs over the full corpus at scan speed."""
    from data_engineering_nd_spark.operators.text_analysis import (
        text_filter_decision_query,
    )
    from data_engineering_nd_spark.plans.inspect import (
        assert_no_python_udf_in,
        count_exchanges,
    )

    df = text_filter_decision_query(spark, "/root/testdata/sf0.001")
    assert count_exchanges(df) == 0
    assert_no_python_udf_in(df)


def test_tfidf_cosine_df_cap_prunes_common_terms(spark):
    """Terms above max_df must not generate candidate pairs: two docs
    sharing ONLY a ubiquitous term score zero (the term is pruned), while
    genuine near-dups sharing rare terms score high."""
    from data_engineering_nd_spark.operators.text_analysis import (
        tfidf_cosine_pairs,
    )

    common = "shared common words everywhere"
    rows = [
        (1, f"{common} unique alpha beta gamma delta"),
        (2, f"{common} unique alpha beta gamma delta"),  # near-dup of 1
        (3, f"{common} totally different rare tokens here"),
        (4, f"{common} another unrelated payload entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # max_df=3: 'shared/common/words/everywhere' appear in all 4 docs -> pruned
    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=0.5, max_df=3
        ).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == 1.0


def test_entropy_metrics_handcrafted(spark):
    """Exact entropies on handcrafted distributions: uniform text hits
    log2(n_types), constant text hits 0."""
    import math

    from data_engineering_nd_spark.operators.text_analysis import entropy_metrics

    rows = [
        (1, "a b c d"),          # uniform over 4 types -> H = 2 bits
        (2, "x x x x x x"),      # single type -> H = 0
        (3, "a a b b"),          # uniform over 2 -> H = 1
        (4, "a a a b"),          # H = 2 - (3*log2(3))/4
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in entropy_metrics(df, "doc_id", "text").collect()}
    assert out[1].entropy_bits == 2.0 and out[1].normalized_entropy == 1.0
    assert out[2].entropy_bits == 0.0 and out[2].normalized_entropy == 0.0
    assert out[2].n_types == 1
    assert out[3].entropy_bits == 1.0
    h4 = 2.0 - round(3 * math.log2(3) * 1e6) / 1e6 / 4
    assert out[4].entropy_bits == round(h4, 4)
    assert out[4].normalized_entropy == round(h4 / 1.0, 4)  # log2(2 types) = 1


def test_volume_anomalies_flags_spike_and_gap(spark):
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.quality import volume_anomalies

    rows = []
    for d in range(1, 11):
        rows += [(f"2024-01-{d:02d}",)] * 10
    rows += [("2024-01-11",)] * 100  # spike day
    df = spark.createDataFrame(rows, ["d"])
    out = volume_anomalies(df, F.col("d").cast("date").cast("timestamp_ntz")).collect()
    assert len(out) == 1
    assert str(out[0]["day"]).startswith("2024-01-11")
    assert out[0]["n_rows"] == 100
    assert out[0]["z_score"] > 2


def test_volume_anomalies_uniform_volume_is_clean(spark):
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.quality import volume_anomalies

    rows = [(f"2024-02-{d:02d}",) for d in range(1, 21) for _ in range(5)]
    df = spark.createDataFrame(rows, ["d"])
    assert volume_anomalies(df, F.col("d").cast("date").cast("timestamp_ntz")).count() == 0


def test_distribution_drift_zero_for_identical_and_positive_for_shifted(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from data_engineering_nd_spark.operators.quality import distribution_drift

    base = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    same = distribution_drift(base, base, "x", lo=0.0, hi=100.0, n_buckets=5)
    assert all(r["psi_contribution"] == 0.0 for r in same.collect())

    shifted = spark.createDataFrame([(float(v) + 60,) for v in range(100)], ["x"])
    drift = distribution_drift(base, shifted, "x", lo=0.0, hi=100.0, n_buckets=5)
    rows = drift.collect()
    total_psi = sum(r["psi_contribution"] for r in rows)
    assert total_psi > 0.2  # the standard "distribution moved" alarm level
    # clamping: values beyond hi land in the last bucket, not dropped
    assert sum(r["cur_cnt"] for r in rows) == 100


def test_expectation_suite_reports_failures_as_rows(spark):
    """A failing expectation is a passed=false ROW, not an error; ops and
    thresholds drive the decision; all observations are exact counts."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.quality import expectation_suite

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (2, "y")], "k long, v string"
    )
    out = {
        r["expectation"]: r
        for r in expectation_suite(
            df,
            "t",
            [
                ("row_count_min", F.count(F.lit(1)), 5, ">="),
                ("pk_dupes", F.count(F.lit(1)) - F.countDistinct("k"), 0, "<="),
                ("v_nulls", F.count(F.when(F.col("v").isNull(), 1)), 1, "<="),
            ],
        ).collect()
    }
    assert not out["row_count_min"]["passed"] and out["row_count_min"]["observed"] == 3
    assert not out["pk_dupes"]["passed"] and out["pk_dupes"]["observed"] == 1
    assert out["v_nulls"]["passed"] and out["v_nulls"]["observed"] == 1
    assert all(r["table_name"] == "t" for r in out.values())


def test_bm25_reference_arithmetic(spark):
    """BM25 on a hand-built 3-doc corpus vs a direct Python computation:
    tf saturation, length normalization, idf, and the e6-integer
    accumulation all pinned."""
    import math

    from data_engineering_nd_spark.operators.text_analysis import (
        _BM25_B,
        _BM25_K1,
        bm25_topk,
    )

    corpus = {
        1: "cat dog cat",          # len 3, tf(cat)=2
        2: "cat fish",             # len 2, tf(cat)=1
        3: "bird bird bird bird",  # len 4, no match
    }
    docs = spark.createDataFrame(
        sorted(corpus.items()), ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_matched_terms, r.bm25_score)
        for r in bm25_topk(docs, ["cat"], k=10).collect()
    }

    n, total_len = 3, 9
    avg = total_len / n
    df = 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def score(tf, len_d):
        raw = idf * tf * (_BM25_K1 + 1) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len_d / avg)
        )
        return math.floor(raw * 1e6 + 0.5) / 1e6

    assert set(got) == {1, 2}  # doc 3 never matches
    assert got[1] == (1, score(2, 3))
    assert got[2] == (1, score(1, 2))
    assert got[1][1] > got[2][1]  # higher tf wins at similar length


def test_incremental_bm25_two_day_flow_matches_recompute(spark, tmp_path):
    """Day-2 serve through the merged index must equal a from-scratch
    BM25 over corpus+day1+day2 — postings are exact integers, so the
    persisted path reproduces the recompute bit-for-bit."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.text_analysis import (
        bm25_topk,
        incremental_bm25_topk,
    )

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 5 > 1)
    day1 = docs.filter(F.col("doc_id") % 5 == 0)
    day2 = docs.filter(F.col("doc_id") % 5 == 1)
    terms = ["scan", "join", "window", "stream"]

    root = str(tmp_path / "lex")
    incremental_bm25_topk(corpus, day1, root, terms).collect()
    got = [
        (r.doc_id, r.n_matched_terms, r.bm25_score)
        for r in incremental_bm25_topk(corpus, day2, root, terms).collect()
    ]
    want = [
        (r.doc_id, r.n_matched_terms, r.bm25_score)
        for r in bm25_topk(docs, terms).collect()
    ]
    assert got == want


def test_incremental_bm25_bootstrap_self_heals_and_skew_is_loud(spark, tmp_path):
    """A crash between the two bootstrap commits self-heals on the next
    call (only the missing relation is committed — versions stay in
    lock-step); post-append version skew raises instead of serving
    silently wrong stats."""
    import pytest
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.catalog import load
    from data_engineering_nd_spark.operators.text_analysis import (
        bm25_topk,
        build_postings,
        incremental_bm25_topk,
    )
    from data_engineering_nd_spark.tables import VersionedTable

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    terms = ["scan", "join", "window", "stream"]
    root = str(tmp_path / "lex")

    # simulate the bootstrap crash window: postings committed, lens not
    cp, _ = build_postings(corpus)
    VersionedTable(spark, root + "/postings").commit(cp)
    got = [
        (r.doc_id, r.bm25_score)
        for r in incremental_bm25_topk(corpus, batch, root, terms).collect()
    ]
    want = [(r.doc_id, r.bm25_score) for r in bm25_topk(docs, terms).collect()]
    assert got == want
    assert VersionedTable(spark, root + "/postings").latest_version() == 1
    assert VersionedTable(spark, root + "/doclens").latest_version() == 1

    # simulate a crashed merge: postings advanced, doclens did not
    VersionedTable(spark, root + "/postings").commit(cp, mode="append")
    with pytest.raises(RuntimeError, match="inconsistent index"):
        incremental_bm25_topk(corpus, batch, root, terms)


def test_benford_digit_check_shares_and_terms(spark):
    """Crafted amounts with known first digits: shares, totals and the
    e6 chi terms all follow the closed form."""
    from data_engineering_nd_spark.operators.quality import (
        _BENFORD_P,
        benford_digit_check,
    )

    vals = [1.5] * 30 + [25.0] * 18 + [900.0] * 2  # digits 1, 2, 9
    df = spark.createDataFrame([(v,) for v in vals], ["amount"])
    out = {r.digit: r for r in benford_digit_check(df, "amount").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1].n_obs == 30 and out[1].n_total == 50
    assert abs(out[1].obs_share - 0.6) < 1e-6
    assert out[2].p_benford == _BENFORD_P[2]
    import math

    for d in out:
        share = out[d].n_obs / 50
        p = _BENFORD_P[d]
        expected = math.floor((share - p) ** 2 / p * 1e6 + 0.5)
        assert out[d].chi_term_e6 == expected


def test_functional_dependency_report_mixed_outcomes(spark, tmp_path):
    """Planted violation: the PK dependency holds, the violated one is
    counted with the right fan-out and share."""
    import datetime

    import pandas as pd

    from data_engineering_nd_spark.operators.quality import (
        dq_functional_dependency_query,
    )

    d = datetime.datetime(2000, 1, 1)
    rows = [
        (1, 10, "O", 1.0, d, "1-URGENT"),
        (2, 10, "F", 1.0, d, "1-URGENT"),   # custkey 10 -> two statuses
        (3, 20, "O", 1.0, d, "2-HIGH"),
        (4, 30, "P", 1.0, d, "2-HIGH"),
    ]
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority",
            ],
        )
    ).write.parquet(str(sf / "orders.parquet"))
    out = {r.fd: r for r in dq_functional_dependency_query(spark, str(sf)).collect()}
    pk = out["o_orderkey->o_orderpriority"]
    assert (pk.n_keys, pk.n_violating, pk.holds) == (4, 0, 1)
    cust = out["o_custkey->o_orderstatus"]
    assert (cust.n_keys, cust.n_violating, cust.max_fanout, cust.holds) == (3, 1, 2, 0)
    assert abs(cust.violation_share - 1 / 3) < 1e-6
    pri = out["o_orderpriority->o_orderstatus"]
    assert (pri.n_keys, pri.n_violating, pri.max_fanout) == (2, 2, 2)


def test_pmi_promotes_exclusive_pairs_and_floors_hapax(spark):
    """A pair that always co-occurs scores the max PMI; a pair seen
    fewer than min_pair times never appears."""
    from data_engineering_nd_spark.operators.text_analysis import (
        pmi_collocations,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta common common common rare" + str(i)) for i in range(6)]
        + [(10 + i, "common gamma") for i in range(6)],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): r for r in pmi_collocations(docs, min_pair=5).collect()}
    # 'alpha beta' co-occurs exclusively (6 times) -> top PMI pair
    assert ("alpha", "beta") in out
    ab = out[("alpha", "beta")]
    assert ab.n_pair == 6
    # every retained pair respects the floor
    assert all(r.n_pair >= 5 for r in out.values())
    # 'rareN' bigrams appear once each -> floored out
    assert not any(w1.startswith("rare") or w2.startswith("rare")
                   for (w1, w2) in out)
    # exclusivity ranks above the frequent-word pair
    assert ab.pmi >= out.get(("common", "common"), ab).pmi


def test_candidate_keys_profile(spark, tmp_path):
    """o_orderkey is the only key (distinct == rows, no nulls); a column
    with nulls or duplicates is not."""
    import pandas as pd

    from data_engineering_nd_spark.operators.quality import (
        dq_candidate_keys_query,
    )

    pdf = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 10, 30, 40],          # dup
            "o_orderstatus": ["O", "F", None, "O"],  # null + dup
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
            ),
            "o_orderpriority": ["1", "2", "3", "4"],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(sf / "orders.parquet"))
    out = {r.column_name: r for r in dq_candidate_keys_query(spark, str(sf)).collect()}
    assert out["o_orderkey"].is_key == 1
    assert out["o_custkey"].is_key == 0 and out["o_custkey"].n_distinct == 3
    assert out["o_orderstatus"].is_key == 0 and out["o_orderstatus"].n_nulls == 1
    assert out["o_orderpriority"].is_key == 1
    assert all(r.n_rows == 4 for r in out.values())
