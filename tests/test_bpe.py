"""BPE merge application (operators.text_analysis.bpe_encode): the
tokenizer inner loop. Pins the semantics that distinguish a correct
implementation from a plausible one: min-rank priority (not leftmost),
left-to-right non-overlapping occurrence merging, (left, right) tuple
identity (not concatenation), chained merges across rounds — and that the
literal-map and broadcast-join strategies agree exactly."""

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_spark.operators.text_analysis import (
    BPE_MERGES,
    bpe_encode,
    bpe_remaining_pairs,
)


def _enc(spark, words, merges, **kw):
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    out = bpe_encode(df, "w", merges, **kw)
    return {r.w: (list(r.syms), r.rounds_applied) for r in out.collect()}


@pytest.mark.parametrize("strategy", ["literal", "join"])
def test_min_rank_wins_over_leftmost(spark, strategy):
    got = _enc(spark, ["abc"], [("b", "c"), ("a", "b")], strategy=strategy)
    assert got["abc"] == (["a", "bc"], 1)  # leftmost-first would give ab|c


@pytest.mark.parametrize("strategy", ["literal", "join"])
def test_overlapping_occurrences_merge_left_to_right(spark, strategy):
    got = _enc(spark, ["aaaa", "aaa"], [("a", "a")], strategy=strategy)
    assert got["aaaa"] == (["aa", "aa"], 1)
    assert got["aaa"] == (["aa", "a"], 1)


@pytest.mark.parametrize("strategy", ["literal", "join"])
def test_pairs_are_tuples_not_concatenations(spark, strategy):
    # ("ab","c") must NOT fire on the char sequence a|b|c
    got = _enc(spark, ["abc"], [("ab", "c")], strategy=strategy)
    assert got["abc"] == (["a", "b", "c"], 0)
    # ... but does fire once ("a","b") has produced the "ab" symbol
    got = _enc(spark, ["abc"], [("a", "b"), ("ab", "c")], strategy=strategy)
    assert got["abc"] == (["abc"], 2)


@pytest.mark.parametrize("strategy", ["literal", "join"])
def test_all_occurrences_merge_in_one_round(spark, strategy):
    got = _enc(spark, ["abab"], [("a", "b")], strategy=strategy)
    assert got["abab"] == (["ab", "ab"], 1)


def test_strategies_agree_on_gate_merge_table(spark):
    words = ["the", "agg", "a", "row", "customer", "line", "stream", "thethe"]
    lit = _enc(spark, words, BPE_MERGES, strategy="literal")
    join = _enc(spark, words, BPE_MERGES, strategy="join")
    assert lit == join


def test_early_stop_matches_fixed_rounds(spark):
    words = ["the", "agg", "customer"]
    a = _enc(spark, words, BPE_MERGES, max_rounds=6, early_stop=True)
    b = _enc(spark, words, BPE_MERGES, max_rounds=6, early_stop=False)
    assert a == b


def test_remaining_pairs_proves_convergence_and_detects_truncation(spark):
    df = spark.createDataFrame([("abc",)], ["w"])
    merges = [("a", "b"), ("ab", "c")]
    done = bpe_remaining_pairs(bpe_encode(df, "w", merges), "w", merges)
    assert done.collect()[0].n_remaining == 0
    # one round is NOT enough: (ab, c) still applicable afterwards
    cut = bpe_remaining_pairs(
        bpe_encode(df, "w", merges, max_rounds=1), "w", merges
    )
    assert cut.collect()[0].n_remaining == 1


def test_bpe_oracle_generator_in_sync():
    """The registered round-unrolled oracle embeds the same merge table
    and the same number of rounds as the gate query."""
    from data_engineering_nd_spark.registry import ORACLE_SQL, load_all_modules

    load_all_modules()
    sql = ORACLE_SQL["text_bpe_encode"]
    for i, (l, r) in enumerate(BPE_MERGES):
        assert f"({i}, '{l}', '{r}', '{l + r}')" in sql
    # unrolled exactly max_rounds=6 times: r0..r6 states, cp0..cp5 rounds
    assert "cp5 AS" in sql and "cp6 AS" not in sql
    assert "r6 s" in sql  # final state read by the output select
