from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.operators.joins import salted_group_count, salted_join

SF_DIR = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    orders = load(spark, "orders", SF_DIR).select("o_orderkey", "o_custkey")
    cust = load(spark, "customer", SF_DIR).select("c_custkey", "c_name")
    cust = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, "o_custkey", n_salts=8).count()
    assert salted == plain
    # left join keeps unmatched big-side rows exactly once
    plain_left = orders.join(cust, "o_custkey", "left").count()
    salted_left = salted_join(orders, cust, "o_custkey", n_salts=8, how="left").count()
    assert salted_left == plain_left


def test_salted_group_count_matches_plain(spark):
    ev = load(spark, "events", SF_DIR)
    plain = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    salted = {r.event_type: r.n for r in salted_group_count(ev, "event_type", n_salts=8).collect()}
    assert salted == plain


def test_salts_are_deterministic_across_repartition(spark):
    # re-running after an arbitrary repartition must give identical results
    # (rand()-based salting breaks under task retry; xxhash64 cannot)
    ev = load(spark, "events", SF_DIR).repartition(7)
    a = {r.event_type: r.n for r in salted_group_count(ev, "event_type").collect()}
    b = {r.event_type: r.n for r in salted_group_count(ev.repartition(3), "event_type").collect()}
    assert a == b


def test_asof_join_semantics(spark):
    from data_engineering_nd_spark.operators.joins import asof_join

    build = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "x")], ["k", "t", "v"]
    )
    probe = spark.createDataFrame(
        [(101, 1, 5), (102, 1, 10), (103, 1, 19), (104, 1, 25), (105, 2, 14), (106, 3, 50)],
        ["pid", "k", "t"],
    )
    got = {r.pid: r.asof_v for r in asof_join(probe, build, "k", "t", "v").collect()}
    assert got == {
        101: None,   # before any build row
        102: "a",    # tie: build at same ts wins (>= semantics)
        103: "a",    # most recent at-or-before
        104: "b",
        105: None,   # build for key 2 is later
        106: None,   # key never in build
    }
    inner = asof_join(probe, build, "k", "t", "v", how="inner")
    assert {r.pid for r in inner.collect()} == {102, 103, 104}


def test_range_join_bucketed_boundaries(spark):
    from data_engineering_nd_spark.operators.joins import range_join_bucketed

    iv = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "2024-01-01 12:00:00")], ["wid", "s", "e"]
    ).selectExpr("wid", "CAST(s AS TIMESTAMP) AS s", "CAST(e AS TIMESTAMP) AS e")
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 09:59:59"),  # before -> excluded
            (2, "2024-01-01 10:00:00"),  # at start -> included
            (3, "2024-01-01 11:30:00"),  # inside, different bucket -> included
            (4, "2024-01-01 12:00:00"),  # at end -> excluded (half-open)
        ],
        ["eid", "t"],
    ).selectExpr("eid", "CAST(t AS TIMESTAMP) AS t")
    got = {
        r.eid
        for r in range_join_bucketed(ev, "t", iv, "s", "e", bucket_seconds=3600).collect()
    }
    assert got == {2, 3}


def test_salted_join_force_shuffle_pins_the_salted_path(spark):
    """force_shuffle=True must keep the replicated dim OUT of a broadcast
    (AQE would otherwise broadcast a tiny test dim and the salted path
    would never execute) while the result still equals the plain join."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.joins import salted_join

    fact = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    dim = fact.select("k").distinct().withColumn("w", F.length("k").cast("long"))

    salted = salted_join(fact, dim, "k", n_salts=16, force_shuffle=True)
    plain = fact.join(dim, "k")
    agg = lambda df: {  # noqa: E731
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s"))
        .collect()
    }
    assert agg(salted) == agg(plain)
    assert salted.count() == 1000  # inner join keeps every fact row exactly once

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan  # the hint held: no broadcast
    assert "__salt" in plan  # ...and the join key carries the salt


def test_forward_asof_join_semantics(spark):
    """Forward as-of on a crafted timeline: inclusive tie at the probe's
    own ts, next-following otherwise, NULL when nothing follows."""
    from data_engineering_nd_spark.operators.joins import asof_join_forward

    build = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, 2.0), ("v", 5, 9.0)],
        ["user_id", "ts", "val"],
    )
    probe = spark.createDataFrame(
        [(1, "u", 9), (2, "u", 10), (3, "u", 11), (4, "u", 21), (5, "v", 1)],
        ["event_id", "user_id", "ts"],
    )
    got = {
        r.event_id: r.asof_next_val
        for r in asof_join_forward(probe, build, "user_id", "ts", "val").collect()
    }
    assert got == {1: 1.0, 2: 1.0, 3: 2.0, 4: None, 5: 9.0}
    # inner drops the unmatched probe
    inner = asof_join_forward(probe, build, "user_id", "ts", "val", how="inner")
    assert {r.event_id for r in inner.collect()} == {1, 2, 3, 5}


def test_asof_joins_do_not_skip_null_build_values(spark):
    """A build row whose value is legitimately NULL is still the nearest
    match (DuckDB ASOF semantics) — the carried-struct fix; carrying the
    bare value would skip past it to an older/newer row."""
    from data_engineering_nd_spark.operators.joins import (
        asof_join,
        asof_join_forward,
    )

    build = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 20, None), ("u", 30, 3.0)],
        "user_id string, ts long, val double",
    )
    probe = spark.createDataFrame(
        [(1, "u", 25), (2, "u", 15)], ["event_id", "user_id", "ts"]
    )
    back = {
        r.event_id: r.asof_val
        for r in asof_join(probe, build, "user_id", "ts", "val").collect()
    }
    assert back == {1: None, 2: 1.0}  # ts=25 matches the NULL at ts=20
    fwd = {
        r.event_id: r.asof_next_val
        for r in asof_join_forward(probe, build, "user_id", "ts", "val").collect()
    }
    assert fwd == {1: 3.0, 2: None}  # ts=15 matches the NULL at ts=20
    # inner keeps rows whose nearest match EXISTS, even with a NULL value
    inner = asof_join(probe, build, "user_id", "ts", "val", how="inner")
    assert {r.event_id for r in inner.collect()} == {1, 2}


def test_bloom_filter_has_no_false_negatives(spark):
    """Every inserted key must pass its own filter (Bloom guarantee); a
    disjoint key set at ~8 bits/key must be mostly pruned."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.bloom import (
        bloom_build,
        bloom_probe_expr,
        size_m_bits,
    )

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    m = size_m_bits(200)
    words = bloom_build(keys, "k", m)
    assert keys.filter(~bloom_probe_expr(F.col("k"), words, m)).count() == 0
    others = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    passed = others.filter(bloom_probe_expr(F.col("k"), words, m)).count()
    # ~3% expected at 8 bits/key, k=3; generous bound against family luck
    assert passed < 10_000 * 0.15


def test_size_m_bits_is_word_aligned_and_capped():
    from data_engineering_nd_spark.operators.bloom import (
        M_CAP,
        size_m_bits,
    )

    assert size_m_bits(0) == 32
    assert size_m_bits(1) == 32
    assert size_m_bits(20) == 160
    assert size_m_bits(1000) == 8000
    assert size_m_bits(10**9) == M_CAP
    for n in (1, 3, 7, 20, 100, 12345):
        assert size_m_bits(n) % 32 == 0


def test_bloom_prune_filter_sits_below_the_exchange(spark):
    """q80's plan pin (VERDICT r07 task #2): the bloom probe runs as a
    Filter directly above the lineitem scan — BEFORE any Exchange — so at
    scale the pruned rows are never shuffled. Also: the dim joins stay
    broadcast and the probe stays out of Python."""
    import re

    from data_engineering_nd_spark.operators.bloom import q80_bloom_join_prune
    from data_engineering_nd_spark.plans.inspect import (
        assert_no_python_udf_in,
        simple_plan,
    )

    df = q80_bloom_join_prune(spark, "/root/testdata/sf0.001")
    assert_no_python_udf_in(df)
    plan = simple_plan(df)
    # find the lineitem branch that feeds the join (carries the probe
    # filter): walk lines; the Filter containing element_at must appear
    # between the last Exchange above it and the lineitem FileScan
    lines = plan.splitlines()
    scan_idx = [
        i
        for i, ln in enumerate(lines)
        if "FileScan" in ln and "lineitem" in ln and "struct<l_suppkey" in ln
    ]
    assert scan_idx, plan
    i = scan_idx[0]
    between = []
    for j in range(i - 1, -1, -1):
        if "Exchange" in lines[j] or "FileScan" in lines[j]:
            break
        between.append(lines[j])
    assert any(
        "Filter" in ln and "element_at" in ln for ln in between
    ), plan
    # probed fact feeds a broadcast join (dim side moves, fact side
    # doesn't): no shuffle between the filtered scan and the join
    assert not any(
        re.search(r"Exchange (hash|range|Round)", ln) for ln in between
    ), plan


def test_hybrid_skew_join_equals_plain_join(spark):
    """Planted skew: the split join's rows equal the plain join's, the
    hot tag isolates exactly the heavy key, and the plan carries both a
    broadcast (hot) and a sort-merge (cold) path under one Union."""
    import pandas as pd

    from data_engineering_nd_spark.operators.joins import hybrid_skew_join

    fact_rows = [("hot", i) for i in range(50)] + [
        ("c1", 1), ("c1", 2), ("c2", 3)
    ]
    fact = spark.createDataFrame(pd.DataFrame(fact_rows, columns=["k", "v"]))
    dim = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "c1", "c2"], "w": [10, 20, 30]})
    )
    hot_keys = spark.createDataFrame(pd.DataFrame({"k": ["hot"]}))
    out = hybrid_skew_join(fact, dim, "k", hot_keys, force_shuffle_cold=True)
    plain = fact.join(dim, "k")
    got = sorted((r.k, r.v, r.w, r.is_hot) for r in out.collect())
    want = sorted(
        (r.k, r.v, r.w, 1 if r.k == "hot" else 0) for r in plain.collect()
    )
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan
    assert "SortMergeJoin" in plan          # pinned cold path
    assert "BroadcastHashJoin" in plan      # hot path + splits
    assert "BroadcastNestedLoopJoin" not in plan


def test_q94_hot_key_classification(spark, tmp_path):
    """1.5x-mean threshold: the planted heavy key lands in the hot class,
    uniform keys in the cold class, and revenues reconcile."""
    import pandas as pd

    from data_engineering_nd_spark.operators.joins import q94_hybrid_skew_join

    rows = [(1, 100.0, 0.0)] * 20 + [(2, 10.0, 0.0)] * 2 + [(3, 10.0, 0.0)] * 2
    li = pd.DataFrame(rows, columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = pd.DataFrame({"p_partkey": [1, 2, 3], "p_name": ["a", "b", "c"]})
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(li).write.parquet(str(sf / "lineitem.parquet"))
    spark.createDataFrame(part).write.parquet(str(sf / "part.parquet"))
    out = {r.is_hot: r for r in q94_hybrid_skew_join(spark, str(sf)).collect()}
    # mean count = 8; hot iff cnt > 12 -> only key 1
    assert out[1].n_keys == 1 and out[1].n_rows == 20
    assert out[0].n_keys == 2 and out[0].n_rows == 4
    assert out[1].revenue == 2000.0 and out[0].revenue == 40.0
    assert out[1].n_names == 1 and out[0].n_names == 2


def test_interval_overlap_join_matches_brute_force(spark):
    """Bucketed anchor join == naive cross-join overlap filter, across
    intervals that span 1, 2 and 3+ buckets, touch at endpoints, nest,
    and are disjoint — and each qualifying pair is emitted exactly once
    (the anchor condition is the dedup)."""
    from data_engineering_nd_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [
        (1, 0, 5), (2, 5, 9),      # touch at endpoint 5 (inclusive)
        (3, 10, 40), (4, 12, 14),  # nested, b inside a, spans buckets
        (5, 41, 41),               # point interval, disjoint from 3
        (6, 7, 25),                # spans 3 buckets of width 8
        (7, 100, 110),             # far away
    ]
    a = spark.createDataFrame(
        [(k, s, e) for k, s, e in rows], "a_k long, a_s long, a_e long"
    )
    b = spark.createDataFrame(
        [(k, s, e) for k, s, e in rows], "b_k long, b_s long, b_e long"
    )
    got = sorted(
        (r.a_k, r.b_k)
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", bucket_width=8
        )
        .filter("a_k < b_k")
        .collect()
    )
    want = sorted(
        (ak, bk)
        for ak, as_, ae in rows
        for bk, bs, be in rows
        if ak < bk and as_ <= be and bs <= ae
    )
    assert got == want
    assert (1, 2) in got and (3, 4) in got and (3, 6) in got
    assert (3, 5) not in got
