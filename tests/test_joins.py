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
