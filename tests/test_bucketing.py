"""Bucketed tables (bucketing.py): the pre-shuffled join path.

The plan assertion is the point: a join of two tables bucketed on the
join key must contain ZERO Exchange operators — the shuffle happened
once at write time, not per query.
"""

import pytest
from pyspark.sql import Row

from data_engineering_nd_spark import bucketing
from data_engineering_nd_spark.plans.inspect import (
    count_exchanges,
    physical_plan,
)


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE bkt LOCATION '{tmp_path}/wh'")
    yield "bkt"
    spark.sql("DROP DATABASE bkt CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucket_db):
    orders = spark.createDataFrame(
        [Row(o_custkey=i % 50, o_orderkey=i, o_total=float(i)) for i in range(500)]
    )
    cust = spark.createDataFrame(
        [Row(o_custkey=i, c_name=f"c{i}") for i in range(50)]
    )
    bucketing.write_bucketed(orders, f"{bucket_db}.orders_b", ["o_custkey"], 4)
    bucketing.write_bucketed(cust, f"{bucket_db}.cust_b", ["o_custkey"], 4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(
            spark, f"{bucket_db}.orders_b", f"{bucket_db}.cust_b", ["o_custkey"]
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert count_exchanges(joined) == 0, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles_both_sides(spark):
    """Control: the identical join over plain frames costs two Exchanges —
    what bucketing removes."""
    orders = spark.createDataFrame(
        [Row(o_custkey=i % 50, o_orderkey=i) for i in range(500)]
    )
    cust = spark.createDataFrame(
        [Row(o_custkey=i, c_name=f"c{i}") for i in range(50)]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(cust, on=["o_custkey"])
        assert count_exchanges(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_shuffle(spark, bucket_db):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(k=i % 10, v=float(i)) for i in range(200)]
    )
    bucketing.write_bucketed(df, f"{bucket_db}.agg_b", ["k"], 4)
    agg = spark.table(f"{bucket_db}.agg_b").groupBy("k").agg(
        F.sum("v").alias("s")
    )
    assert count_exchanges(agg) == 0, physical_plan(agg)
    assert agg.count() == 10


def test_gated_bucketed_join_query_single_exchange(spark):
    """q76: the bucketed join contributes ZERO exchanges — the only
    shuffle in the whole plan is the final per-segment aggregate (AQE may
    pick broadcast or sort-merge for the join; neither may shuffle the
    bucketed fact side)."""
    from data_engineering_nd_spark.bucketing import q76_bucketed_join_revenue
    from data_engineering_nd_spark.plans.inspect import count_exchanges

    df = q76_bucketed_join_revenue(spark, "/root/testdata/sf0.001")
    assert count_exchanges(df) <= 1


def test_purge_table_resolves_catalog_location(spark, tmp_path):
    """purge_table must remove the table's REAL directory (resolved from
    the catalog) even when it differs from the warehouse-dir guess, and
    must also clear a leftover warehouse-dir collision candidate."""
    import os

    spark.sql(
        f"CREATE DATABASE purge_db LOCATION '{tmp_path}/elsewhere'"
    )
    try:
        df = spark.createDataFrame([Row(k=1, v="a")])
        df.write.saveAsTable("purge_db.scratch_t")
        loc = [
            r.data_type
            for r in spark.sql("DESCRIBE EXTENDED purge_db.scratch_t").collect()
            if r.col_name == "Location"
        ][0]
        real_dir = loc.removeprefix("file:")
        assert os.path.isdir(real_dir)
        bucketing.purge_table(spark, "purge_db.scratch_t")
        assert not spark.catalog.tableExists("purge_db.scratch_t")
        assert not os.path.isdir(real_dir)
        # recreate under the same name: must not hit LOCATION_ALREADY_EXISTS
        df.write.saveAsTable("purge_db.scratch_t")
        bucketing.purge_table(spark, "purge_db.scratch_t")
    finally:
        spark.sql("DROP DATABASE IF EXISTS purge_db CASCADE")


def test_session_token_is_identifier_safe(spark):
    tok = bucketing._session_token(spark)
    assert tok and tok == tok.strip("_") or tok  # non-empty
    import re

    assert re.fullmatch(r"\w+", tok)
