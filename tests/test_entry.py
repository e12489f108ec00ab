"""Driver-contract smoke tests: entry() returns rows; every registered query
runs at sf0.001; every oracle key has a matching query."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 4


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize(
    "name",
    sorted(__import__("__spark_entry__").queries()),
)
def test_query_runs(spark, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SF_DIR)
    # every query must produce a stable schema and execute; most return rows
    assert df.columns
    df.count()


def test_approx_aggregates_within_bounds(spark):
    """q28's sketches must track the exact answers (HLL++ rsd=1%,
    percentile_approx accuracy=10000)."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.analytics import q28_approx_aggregates
    from data_engineering_nd_spark.catalog import load

    sf = "/root/testdata/sf0.01"
    approx = {r.l_returnflag: r for r in q28_approx_aggregates(spark, sf).collect()}
    exact = {
        r.l_returnflag: r
        for r in load(spark, "lineitem", sf)
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.approx_orders - e.orders) / e.orders < 0.05
        assert abs(a.approx_p50 - e.p50) / e.p50 < 0.02

    # cross-engine delta: DuckDB's own HLL estimate must agree with
    # Spark's within the combined error budget (both sketches target the
    # same exact cardinality; their estimates may differ, not diverge).
    import duckdb

    duck = {
        flag: n
        for flag, n in duckdb.sql(
            f"SELECT l_returnflag, approx_count_distinct(l_orderkey) "
            f"FROM '{sf}/lineitem.parquet' GROUP BY l_returnflag"
        ).fetchall()
    }
    for flag, e in exact.items():
        assert abs(approx[flag].approx_orders - duck[flag]) / e.orders < 0.08


def test_stratified_sample_fractions(spark):
    """q40: per-stratum sample sizes track the requested fractions, and
    fraction-1.0 strata are complete."""
    from data_engineering_nd_spark.analytics import q40_stratified_sample
    from data_engineering_nd_spark.catalog import load

    sf = "/root/testdata/sf0.01"
    sampled = {r.event_type: r.n_sampled for r in q40_stratified_sample(spark, sf).collect()}
    totals = {
        r.event_type: r["count"]
        for r in load(spark, "events", sf).groupBy("event_type").count().collect()
    }
    assert sampled["purchase"] == totals["purchase"]
    assert sampled["error"] == totals["error"]
    assert 0.05 < sampled["click"] / totals["click"] < 0.2  # ~0.1
    assert 0.3 < sampled["signup"] / totals["signup"] < 0.7  # ~0.5
