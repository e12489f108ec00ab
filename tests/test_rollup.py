"""Incremental rollup maintenance: N incremental updates must equal one
full aggregation over the concatenated input, exactly."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_nd_spark.operators.rollup import (
    read_rollup,
    update_rollup,
)
from data_engineering_nd_spark.tables import VersionedTable

SPECS = {
    "n": ("count", ""),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _batch(spark, rows):
    return spark.createDataFrame([Row(k=k, v=float(v)) for k, v in rows])


def test_incremental_equals_full_recompute(spark, tmp_path):
    table = VersionedTable(spark, str(tmp_path / "rollup"))
    b1 = _batch(spark, [("a", 1), ("a", 2), ("b", 10)])
    b2 = _batch(spark, [("a", 4), ("c", 7)])
    b3 = _batch(spark, [("b", -5), ("c", 0), ("a", 8)])
    for b in (b1, b2, b3):
        update_rollup(table, b, ["k"], SPECS)

    full = (
        b1.unionByName(b2).unionByName(b3)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
    got = {r.k: r for r in table.snapshot().collect()}
    want = {r.k: r for r in full.collect()}
    assert set(got) == set(want)
    for k in want:
        assert (got[k].n, got[k].total, got[k].lo, got[k].hi) == (
            want[k].n, want[k].total, want[k].lo, want[k].hi
        ), k


def test_merge_cost_is_group_bound_not_history_bound(spark, tmp_path):
    """State row count stays at group cardinality no matter how many
    batches fold in — the property that makes this viable at 100 TB."""
    table = VersionedTable(spark, str(tmp_path / "rollup"))
    for i in range(5):
        update_rollup(
            table,
            _batch(spark, [("a", i), ("b", i * 2)]),
            ["k"],
            SPECS,
        )
    assert table.snapshot().count() == 2
    assert len(table.versions()) == 5  # every update is a rollback point


def test_derived_avg_and_time_travel(spark, tmp_path):
    table = VersionedTable(spark, str(tmp_path / "rollup"))
    update_rollup(table, _batch(spark, [("a", 2), ("a", 4)]), ["k"], SPECS)
    update_rollup(table, _batch(spark, [("a", 12)]), ["k"], SPECS)

    out = read_rollup(table, derived_avgs={"avg_v": ("total", "n")}).collect()
    assert out[0].avg_v == pytest.approx(6.0)
    # time travel to the pre-batch-2 state
    old = table.snapshot(version=0).collect()
    assert old[0].n == 2
