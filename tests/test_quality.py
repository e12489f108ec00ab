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
