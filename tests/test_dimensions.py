"""SCD Type 2 dimension maintenance (operators/dimensions.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_spark.operators.dimensions import scd2_apply


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k long, seg string, effective_from timestamp_ntz, "
        "effective_to timestamp_ntz, is_current boolean",
    )


def test_scd2_change_noop_and_insert(spark):
    import datetime as dt

    t0, t1 = dt.datetime(2020, 1, 1), dt.datetime(2024, 1, 1)
    current = _dim(spark, [
        (1, "A", t0, None, True),
        (2, "B", t0, None, True),
    ])
    updates = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (3, "C")], "k long, seg string"
    )
    out = scd2_apply(current, updates, "k", ["seg"], t1).collect()
    rows = {(r.k, r.seg): r for r in out}
    assert len(out) == 4
    # key 1 changed: closed old + new current
    assert rows[(1, "A")].effective_to == t1 and not rows[(1, "A")].is_current
    assert rows[(1, "A2")].effective_from == t1 and rows[(1, "A2")].is_current
    # key 2 identical: untouched (no churn), original effective_from kept
    assert rows[(2, "B")].is_current and rows[(2, "B")].effective_from == t0
    assert rows[(2, "B")].effective_to is None
    # key 3 new: inserted current
    assert rows[(3, "C")].is_current and rows[(3, "C")].effective_from == t1


def test_scd2_sequential_batches_accumulate_history(spark):
    import datetime as dt

    t0, t1, t2 = (dt.datetime(2020, 1, 1), dt.datetime(2022, 1, 1),
                  dt.datetime(2024, 1, 1))
    dim = _dim(spark, [(1, "A", t0, None, True)])
    upd1 = spark.createDataFrame([(1, "B")], "k long, seg string")
    dim = scd2_apply(dim, upd1, "k", ["seg"], t1)
    upd2 = spark.createDataFrame([(1, "C")], "k long, seg string")
    dim = scd2_apply(dim, upd2, "k", ["seg"], t2)
    rows = sorted(dim.collect(), key=lambda r: r.effective_from)
    assert [(r.seg, r.effective_to, r.is_current) for r in rows] == [
        ("A", t1, False), ("B", t2, False), ("C", None, True),
    ]
    # as-of join property: intervals tile time with no gap or overlap
    assert rows[0].effective_to == rows[1].effective_from
    assert rows[1].effective_to == rows[2].effective_from


def test_scd2_null_safe_no_churn(spark):
    import datetime as dt

    t0, t1 = dt.datetime(2020, 1, 1), dt.datetime(2024, 1, 1)
    dim = _dim(spark, [(1, None, t0, None, True)])
    upd = spark.createDataFrame([(1, None)], "k long, seg string")
    out = scd2_apply(dim, upd, "k", ["seg"], t1).collect()
    assert len(out) == 1 and out[0].is_current and out[0].effective_from == t0


def test_point_in_time_join_attributes_to_version_at_fact_time(spark):
    """A fact joins the dimension version valid AT its own timestamp —
    one match per fact, old rows for old facts, new rows for new ones,
    and facts outside every validity window drop out."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.dimensions import (
        point_in_time_join,
    )

    dim = spark.createDataFrame(
        [
            (1, "OLD", "2020-01-01 00:00:00", "2022-01-01 00:00:00"),
            (1, "NEW", "2022-01-01 00:00:00", None),
            (2, "ONLY", "2021-01-01 00:00:00", None),
        ],
        "k long, seg string, effective_from string, effective_to string",
    ).select(
        "k", "seg",
        F.col("effective_from").cast("timestamp_ntz").alias("effective_from"),
        F.col("effective_to").cast("timestamp_ntz").alias("effective_to"),
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2021-06-01 00:00:00"),  # inside OLD
            (101, 1, "2022-01-01 00:00:00"),  # boundary: NEW (>= from, < to)
            (102, 1, "2023-01-01 00:00:00"),  # NEW
            (103, 2, "2020-06-01 00:00:00"),  # before ONLY -> no match
        ],
        "fid long, k long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    out = point_in_time_join(facts, dim, "k", "k", F.col("f.ts"))
    got = {(r.fid): r.seg for r in out.select("f.fid", "d.seg").collect()}
    assert got == {100: "OLD", 101: "NEW", 102: "NEW"}
