"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

The reference's star schema joins fact ``i94_trips`` to dimensions on the
same keys every day (SURVEY.md §2.3) but stores everything as plain
directories, so every join re-shuffles the fact table. Bucketing moves
that shuffle to WRITE time, once: ``bucketBy(N, key)`` hash-partitions
rows into N files per partition and records the layout in the catalog;
any later equi-join or aggregation on the bucket key reads both sides
already co-partitioned — zero Exchange in the plan.

At 100 TB this is the single biggest repeated-join win available:
a fact-fact join on a bucketed key skips two full-table shuffles per run.
Rules of thumb encoded here:

- bucket count should divide evenly into executor parallelism and keep
  each bucket file in the 100 MB - 1 GB range at target scale (pass it
  explicitly; there is no safe default at unknown data sizes);
- ``sortBy`` the bucket key too: sort-merge join then skips its sort;
- both join sides must agree on the bucket count (or enable
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` for ratios).

Works against the session catalog (in-memory or Hive); data lands under
``spark.sql.warehouse.dir``. The reference has no catalog at all — table
identity is a path naming convention (etl.py:434-496).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a parquet table hash-bucketed (and bucket-sorted) on
    ``bucket_cols``. Joins/aggregations on those columns then need no
    shuffle, and sort-merge joins need no sort."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def _session_token(spark: SparkSession) -> str:
    """Identifier-safe token unique to this SparkSession (derived from the
    applicationId, e.g. ``local-1755...``). Scratch catalog tables suffixed
    with it cannot collide across concurrently-running sessions; within a
    session the name is stable, so re-runs purge-and-replace their own."""
    import re

    return re.sub(r"\W+", "_", spark.sparkContext.applicationId)


def purge_table(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND remove its on-disk location.

    A managed table's directory survives ``DROP TABLE`` in Spark's
    in-memory catalog, so a later ``saveAsTable`` under the same name in a
    fresh session fails with LOCATION_ALREADY_EXISTS. When the catalog
    still has the entry, the real location is resolved via ``DESCRIBE
    EXTENDED`` (warehouse conf and actual location can disagree); the
    current-warehouse candidate path is removed as well, because after a
    session restart the in-memory catalog entry is gone while the
    directory — exactly where the NEXT create would land — remains."""
    import os
    import shutil
    from urllib.parse import urlparse

    paths = set()
    try:
        if spark.catalog.tableExists(table):
            for row in spark.sql(f"DESCRIBE EXTENDED {table}").collect():
                if row.col_name == "Location":
                    loc = urlparse(row.data_type)
                    if loc.scheme in ("", "file"):
                        paths.add(loc.path)
    except Exception:
        pass
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if warehouse.scheme in ("", "file"):
        paths.add(os.path.join(warehouse.path, table.split(".")[-1]))
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two catalog tables bucketed on ``on``. When both sides share
    the bucket spec this plans as an exchange-free sort-merge join
    (verified by tests/test_tables.py::test_bucketed_join_has_no_shuffle).
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


# ---------------------------------------------------------------------------
# The bucketed co-located join under the gate
# ---------------------------------------------------------------------------

from data_engineering_nd_spark.registry import query  # noqa: E402


@query(
    "q76_bucketed_join_revenue",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q76_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order revenue through BUCKETED tables: orders and
    customer land in the session catalog hash-bucketed (and bucket-
    sorted) on the customer key, so the join reads both sides already
    co-partitioned — the ONLY shuffle in the plan is the final
    per-segment aggregate (pinned in tests/test_bucketing.py). Results
    must equal the plain join, which the oracle states directly.

    This is the write-once/join-many layout the i94 star schema (and any
    daily fact-dim pipeline) wants at 100 TB: the fact-side shuffle is
    paid once at write time instead of once per run."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.catalog import load

    orders = load(spark, "orders", sf_dir).select("o_custkey", "o_totalprice")
    cust = load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    # Scratch names carry a per-session token (sanitized applicationId) so
    # concurrent sessions never clobber each other's tables, and the purge
    # resolves the table's REAL location from the catalog rather than
    # guessing from spark.sql.warehouse.dir (ADVICE r07: the two can
    # disagree for qualified tables / path-encoded characters).
    tok = _session_token(spark)
    t_orders = f"gate_orders_bucketed_{tok}"
    t_cust = f"gate_customer_bucketed_{tok}"
    for t in (t_orders, t_cust):
        purge_table(spark, t)
    write_bucketed(orders, t_orders, ["o_custkey"], 8)
    write_bucketed(cust, t_cust, ["o_custkey"], 8)
    joined = bucketed_join(spark, t_orders, t_cust, ["o_custkey"])
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )
