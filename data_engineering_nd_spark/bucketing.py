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
