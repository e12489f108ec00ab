"""Skew-aware join/aggregation utilities.

The engine's default story for skew is AQE (skewJoin.enabled splits
oversized sort-merge partitions at runtime — on in session.py). These are
the MANUAL tools for the cases AQE doesn't cover:

- ``salted_join``: hot fact keys spread over ``n_salts`` sub-keys, the
  dimension side replicated per salt. Use when the dim is too big to
  broadcast AND specific fact keys dominate (AQE can split a skewed
  sort-merge partition, but replication-by-salt also de-skews the
  downstream aggregation running on the join output).
- ``salted_group_count``: two-phase aggregation — partial count on
  (key, salt), final sum on key. De-skews a groupBy whose hot key would
  otherwise land one reducer with most of the data. (Catalyst's partial
  aggregation already does map-side combine; explicit salting matters
  when the hot key's post-combine volume is still a single-reducer
  bottleneck — e.g. high-cardinality payloads like collect_list.)

Salts are content-derived (xxhash64 of the row), never rand(): task
retries and speculative execution must re-produce identical salts or the
join drops/duplicates rows (same determinism rule as SURVEY §4.1's
monotonically_increasing_id ban).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across n_salts
    sub-partitions; the small side is replicated n_salts times (explode of
    a literal range — no shuffle of the big side beyond the join itself).

    Only big-side-preserving join types are allowed: replication makes
    right/full outer joins emit unmatched small-side rows once per salt."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, not {how!r}")
    big_salted = big.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
    )
    small_salted = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, [on, SALT], how).drop(SALT)


def salted_group_count(
    df: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe count: groupBy(key, salt) -> groupBy(key).

    Phase 1 shuffles on (key, salt) so a hot key occupies n_salts reducers;
    phase 2 moves only n_salts partial rows per key."""
    salted = df.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )
    partial = salted.groupBy(key, SALT).agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))


@query(
    "q26_salted_skew_groupby",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q26_salted_skew_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.event_type is low-cardinality (5 values over ~100k rows at
    sf0.1 — exactly the hot-key shape): the salted two-phase count must
    equal the plain groupBy."""
    ev = load(spark, "events", sf_dir)
    return salted_group_count(ev, "event_type")
