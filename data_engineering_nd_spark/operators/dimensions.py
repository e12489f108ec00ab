"""Warehouse dimension maintenance: SCD Type 2.

The reference builds star-schema dimension tables but rebuilds them from
scratch every run (Capstone/scripts/etl.py writes each dimension with
mode('overwrite')) — attribute history is lost on every change. Slowly
Changing Dimension Type 2 is the standard fix: a changed attribute CLOSES
the current row (effective_to = batch time) and INSERTS a new current row,
so every fact can join to the attribute values that were true at its own
timestamp.

Scale shape: one batch touches only the CURRENT slice of the dimension
(history rows carry over untouched — with a table format this is a MERGE
that rewrites only files containing matched current rows, exactly the
`tables.VersionedTable.merge` copy-on-write path); the change detection is
one key-equi-join between the update batch and the current slice with a
null-safe any-column-differs predicate, and the update batch — typically
tiny next to the dimension — broadcasts. Nothing here scans history.

Determinism: the operator is a pure function of (current, updates,
batch_ts); no clocks, no RNG — a retried batch produces byte-identical
rows, which is what makes the SCD2 merge idempotent to re-runs when paired
with an idempotent writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    batch_ts,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.

    ``current`` carries (key, *tracked, effective_from, effective_to,
    is_current); ``updates`` carries (key, *tracked) observed at
    ``batch_ts``. Rules:

    - changed tracked attrs -> close the current row (effective_to =
      batch_ts, is_current = false) and insert the new version;
    - update identical to the current row -> no-op (null-safe compare,
      so NULL attribute values don't churn rows forever);
    - unseen key -> insert as the first current version;
    - keys absent from the batch, and ALL history rows -> unchanged.
    """
    ts = F.lit(batch_ts).cast("timestamp_ntz")
    cur = current.filter(F.col("is_current"))
    hist = current.filter(~F.col("is_current"))

    upd = F.broadcast(
        updates.select(
            key_col, *[F.col(c).alias(f"_u_{c}") for c in tracked_cols]
        )
    )
    joined = cur.join(upd, key_col, "right")
    differs = None
    for c in tracked_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
        differs = d if differs is None else (differs | d)
    # rows of the batch that change an existing key (current row exists
    # and any tracked column differs)
    changed_keys = joined.filter(
        F.col("effective_from").isNotNull() & differs
    ).select(key_col)
    new_keys = joined.filter(F.col("effective_from").isNull()).select(key_col)

    closed = (
        cur.join(F.broadcast(changed_keys), key_col, "left_semi")
        .withColumn("effective_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    untouched_cur = cur.join(F.broadcast(changed_keys), key_col, "left_anti")
    inserts = (
        updates.join(
            F.broadcast(changed_keys.unionByName(new_keys)), key_col, "left_semi"
        )
        .select(
            key_col,
            *tracked_cols,
            ts.alias("effective_from"),
            F.lit(None).cast("timestamp_ntz").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
    )
    cols = [key_col, *tracked_cols, "effective_from", "effective_to", "is_current"]
    return (
        hist.select(*cols)
        .unionByName(closed.select(*cols))
        .unionByName(untouched_cur.select(*cols))
        .unionByName(inserts)
    )


@query(
    "q68_scd2_customer_dim",
    oracle="""
    WITH cur AS (
        SELECT c_custkey, c_mktsegment, c_nationkey,
               TIMESTAMP '1990-01-01' AS effective_from
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, 'MACHINERY' AS seg, c_nationkey
        FROM customer WHERE c_custkey % 4 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'STARTUP', c_nationkey
        FROM customer WHERE c_custkey % 100 = 0
    ),
    changed AS (
        SELECT u.c_custkey FROM upd u JOIN cur c USING (c_custkey)
        WHERE c.c_mktsegment <> u.seg OR c.c_nationkey <> u.c_nationkey
    ),
    new_keys AS (
        SELECT u.c_custkey FROM upd u
        WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = u.c_custkey)
    )
    SELECT c_custkey, c_mktsegment, c_nationkey,
           effective_from,
           CASE WHEN c_custkey IN (SELECT * FROM changed)
                THEN TIMESTAMP '2024-01-01' END AS effective_to,
           c_custkey NOT IN (SELECT * FROM changed) AS is_current
    FROM cur
    UNION ALL
    SELECT u.c_custkey, u.seg, u.c_nationkey,
           TIMESTAMP '2024-01-01', NULL, TRUE
    FROM upd u
    WHERE u.c_custkey IN (SELECT * FROM changed)
       OR u.c_custkey IN (SELECT * FROM new_keys)
    """,
)
def q68_scd2_customer_dim_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCD2 batch against the customer dimension: every 4th customer
    moves to the MACHINERY segment (a no-op for those already there —
    pinning the null-safe no-churn rule) and every 100th key arrives
    shifted by 1e6 as a brand-new customer. The full resulting dimension
    — history, closed rows, surviving current rows, inserts — is
    value-hashed against the SQL mirror."""
    c = load(spark, "customer", sf_dir)
    current = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.lit("1990-01-01 00:00:00").cast("timestamp_ntz").alias("effective_from"),
        F.lit(None).cast("timestamp_ntz").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", F.lit("MACHINERY").alias("c_mktsegment"), "c_nationkey")
        .unionByName(
            c.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("STARTUP").alias("c_mktsegment"),
                "c_nationkey",
            )
        )
    )
    return scd2_apply(
        current,
        updates,
        "c_custkey",
        ["c_mktsegment", "c_nationkey"],
        "2024-01-01 00:00:00",
    )


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join: the read side of SCD2 — every fact joins
# the dimension version that was true AT ITS OWN timestamp.
# ---------------------------------------------------------------------------


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col,
) -> DataFrame:
    """FOR SYSTEM_TIME AS OF, DataFrame-style: equi-join on the key plus
    the validity residual ``ts >= effective_from AND (effective_to IS
    NULL OR ts < effective_to)``. A key's validity intervals partition
    time (scd2_apply guarantees it), so every fact matches AT MOST one
    version — no dedup, no window.

    Scale: this is ONE key-equi-join (the validity check is a residual
    filter inside it, not a range-join explosion); the dimension side is
    versions-per-key times larger than a Type-1 dim, still dimension-
    sized — broadcast when it fits, co-bucket on the key when it
    doesn't. Never a time-range join against history."""
    f, d = facts.alias("f"), dim.alias("d")
    ts = ts_col if not isinstance(ts_col, str) else F.col(ts_col)
    return f.join(
        d,
        (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}"))
        & (ts >= F.col("d.effective_from"))
        & (
            F.col("d.effective_to").isNull()
            | (ts < F.col("d.effective_to"))
        ),
    )


@query(
    "q82_point_in_time_join",
    oracle="""
    WITH cur AS (
        SELECT c_custkey, c_mktsegment, c_nationkey,
               TIMESTAMP '1990-01-01' AS effective_from
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, 'MACHINERY' AS seg, c_nationkey
        FROM customer WHERE c_custkey % 4 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'STARTUP', c_nationkey
        FROM customer WHERE c_custkey % 100 = 0
    ),
    changed AS (
        SELECT u.c_custkey FROM upd u JOIN cur c USING (c_custkey)
        WHERE c.c_mktsegment <> u.seg OR c.c_nationkey <> u.c_nationkey
    ),
    new_keys AS (
        SELECT u.c_custkey FROM upd u
        WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.c_custkey = u.c_custkey)
    ),
    dim AS (
        SELECT c_custkey, c_mktsegment, effective_from,
               CASE WHEN c_custkey IN (SELECT * FROM changed)
                    THEN TIMESTAMP '1995-06-01' END AS effective_to
        FROM cur
        UNION ALL
        SELECT u.c_custkey, u.seg, TIMESTAMP '1995-06-01', NULL
        FROM upd u
        WHERE u.c_custkey IN (SELECT * FROM changed)
           OR u.c_custkey IN (SELECT * FROM new_keys)
    )
    SELECT d.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND CAST(o.o_orderdate AS TIMESTAMP) >= d.effective_from
     AND (d.effective_to IS NULL
          OR CAST(o.o_orderdate AS TIMESTAMP) < d.effective_to)
    GROUP BY 1
    ORDER BY 1
    """,
)
def q82_point_in_time_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by the market segment each customer was in WHEN THEY
    ORDERED: the q68 change batch is applied mid-order-history
    (1995-06-01 — every 4th customer moves to MACHINERY), so an order
    placed before the change attributes to the OLD segment and one
    placed after to the new — the attribution error a Type-1 (overwrite)
    dimension silently bakes in. The dim is built by the real
    ``scd2_apply`` and read by ``point_in_time_join``; both the interval
    bookkeeping and the at-most-one-version guarantee sit under the
    value hash."""
    from data_engineering_nd_spark.analytics import dsum

    c = load(spark, "customer", sf_dir)
    current = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.lit("1990-01-01 00:00:00").cast("timestamp_ntz").alias("effective_from"),
        F.lit(None).cast("timestamp_ntz").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", F.lit("MACHINERY").alias("c_mktsegment"), "c_nationkey")
        .unionByName(
            c.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("STARTUP").alias("c_mktsegment"),
                "c_nationkey",
            )
        )
    )
    dim = scd2_apply(
        current, updates, "c_custkey", ["c_mktsegment", "c_nationkey"],
        "1995-06-01 00:00:00",
    )
    orders = load(spark, "orders", sf_dir)
    pit = point_in_time_join(
        orders, dim, "o_custkey", "c_custkey",
        F.col("o_orderdate").cast("timestamp_ntz"),
    )
    return (
        pit.groupBy(F.col("d.c_mktsegment").alias("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )
