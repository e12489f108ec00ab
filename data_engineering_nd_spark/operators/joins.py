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
from pyspark.sql.window import Window

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    force_shuffle: bool = False,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread across n_salts
    sub-partitions; the small side is replicated n_salts times (explode of
    a literal range — no shuffle of the big side beyond the join itself).

    Only big-side-preserving join types are allowed: replication makes
    right/full outer joins emit unmatched small-side rows once per salt.

    ``force_shuffle`` pins the shuffle_hash strategy on the replicated
    side. Salting only matters when the build side is beyond the
    broadcast threshold; the flag keeps small-fixture demonstrations and
    plan pins honest (AQE would otherwise broadcast a tiny test dim and
    the salted path would never execute)."""
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
    if force_shuffle:
        small_salted = small_salted.hint("shuffle_hash")
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


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    how: str = "left",
) -> DataFrame:
    """As-of join: each probe row gets the build row with the greatest
    build.ts <= probe.ts for its key (the time-series enrichment join Spark
    lacks natively; DuckDB/kdb call it ASOF JOIN).

    Implementation is a union + last-value carry-forward window, NOT a
    range self-join: tag build rows seq=0 and probe rows seq=1, sort each
    key's timeline once, and carry the last non-null build value forward.
    One shuffle on the key, O(n log n) per key for the sort, no quadratic
    candidate space — at 100 TB this is the only shape that survives
    (a theta-join on ts <= ts would plan as a broadcast-nested-loop).
    Ties (build.ts == probe.ts) resolve build-first, matching DuckDB's
    ASOF >= semantics.

    The carried payload is a (marker, value) STRUCT, not the bare value:
    ``last(..., ignorenulls)`` must skip only PROBE rows — a build row
    whose value_col is legitimately NULL is still the nearest match, and
    carrying the bare value would skip past it to an older row (a
    divergence from ASOF semantics that only shows once build values can
    be NULL).
    """
    carried = f"asof_{value_col}"
    vtype = dict(build.dtypes)[value_col]
    b = build.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__seq"),
        F.struct(F.lit(1).alias("m"), F.col(value_col).alias("v")).alias("__cv"),
        *[F.lit(None).cast(t).alias(c) for c, t in probe.dtypes],
    )
    p = probe.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__seq"),
        F.lit(None).cast(f"struct<m:int,v:{vtype}>").alias("__cv"),
        *[F.col(c) for c in probe.columns],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        b.unionByName(p)
        .withColumn("__cv", F.last("__cv", ignorenulls=True).over(w))
        .filter(F.col("__seq") == 1)
        .withColumn(carried, F.col("__cv.v"))
    )
    if how == "inner":
        joined = joined.filter(F.col("__cv").isNotNull())
    return joined.drop("__k", "__ts", "__seq", "__cv")


@query(
    "q37_asof_join",
    oracle="""
    WITH build AS (
        SELECT user_id, ts, value AS status_value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events
        WHERE event_id % 10 = 0
    ),
    b AS (SELECT user_id, ts, status_value FROM build WHERE rn = 1)
    SELECT
        e.event_id,
        e.user_id,
        CAST(e.ts AS TIMESTAMP) AS ts,
        round(b.status_value, 4) AS asof_status
    FROM events e
    ASOF LEFT JOIN b ON e.user_id = b.user_id AND e.ts >= b.ts
    """,
)
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with the most recent 'status update' (every 10th
    event) at or before its timestamp."""
    ev = load(spark, "events", sf_dir)
    build = (
        ev.filter(F.col("event_id") % 10 == 0)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy("event_id")
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("value").alias("status_value"))
    )
    probe = ev.select("event_id", "user_id", "ts")
    return asof_join(probe, build, "user_id", "ts", "status_value").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.round("asof_status_value", 4).alias("asof_status"),
    )


def range_join_bucketed(
    events: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-containment join (ts in [start, end)) as an EQUI-join.

    The naive formulation is a theta-join, which Spark plans as a (broadcast)
    nested loop — quadratic scans at scale. Bucketing fixes the shape: each
    interval explodes into the coarse time buckets it overlaps, each event
    has exactly one bucket, and the join becomes hash-partitioned equi on
    the bucket id with an exact residual filter. Work is O(events +
    intervals x buckets-per-interval); pick bucket_seconds near the typical
    interval length so that factor stays small.
    """
    ev_bucket = (F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_seconds).cast(
        "long"
    )
    s_bucket = (
        F.unix_timestamp(F.col(start_col).cast("timestamp")) / bucket_seconds
    ).cast("long")
    e_bucket = (
        F.unix_timestamp(F.col(end_col).cast("timestamp")) / bucket_seconds
    ).cast("long")
    ev = events.withColumn("__bucket", ev_bucket)
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(s_bucket, e_bucket)))
    return ev.join(iv, "__bucket").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("__bucket")


@query(
    "q38_range_join",
    oracle="""
    WITH windows AS (
        SELECT event_id AS window_id,
               CAST(ts AS TIMESTAMP) AS w_start,
               CAST(ts AS TIMESTAMP) + INTERVAL '1 hour' AS w_end
        FROM events
        WHERE event_id % 500 = 0
    )
    SELECT
        w.window_id,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM windows w
    JOIN events e
      ON CAST(e.ts AS TIMESTAMP) >= w.w_start AND CAST(e.ts AS TIMESTAMP) < w.w_end
    GROUP BY w.window_id
    """,
)
def q38_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count events inside 1-hour observation windows anchored at every
    500th event — containment expressed as bucketed equi-join."""
    ev = load(spark, "events", sf_dir)
    windows = ev.filter(F.col("event_id") % 500 == 0).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end"),
    )
    probe = ev.select("ts", "value")
    return (
        range_join_bucketed(probe, "ts", windows, "w_start", "w_end")
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width: int,
) -> DataFrame:
    """INTERVAL-OVERLAP join (both sides are intervals; inclusive bounds):
    emit every (a, b) pair with ``a_start <= b_end AND b_start <= a_end``
    — the temporal/genomic overlap-join primitive that q38's
    containment join (point in interval) cannot express.

    Scale shape: the theta formulation is a nested loop, quadratic at
    scale. Instead each interval explodes into the fixed-width buckets
    it spans and the join is hash-partitioned EQUI on the bucket id with
    the exact overlap predicate as a residual. Duplicate elimination is
    FREE — no distinct shuffle: a qualifying pair is emitted only from
    the bucket containing the OVERLAP START ``max(a_start, b_start)``
    (that point lies in both intervals, so exactly one common bucket
    satisfies the anchor condition). Work is O(sum of interval spans /
    bucket_width) exploded rows plus the per-bucket join; pick
    ``bucket_width`` near the typical interval length so the explosion
    factor stays ~2 and no bucket collects more than a time-slice of
    intervals.

    Start/end columns must be integer-valued (epoch days/seconds);
    column names must not collide across ``a`` and ``b`` (pre-alias)."""
    ab = a.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{a_start} div {bucket_width}"),
                F.expr(f"{a_end} div {bucket_width}"),
            )
        ),
    )
    bb = b.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{b_start} div {bucket_width}"),
                F.expr(f"{b_end} div {bucket_width}"),
            )
        ),
    )
    anchor = F.expr(
        f"greatest({a_start}, {b_start}) div {bucket_width}"
    )
    return (
        ab.join(bb, "__bucket")
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (F.col("__bucket") == anchor)
        )
        .drop("__bucket")
    )


@query(
    "q103_interval_overlap_join",
    oracle="""
    WITH iv AS (
        SELECT o_orderkey AS k, o_orderpriority AS p,
               datediff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS s,
               datediff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE))
                   + o_orderkey % 14 + 1 AS e
        FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1995
    )
    SELECT a.p AS a_priority, b.p AS b_priority,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1) AS BIGINT)
               AS overlap_days,
           CAST(SUM(a.k + b.k) AS BIGINT) AS key_checksum
    FROM iv a
    JOIN iv b
      ON a.k < b.k AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.p, b.p
    """,
)
def q103_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-order analysis via the interval-OVERLAP join: each 1995
    order holds a processing window [orderdate, orderdate + 1..14 days]
    (length keyed off the orderkey, deterministic); every overlapping
    pair of DISTINCT orders (a < b on key) is found with the bucketed
    anchor join — never a nested loop, never a distinct — and rolled up
    per priority pair with the exact total overlap days and a key-sum
    checksum (any lost or duplicated pair shifts it).

    The oracle states the same join as the naive inequality theta-join —
    identical result, quadratic cost class — which is exactly the
    equivalence that makes the bucketed rewrite safe at 100 TB."""
    o = load(spark, "orders", sf_dir).filter(
        F.year(F.col("o_orderdate").cast("date")) == 1995
    )
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("p"),
        day.alias("s"),
        (day + F.col("o_orderkey") % 14 + 1).alias("e"),
    )
    a = iv.select(
        F.col("k").alias("a_k"), F.col("p").alias("a_p"),
        F.col("s").alias("a_s"), F.col("e").alias("a_e"),
    )
    b = iv.select(
        F.col("k").alias("b_k"), F.col("p").alias("b_p"),
        F.col("s").alias("b_s"), F.col("e").alias("b_e"),
    )
    pairs = interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bucket_width=16
    ).filter(F.col("a_k") < F.col("b_k"))
    return pairs.groupBy(
        F.col("a_p").alias("a_priority"), F.col("b_p").alias("b_priority")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.least("a_e", "b_e") - F.greatest("a_s", "b_s") + F.lit(1)
        ).cast("bigint").alias("overlap_days"),
        F.sum(F.col("a_k") + F.col("b_k")).cast("bigint").alias(
            "key_checksum"
        ),
    )


# ---------------------------------------------------------------------------
# The salted join under the gate: q26 covers the group-by half of the skew
# toolkit; this puts the JOIN half (salted_join above) under a value-hash
# oracle.
# ---------------------------------------------------------------------------


@query(
    "q75_salted_skew_join",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT event_type,
               CAST(strlen(event_type) AS BIGINT) AS weight
        FROM events
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value * d.weight AS DECIMAL(18,4))) AS DOUBLE)
               AS weighted_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def q75_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join via salting: events.event_type has 5 values over
    ~100k rows at sf0.1 — an unsalted shuffle join would put ~all rows of
    a type on one reducer. The salted plan joins on (event_type, content
    salt) against the 16x-replicated dim and must equal the plain
    join+aggregate, which the oracle states directly (the salt routes
    rows, it never changes the result). The 5-row test dim would of
    course broadcast in production — force_shuffle pins the PATTERN
    (deterministic salt, explode-replicated build, equi-join on the
    salted key) for dims beyond the broadcast threshold, where this is
    the only shape that survives a hot key at 100 TB."""
    ev = load(spark, "events", sf_dir)
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("long"))
    )
    joined = salted_join(
        ev, dim, "event_type", n_salts=16, force_shuffle=True
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value") * F.col("weight")).cast("decimal(18,4)"))
        .cast("double")
        .alias("weighted_value"),
    )


def asof_join_forward(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    how: str = "left",
) -> DataFrame:
    """FORWARD as-of join: each probe row gets the build row with the
    SMALLEST build.ts >= probe.ts for its key — the "next scheduled
    change" enrichment (deadline lookup, next price revision), the mirror
    of :func:`asof_join`'s latest-at-or-before.

    Same union-plus-window shape (one shuffle on the key, no quadratic
    candidate space): probe rows tag seq=0, build rows seq=1, and the
    carried value is the FIRST non-null over [current row, unbounded
    following] in (ts, seq) order — a build at the probe's exact ts sorts
    after the probe, so ties match inclusively, like DuckDB's ASOF <=.

    Payload carried as a (marker, value) struct for the same reason as
    :func:`asof_join`: a NULL build value is still the nearest match and
    must not be skipped for a farther-future row."""
    carried = f"asof_next_{value_col}"
    vtype = dict(build.dtypes)[value_col]
    b = build.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__seq"),
        F.struct(F.lit(1).alias("m"), F.col(value_col).alias("v")).alias("__cv"),
        *[F.lit(None).cast(t).alias(c) for c, t in probe.dtypes],
    )
    p = probe.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__seq"),
        F.lit(None).cast(f"struct<m:int,v:{vtype}>").alias("__cv"),
        *[F.col(c) for c in probe.columns],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__seq")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    joined = (
        b.unionByName(p)
        .withColumn("__cv", F.first("__cv", ignorenulls=True).over(w))
        .filter(F.col("__seq") == 0)
        .withColumn(carried, F.col("__cv.v"))
    )
    if how == "inner":
        joined = joined.filter(F.col("__cv").isNotNull())
    return joined.drop("__k", "__ts", "__seq", "__cv")


@query(
    "q79_forward_asof_join",
    oracle="""
    WITH build AS (
        SELECT user_id, ts, value AS status_value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events
        WHERE event_id % 10 = 0
    ),
    b AS (SELECT user_id, ts, status_value FROM build WHERE rn = 1)
    SELECT
        e.event_id,
        e.user_id,
        CAST(e.ts AS TIMESTAMP) AS ts,
        round(b.status_value, 4) AS next_status
    FROM events e
    ASOF LEFT JOIN b ON e.user_id = b.user_id AND e.ts <= b.ts
    """,
)
def q79_forward_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with the NEXT status update (every 10th event)
    at or after its timestamp — the forward mirror of q37, verified
    against DuckDB's native ASOF <= join."""
    ev = load(spark, "events", sf_dir)
    build = (
        ev.filter(F.col("event_id") % 10 == 0)
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy("event_id")
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("value").alias("status_value"))
    )
    probe = ev.select("event_id", "user_id", "ts")
    return asof_join_forward(probe, build, "user_id", "ts", "status_value").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        F.round("asof_next_status_value", 4).alias("next_status"),
    )


# ---------------------------------------------------------------------------
# Hybrid hot/cold skew join — the third tool in the skew kit next to salting
# (q75) and bucketing (q76): split the fact on data-derived hot keys,
# broadcast-join the hot slice against the dim's hot slice (hot keys never
# shuffle), and let the cold remainder take the ordinary partitioned join.
# This is what AQE's skew-join does at runtime, made explicit and gated —
# the shape you reach for when ONE key holds 10% of a 100 TB fact table.
# ---------------------------------------------------------------------------

_HOT_FACTOR = 1.5   # hot iff key count > factor * mean key count


def hybrid_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame,
    force_shuffle_cold: bool = False,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with the hot/cold split: rows
    whose key is in ``hot_keys`` go through a broadcast join against the
    dim slice restricted to those keys (no shuffle of the hot mass), the
    remainder through the regular equi-join. Returns the union with an
    ``is_hot`` tag (1/0). Result rows equal the plain join's exactly —
    the split routes work, it never changes the answer.

    ``force_shuffle_cold`` pins the cold side to sort-merge (same
    rationale as q75's force_shuffle: test dims sit under the broadcast
    threshold, production dims don't — the gate should exercise the plan
    that exists at scale)."""
    hot = F.broadcast(hot_keys.select(key))
    fact_hot = fact.join(hot, key, "semi")
    fact_cold = fact.join(hot, key, "anti")
    dim_hot = dim.join(F.broadcast(hot_keys.select(key)), key, "semi")
    hot_joined = (
        fact_hot.join(F.broadcast(dim_hot), key).withColumn("is_hot", F.lit(1))
    )
    dim_cold = dim.join(F.broadcast(hot_keys.select(key)), key, "anti")
    if force_shuffle_cold:
        dim_cold = dim_cold.hint("merge")
    cold_joined = fact_cold.join(dim_cold, key).withColumn("is_hot", F.lit(0))
    return hot_joined.unionByName(cold_joined)


@query(
    "q94_hybrid_skew_join",
    oracle=f"""
    WITH counts AS (
        SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    stats AS (
        SELECT CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_cnt
        FROM counts
    ),
    flags AS (
        SELECT c.l_partkey,
               CASE WHEN CAST(c.cnt AS DOUBLE) > {_HOT_FACTOR} * s.avg_cnt
                    THEN 1 ELSE 0 END AS is_hot
        FROM counts c CROSS JOIN stats s
    )
    SELECT f.is_hot,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_keys,
           COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT p.p_name) AS BIGINT) AS n_names,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN flags f ON f.l_partkey = l.l_partkey
    GROUP BY 1
    """,
)
def q94_hybrid_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by hot/cold key class through the split join: keys whose
    lineitem count exceeds 1.5x the mean count are 'hot' (data-derived,
    exact integer counts -> one double compare, identical both engines),
    their rows broadcast-join the matching part slice, everything else
    takes the pinned sort-merge path; the union aggregates per class.
    The oracle is the PLAIN three-way join — stating directly that the
    split changes the plan, never the result. n_names proves the dim
    join is load-bearing on both paths.

    Scale shape: the hot slice — the rows that would have melted one
    reducer — never shuffles (semi/anti splits ride broadcast hash maps
    of the hot-key list, which is small by definition: few keys ARE most
    rows); the cold shuffle is skew-free by construction. The hot-key
    list derives from one map-side-combinable count agg. This is AQE
    skew-join made explicit, for engines/pipelines where the split must
    be deterministic and auditable."""
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        (
            F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_cnt")
    )
    # The hot-key list feeds FOUR consumers (fact semi/anti, dim
    # semi/anti); localCheckpoint materializes the tiny frame once so the
    # counts agg + 1-row-stats cross join don't replay per consumer.
    hot_keys = (
        counts.crossJoin(F.broadcast(stats))
        .filter(
            F.col("cnt").cast("double") > F.lit(_HOT_FACTOR) * F.col("avg_cnt")
        )
        .select("l_partkey")
        .localCheckpoint(eager=True)
    )
    joined = hybrid_skew_join(
        li, part, "l_partkey", hot_keys, force_shuffle_cold=True
    )
    return joined.groupBy("is_hot").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_keys"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("p_name").cast("bigint").alias("n_names"),
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )
