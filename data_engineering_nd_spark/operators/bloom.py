"""Bloom-filter semi-join pruning: filter the fact scan BEFORE the shuffle.

The third join-at-scale tool next to salting (``operators.joins``) and
bucketing (``bucketing``): when a selective dimension participates in a
star-schema join (SURVEY.md §2.3 — the reference joins fact ``i94_trips``
to filtered dims every run, Capstone/README.md:44-67), most fact rows will
not survive the join, yet a plain shuffle join moves ALL of them. A Bloom
filter built over the dim keys and evaluated as a scan-side Filter drops
the non-matching fact rows before they are shuffled or even buffered for a
broadcast probe — at 100 TB with a 1%-selective dim that is a ~99% cut in
shuffle traffic for the cost of a few hash probes per row.

This is the same idea as Spark's own AQE runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on in session.py) —
built here EXPLICITLY with an md5-derived hash family (the same
SQL-mirrorable trick as the CMS/HLL sketches in ``analytics``) so build
and probe replay bit-for-bit in the DuckDB oracle and the false-positive
count is a deterministic, value-hashed quantity instead of an engine
internal.

Layout and sizing: bits packed 32-per-word into BIGINT words (32, not 64,
so ``1 << bit`` never touches the sign bit in either engine). ``m`` is
sized from the dim cardinality at ~8 bits/key (word-aligned, capped) so
the filter neither saturates nor goes vacuously empty as the SF changes —
with k=3 that targets a ~3% false-positive rate, enough pruning to matter
and enough false positives that the exact-vs-bloom reconciliation in the
gate query is never trivially zero. The build is a distributed
distinct-positions aggregate collapsed to at most ``m`` position rows; the
driver collect is metadata-scale (m/8 bytes — 1 MiB even at m = 2^23) and
is exactly what any runtime-filter implementation ships to the scan side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.functions.hashing import (
    md5_prefix_long,
    sql_md5_prefix_long,
)
from data_engineering_nd_spark.registry import query

K_HASHES = 3
BITS_PER_KEY = 8
_WORD_BITS = 32
#: literal-array words stop being a sensible plan above this; beyond it,
#: switch to Spark's native runtime bloom (already on via AQE) — the
#: explicit path exists for SQL-mirrorable determinism, not unbounded m
M_CAP = 1 << 20


def size_m_bits(n_keys: int) -> int:
    """Word-aligned filter size for ``n_keys`` dim keys at ~8 bits/key.
    Pure integer arithmetic so the DuckDB oracle reproduces it exactly
    (no log2/pow float round-trip): 32 * ceil(8n/32), floored at one word,
    capped at :data:`M_CAP`."""
    m = 32 * ((BITS_PER_KEY * max(n_keys, 1) + 31) // 32)
    return min(max(m, _WORD_BITS), M_CAP)


_SQL_SIZE_M = (
    f"LEAST(GREATEST(32 * ((8 * (SELECT COUNT(*) FROM dim) + 31) // 32), "
    f"{_WORD_BITS}), {M_CAP})"
)


def _position(key: Column, i: int, m_bits: int) -> Column:
    """i-th Bloom bit position of a key: md5 over an ``i:key`` tag so the
    k hashes are independent draws from one family (DuckDB twin in
    :func:`_sql_position`)."""
    return md5_prefix_long(F.concat(F.lit(f"{i}:"), key.cast("string"))) % m_bits


def _sql_position(key_expr: str, i: int) -> str:
    """DuckDB twin of :func:`_position`; ``m`` comes from the params CTE."""
    return (
        sql_md5_prefix_long(f"concat('{i}:', CAST({key_expr} AS VARCHAR))")
        + " % p.m"
    )


def py_position(value: str, i: int, m_bits: int) -> int:
    """Driver-side (pure Python) twin of :func:`_position` — used by the
    VersionedTable per-file Bloom index to probe a point-lookup key
    against collected index words without launching a job. Keep all
    three emitters (Spark / SQL / Python) in lockstep."""
    import hashlib

    digest = hashlib.md5(f"{i}:{value}".encode()).hexdigest()
    return int(digest[:10], 16) % m_bits


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, k: int = K_HASHES
) -> list[int]:
    """Build the packed Bloom words over ``keys[key_col]``.

    Distributed: per-key positions explode JVM-side and collapse through a
    DISTINCT (map-side partial first) — at most ``m_bits`` position rows
    ever reach the driver, no matter how large the key set. Returns
    ``m_bits/32`` BIGINT words."""
    key = F.col(key_col)
    pos = (
        keys.select(
            F.explode(
                F.array(*[_position(key, i, m_bits) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // _WORD_BITS)
    for row in pos:
        p = int(row.pos)
        words[p // _WORD_BITS] |= 1 << (p % _WORD_BITS)
    return words


def bloom_probe_expr(
    key: Column, words: list[int], m_bits: int, k: int = K_HASHES
) -> Column:
    """Boolean scan-side predicate: all k bits set.

    Pure JVM expressions — two literal-array lookups (the packed words and
    a 32-entry power-of-two mask table) plus integer arithmetic per hash —
    so the probe stays inside whole-stage codegen: this is the Filter the
    plan pin requires BELOW the fact-side Exchange."""
    words_lit = F.array(*[F.lit(w).cast("long") for w in words])
    masks_lit = F.array(
        *[F.lit(1 << b).cast("long") for b in range(_WORD_BITS)]
    )
    checks = []
    for i in range(k):
        p = _position(key, i, m_bits)
        # p / 32 is exact in binary floating point (scale by 2^-5), so the
        # int cast is a true floor for any p < 2^52
        word = F.element_at(words_lit, (p / _WORD_BITS).cast("int") + F.lit(1))
        mask = F.element_at(masks_lit, (p % _WORD_BITS).cast("int") + F.lit(1))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


@query(
    "q80_bloom_join_prune",
    oracle=None,  # generated below (k-unrolled probe, sizing mirrored)
)
def q80_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema pruning report: lineitem joined to ASIA-region
    suppliers, with the fact side pre-filtered by a Bloom filter over the
    dim keys. Emits the pruning economics (total/passed/pruned) and the
    ground truth against the exact broadcast semi-join (matched rows,
    false positives, revenue through the real join) so the oracle
    value-hashes build AND probe, not just the happy path.

    Plan (pinned in tests/test_joins.py): lineitem scan → Filter(bloom
    probe, whole-stage codegen) → BroadcastHashJoin(dim) → partial agg →
    single Exchange. The fact side is never shuffled unfiltered."""
    sup = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nat = load(spark, "nation", sf_dir).select("n_nationkey", "n_regionkey")
    reg = (
        load(spark, "region", sf_dir)
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    dim = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("s_suppkey").alias("k"))
    )
    m_bits = size_m_bits(dim.count())
    words = bloom_build(dim, "k", m_bits)
    fact = load(spark, "lineitem", sf_dir).select("l_suppkey", "l_extendedprice")
    passed = fact.filter(bloom_probe_expr(F.col("l_suppkey"), words, m_bits))
    ann = passed.join(
        F.broadcast(dim.withColumn("__hit", F.lit(1))),
        passed.l_suppkey == F.col("k"),
        "left",
    )
    stats = ann.agg(
        F.count(F.lit(1)).alias("bloom_passed"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("exact_matched"),
        F.sum(
            F.when(F.col("__hit") == 1, F.col("l_extendedprice")).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("matched_revenue"),
    )
    totals = fact.agg(F.count(F.lit(1)).alias("fact_rows_total"))
    return totals.crossJoin(stats).select(
        "fact_rows_total",
        "bloom_passed",
        (F.col("fact_rows_total") - F.col("bloom_passed")).alias("bloom_pruned"),
        "exact_matched",
        (F.col("bloom_passed") - F.col("exact_matched")).alias(
            "false_positives"
        ),
        "matched_revenue",
    )


def _register_bloom_oracle() -> None:
    """DuckDB mirror: same md5 hash family, same integer sizing, same
    32-bit word packing, same stats — build and probe replayed in SQL.
    The probe joins the sparse word set per hash (a missing word means
    the bit is unset, so an inner join on widx + bit test IS the all-k
    check); the Spark side uses a dense literal array instead, but the
    bits are identical."""
    from data_engineering_nd_spark.registry import ORACLE_SQL

    k, wb = K_HASHES, _WORD_BITS
    pos_union = "\n        UNION ALL ".join(
        f"SELECT {_sql_position('k', i)} AS pos FROM dim CROSS JOIN params p"
        for i in range(k)
    )
    probe_cols = ",\n               ".join(
        f"{_sql_position('f.l_suppkey', i)} AS p{i}" for i in range(k)
    )
    probe_joins = "\n        ".join(
        f"JOIN words w{i} ON w{i}.widx = pr.p{i} // {wb} AND "
        f"(w{i}.w & (CAST(1 AS BIGINT) << CAST(pr.p{i} % {wb} AS INTEGER)))"
        f" <> 0"
        for i in range(k)
    )
    ORACLE_SQL["q80_bloom_join_prune"] = f"""
    WITH dim AS (
        SELECT s_suppkey AS k FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ),
    params AS (SELECT {_SQL_SIZE_M} AS m),
    pos AS (
        SELECT DISTINCT pos FROM ({pos_union})
    ),
    words AS (
        SELECT pos // {wb} AS widx,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % {wb} AS INTEGER)) AS w
        FROM pos GROUP BY 1
    ),
    fact AS (SELECT l_suppkey, l_extendedprice FROM lineitem),
    probe AS (
        SELECT f.l_suppkey, f.l_extendedprice,
               {probe_cols}
        FROM fact f CROSS JOIN params p
    ),
    passed AS (
        SELECT pr.l_suppkey, pr.l_extendedprice
        FROM probe pr
        {probe_joins}
    ),
    joined AS (
        SELECT p.l_extendedprice,
               CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM passed p LEFT JOIN dim d ON p.l_suppkey = d.k
    )
    SELECT
        (SELECT COUNT(*) FROM fact) AS fact_rows_total,
        COUNT(*) AS bloom_passed,
        (SELECT COUNT(*) FROM fact) - COUNT(*) AS bloom_pruned,
        CAST(SUM(hit) AS BIGINT) AS exact_matched,
        COUNT(*) - CAST(SUM(hit) AS BIGINT) AS false_positives,
        CAST(SUM(CASE WHEN hit = 1
                 THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE)
            AS matched_revenue
    FROM joined
    """


_register_bloom_oracle()
