"""Additional source/sink formats: JSON-lines and ORC.

The reference reads sas7bdat/CSV and writes parquet/CSV only
(Capstone/scripts/etl.py); real ingest surfaces also speak JSONL (the
lingua franca of API exports and crawl dumps) and ORC (the other columnar
format large warehouses standardize on). Both are first-class Spark
formats — these helpers pin the engine's read/write contract for them,
and the registered round-trip queries verify the FORMAT LAYER end to end:
a deterministic slice of a base table is written in the format, read
back, and aggregated, with the oracle computing the same aggregate from
the base table — a value-hash mismatch means the format layer lost or
mangled rows.

Scale notes: JSONL scans are schema-explicit (inference reads the data
twice and types drift run-to-run — never at 100 TB); ORC gets the same
predicate-pushdown/column-pruning treatment as parquet in Spark's
vectorized reader. Writers here are only slice-sized for the round-trip
proof; production writes go through io.write with partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_spark.catalog import load
from data_engineering_nd_spark.registry import query


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write df as JSON-lines (one object per row, Spark's json sink)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-explicit JSONL read — no inference pass, stable types."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def _roundtrip_dir(prefix: str) -> str:
    import tempfile

    return tempfile.mkdtemp(prefix=prefix)


@query(
    "q70_jsonl_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_id % 9 = 0
    GROUP BY event_type
    """,
)
def q70_jsonl_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 9th event written as JSON-lines, read back schema-explicit,
    and aggregated — the aggregate hash-matches the base table, proving
    the JSONL write/read path preserves rows, types, and values."""
    import shutil

    ev = load(spark, "events", sf_dir).filter(F.col("event_id") % 9 == 0).select(
        "event_id", "event_type", "user_id", F.col("value").cast("double")
    )
    path = _roundtrip_dir("jsonl_roundtrip_")
    try:
        write_jsonl(ev, path)
        back = read_jsonl(
            spark, path,
            "event_id bigint, event_type string, user_id bigint, value double",
        )
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "event_type string, n_events bigint, total_value double, n_users bigint",
    )


@query(
    "q71_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderkey % 11 = 0
    GROUP BY o_orderstatus
    """,
)
def q71_orc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 11th order written as ORC, read back through Spark's
    vectorized ORC reader, and aggregated — hash-verified against the
    base table."""
    import shutil

    o = load(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _roundtrip_dir("orc_roundtrip_")
    try:
        write_orc(o, path)
        out = read_orc(spark, path).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows, "o_orderstatus string, n_orders bigint, total_price double"
    )


@query(
    "src_avro_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price,
           CAST(SUM(CAST(concat('0x',
                substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 10))
                AS BIGINT)) AS BIGINT) AS key_checksum
    FROM orders
    WHERE o_orderkey % 13 = 0
    GROUP BY o_orderpriority
    """,
)
def src_avro_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 13th order written as AVRO and read back, aggregated with a
    decimal-exact price total and an md5 key checksum hash-verified
    against the base table — proving the row-oriented interchange path
    preserves rows, types and values.

    This distribution bundles the avro CLASSES without the short-name
    ``DataSourceRegister`` mapping (``format("avro")`` throws the
    "external module" hint); ``sources.avro`` resolves whichever
    spelling the session supports, so this query exercises the real
    reader/writer, not a stub. Completes the format family next to
    q70 (JSONL) and q71 (ORC)."""
    import shutil

    from data_engineering_nd_spark.functions.hashing import md5_prefix_long
    from data_engineering_nd_spark.sources.avro import read_avro, write_avro

    o = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") % 13 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    path = _roundtrip_dir("avro_roundtrip_")
    try:
        write_avro(o, path)
        out = read_avro(spark, path).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
            F.sum(md5_prefix_long(F.col("o_orderkey").cast("string")))
            .cast("bigint")
            .alias("key_checksum"),
        )
        rows = out.collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "o_orderpriority string, n_orders bigint, total_price double, "
        "key_checksum bigint",
    )


@query(
    "src_xml_roundtrip",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               AS total_acctbal,
           CAST(SUM(CAST(concat('0x',
                substr(md5(CAST(s_suppkey AS VARCHAR)), 1, 10))
                AS BIGINT)) AS BIGINT) AS key_checksum
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n_name
    """,
)
def src_xml_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers written as XML (Spark 4's NATIVE xml source — the
    spark-xml merge) and read back schema-explicit, then joined to
    nation and aggregated with a decimal-exact balance total and an md5
    key checksum hash-verified against the base tables. Completes the
    format family: parquet, CSV (2 dialects + quarantine), JSONL (+
    quarantine), ORC, Avro, XML, SAS (jar-gated).

    Schema-explicit read: XML inference is a second pass over the data
    and can widen types; production feeds declare the schema (same rule
    as the JSONL path). rowTag elements are independently splittable
    units, so large documents parallelize."""
    import shutil

    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    s = load(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    n = load(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    path = _roundtrip_dir("xml_roundtrip_")
    try:
        s.write.format("xml").option("rootTag", "suppliers").option(
            "rowTag", "supplier"
        ).mode("overwrite").save(path)
        back = (
            spark.read.format("xml")
            .option("rowTag", "supplier")
            .schema("s_suppkey long, s_nationkey long, s_acctbal double")
            .load(path)
        )
        out = (
            back.join(F.broadcast(n), back.s_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
                F.sum(F.col("s_acctbal").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_acctbal"),
                F.sum(md5_prefix_long(F.col("s_suppkey").cast("string")))
                .cast("bigint")
                .alias("key_checksum"),
            )
        )
        rows = out.collect()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "n_name string, n_suppliers bigint, total_acctbal double, "
        "key_checksum bigint",
    )


# ---------------------------------------------------------------------------
# Malformed-record handling: PERMISSIVE CSV with a corrupt-record column —
# the ingestion contract for dirty feeds
# ---------------------------------------------------------------------------


def read_csv_with_corrupt_column(
    spark: SparkSession, path: str, data_schema: str
) -> DataFrame:
    """PERMISSIVE CSV read that quarantines unparseable lines into
    ``_corrupt_record`` instead of dropping (DROPMALFORMED) or aborting
    (FAILFAST) — the audit-friendly mode for dirty upstream feeds: every
    input line lands in exactly one of {parsed, quarantined}, so counts
    reconcile and the bad lines are replayable verbatim.

    The returned frame is localCheckpoint-ed: Spark refuses queries that
    reference ONLY the internal corrupt column on a raw CSV scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the column
    exists only when some parsed field is also materialized), and
    checkpointing the parse once is also what you want at scale: one
    pass over the feed feeds both the good-path pipeline and the
    quarantine audit."""
    schema = data_schema + ", _corrupt_record string"
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .localCheckpoint()
    )


@query(
    "src_csv_malformed_report",
    oracle="""
    WITH good AS (
        SELECT CAST(i AS INT) AS k, 'n' || CAST(i AS VARCHAR) AS name,
               CAST(i * 10 AS INT) AS v
        FROM range(20) t(i)
        UNION ALL
        SELECT NULL, NULL, NULL  -- the all-empty-fields line: valid CSV
    )
    SELECT CAST(24 AS BIGINT) AS n_total,
           CAST(21 AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt,
           CAST(SUM(CAST(concat('0x', substr(md5(concat(
                coalesce(CAST(k AS VARCHAR), '-'), ':',
                coalesce(name, '-'), ':',
                coalesce(CAST(v AS VARCHAR), '-'))), 1, 10)) AS BIGINT))
                AS BIGINT) AS good_checksum
    FROM good
    """,
)
def src_csv_malformed_report_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dirty-feed ingestion contract, value-hashed: a fixture CSV of 20
    well-formed rows plus four hazards — surplus columns, a non-numeric
    value in an INT field, an unclosed quote, and an all-empty line —
    read PERMISSIVE with a corrupt-record column. The hash pins Spark's
    quarantine semantics exactly: surplus-columns / bad-int / unclosed-
    quote lines are quarantined (3 corrupt), the all-empty line is VALID
    CSV (three empty fields -> a NULL row, counted good — the case naive
    'drop weird lines' cleaners get wrong), and the good-row checksum
    proves quarantining never mutates parsed values. The reference reads
    its dimension CSVs with no malformed-row story at all
    (Capstone/scripts/etl.py:333-358); at 100 TB a feed WILL contain
    garbage and the split must reconcile: n_good + n_corrupt == n_total.
    """
    import os
    import shutil
    import tempfile

    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    work = tempfile.mkdtemp(prefix="csv_malformed_")
    try:
        lines = ["k,name,v"]
        lines += [f"{i},n{i},{i * 10}" for i in range(20)]
        lines += [
            "99,extra,5,surplus",   # too many columns
            "abc,badint,7",         # non-numeric INT field
            '7,"unclosed,3',        # unclosed quote
            ",,",                   # all-empty fields: VALID
        ]
        path = os.path.join(work, "feed.csv")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        df = read_csv_with_corrupt_column(
            spark, path, "k int, name string, v int"
        )
        good = df.filter(F.col("_corrupt_record").isNull())
        digest = md5_prefix_long(
            F.concat(
                F.coalesce(F.col("k").cast("string"), F.lit("-")),
                F.lit(":"),
                F.coalesce(F.col("name"), F.lit("-")),
                F.lit(":"),
                F.coalesce(F.col("v").cast("string"), F.lit("-")),
            )
        )
        out = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_good"),
            F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_corrupt"),
        ).crossJoin(
            good.agg(F.sum(digest).cast("bigint").alias("good_checksum"))
        )
        # output-sized (1 row); materialize so the scratch file can go
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def read_jsonl_with_corrupt_column(
    spark: SparkSession, path: str, data_schema: str
) -> DataFrame:
    """PERMISSIVE JSONL read with a corrupt-record quarantine column —
    the JSON sibling of :func:`read_csv_with_corrupt_column`, with
    JSON-specific semantics the report query pins: blank lines are
    DROPPED (never counted), a syntactically valid record with a
    wrong-typed field is quarantined but keeps its parseable fields
    (partial parse), unknown fields are ignored (good), and missing
    fields read as NULL (good)."""
    schema = data_schema + ", _corrupt_record string"
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .localCheckpoint()
    )


@query(
    "src_jsonl_malformed_report",
    oracle="""
    WITH good AS (
        SELECT CAST(i AS INT) AS k, 'n' || CAST(i AS VARCHAR) AS name,
               CAST(i * 10 AS INT) AS v
        FROM range(20) t(i)
        UNION ALL SELECT 103, 'ex', 1030  -- unknown extra field: ignored
        UNION ALL SELECT 104, 'mi', NULL  -- missing field: NULL, still good
    )
    SELECT CAST(25 AS BIGINT) AS n_total,
           CAST(22 AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt,
           CAST(1 AS BIGINT) AS n_partial_quarantine,
           CAST(SUM(CAST(concat('0x', substr(md5(concat(
                coalesce(CAST(k AS VARCHAR), '-'), ':',
                coalesce(name, '-'), ':',
                coalesce(CAST(v AS VARCHAR), '-'))), 1, 10)) AS BIGINT))
                AS BIGINT) AS good_checksum
    FROM good
    """,
)
def src_jsonl_malformed_report_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dirty JSONL-feed ingestion contract, value-hashed (the JSON
    sibling of src_csv_malformed_report): 20 well-formed records plus
    six hazards — an unknown extra field (VALID: ignored), a missing
    field (VALID: null), a wrong-typed field (quarantined WITH its
    parseable fields retained — JSON PERMISSIVE's partial-parse
    behavior, pinned by n_partial_quarantine), invalid JSON syntax and
    a non-object top-level value (both fully quarantined), and a blank
    line (DROPPED by the reader — n_total is 25, not 26). The good-row
    checksum proves quarantining never mutates parsed values; counts
    reconcile as n_good + n_corrupt == n_total."""
    import os
    import shutil
    import tempfile

    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    work = tempfile.mkdtemp(prefix="jsonl_malformed_")
    try:
        lines = [
            f'{{"k": {i}, "name": "n{i}", "v": {i * 10}}}' for i in range(20)
        ]
        lines += [
            '{"k": 103, "name": "ex", "v": 1030, "extra": 9}',  # unknown field
            '{"k": 104, "name": "mi"}',                          # missing field
            '{"k": "abc", "name": "bad", "v": 7}',   # wrong type: partial
            '{k: 5, "name": "syntax"}',              # invalid syntax
            "[1, 2, 3]",                             # non-object top level
            "",                                      # blank: dropped
        ]
        path = os.path.join(work, "feed.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        df = read_jsonl_with_corrupt_column(
            spark, path, "k int, name string, v int"
        )
        good = df.filter(F.col("_corrupt_record").isNull())
        digest = md5_prefix_long(
            F.concat(
                F.coalesce(F.col("k").cast("string"), F.lit("-")),
                F.lit(":"),
                F.coalesce(F.col("name"), F.lit("-")),
                F.lit(":"),
                F.coalesce(F.col("v").cast("string"), F.lit("-")),
            )
        )
        partial = (
            F.col("_corrupt_record").isNotNull()
            & (
                F.col("k").isNotNull()
                | F.col("name").isNotNull()
                | F.col("v").isNotNull()
            )
        )
        out = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_good"),
            F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_corrupt"),
            F.sum(F.when(partial, 1).otherwise(0))
            .cast("bigint")
            .alias("n_partial_quarantine"),
        ).crossJoin(
            good.agg(F.sum(digest).cast("bigint").alias("good_checksum"))
        )
        # output-sized (1 row); materialize so the scratch file can go
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Schema drift on RAW parquet directories: mergeSchema reads across files
# written under different schemas — the non-lakehouse sibling of
# tbl_schema_evolution (no manifest to impose a schema, so the reader
# must reconcile footers)
# ---------------------------------------------------------------------------

_MERGE_SCHEMA_ORACLE = """
    WITH old_batch AS (
        SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 2 = 0
    ),
    new_batch AS (
        SELECT o_orderkey, o_custkey,
               concat('s', CAST(o_orderkey % 3 AS VARCHAR)) AS o_segment
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (
        SELECT o_orderkey, o_custkey, NULL AS o_segment FROM old_batch
        UNION ALL SELECT * FROM new_batch
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(3 AS BIGINT) AS n_cols,
           CAST(COUNT(*) FILTER (WHERE o_segment IS NULL) AS BIGINT)
               AS segment_nulls,
           CAST(SUM(CAST(concat('0x', substr(md5(concat(
                CAST(o_orderkey AS VARCHAR), ':',
                coalesce(o_segment, '-'))), 1, 10)) AS BIGINT)) AS BIGINT)
               AS merged_checksum
    FROM unioned
"""


@query("src_parquet_merge_schema", oracle=_MERGE_SCHEMA_ORACLE)
def src_parquet_merge_schema_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema drift on a plain parquet DIRECTORY (no table format): an
    old batch written under (key, custkey) and a new batch under (key,
    custkey, segment) land in the same directory; the read must pass
    ``mergeSchema=true`` to reconcile the footers — the default read
    resolves against ONE footer and silently drops or fails the drifted
    column depending on which file wins, the classic raw-data-lake trap
    the VersionedTable manifest schema makes structurally impossible
    (tbl_schema_evolution). The hash pins the union row count, the
    merged width, the exact NULL backfill of the drifted column, and a
    (key, segment) checksum. Reference anchor: the reference appends
    parquet batches with mode('append') and no schema control
    (Capstone/scripts/etl.py:434-491)."""
    import shutil
    import tempfile

    from data_engineering_nd_spark.functions.hashing import md5_prefix_long

    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    old_b = orders.filter(F.col("o_orderkey") % 2 == 0)
    new_b = orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_segment",
        F.concat(F.lit("s"), (F.col("o_orderkey") % 3).cast("string")),
    )
    work = tempfile.mkdtemp(prefix="merge_schema_")
    try:
        old_b.write.parquet(work, mode="append")
        new_b.write.parquet(work, mode="append")
        merged = spark.read.option("mergeSchema", "true").parquet(work)
        digest = md5_prefix_long(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.coalesce(F.col("o_segment"), F.lit("-")),
            )
        )
        out = merged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("o_segment").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("segment_nulls"),
            F.sum(digest).cast("bigint").alias("merged_checksum"),
        ).select(
            "n_rows",
            F.lit(len(merged.columns)).cast("bigint").alias("n_cols"),
            "segment_nulls",
            "merged_checksum",
        )
        # output-sized (1 row); materialize so the scratch dir can go
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
