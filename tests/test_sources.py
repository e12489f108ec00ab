from __future__ import annotations

import pytest

from data_engineering_nd_spark.sources import read_sas, sas_jar_available


def test_sas_source_is_gated_not_crashing(spark):
    # this container has no saurfang jar: capability probe is False and the
    # reader raises a remediation error instead of a py4j stack trace.
    assert sas_jar_available(spark) is False
    with pytest.raises(NotImplementedError, match="spark-sas7bdat"):
        read_sas(spark, "/nonexistent/apr16.sas7bdat")


def test_empty_frame_is_schema_declared(spark):
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from data_engineering_nd_spark.io import empty_frame

    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    df = empty_frame(spark, schema)
    assert df.count() == 0 and df.schema == schema
    # unlike the reference's zero-column sentinel, it unions cleanly
    other = spark.createDataFrame([(1, "a")], schema)
    assert df.unionByName(other).count() == 1


def test_csv_corrupt_column_quarantine_reconciles(spark, tmp_path):
    """Every line lands in exactly one of {good, quarantined}; the
    quarantined line is preserved verbatim for replay."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.sources.formats import (
        read_csv_with_corrupt_column,
    )

    p = tmp_path / "feed.csv"
    p.write_text("a,b\n1,x\nnope,y\n2,z\n")
    df = read_csv_with_corrupt_column(spark, str(p), "a int, b string")
    assert df.count() == 3
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "nope,y"
    good = {r.a: r.b for r in df.filter(F.col("_corrupt_record").isNull()).collect()}
    assert good == {1: "x", 2: "z"}


def test_merge_schema_read_backfills_drifted_column(spark, tmp_path):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    p = str(tmp_path / "drift")
    spark.createDataFrame([Row(k=1, v="a")]).write.parquet(p, mode="append")
    spark.createDataFrame([Row(k=2, v="b", extra=9)]).write.parquet(
        p, mode="append"
    )
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"k", "v", "extra"}
    got = {r.k: r.extra for r in merged.collect()}
    assert got == {1: None, 2: 9}


def test_avro_roundtrips_via_resolved_format(spark, tmp_path):
    """This distribution bundles the avro CLASSES without the short-name
    register mapping; the resolver must still give working I/O (and a
    clean remediation error only when neither spelling exists)."""
    from pyspark.sql import Row

    from data_engineering_nd_spark.sources.avro import (
        avro_available,
        read_avro,
        write_avro,
    )

    assert avro_available(spark) is True
    df = spark.createDataFrame(
        [Row(k=1, v="a", x=1.5), Row(k=2, v=None, x=-2.0)]
    )
    write_avro(df, str(tmp_path / "out"))
    back = read_avro(spark, str(tmp_path / "out"))
    assert sorted((r.k, r.v, r.x) for r in back.collect()) == [
        (1, "a", 1.5), (2, None, -2.0),
    ]
