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
