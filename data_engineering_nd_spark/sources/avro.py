"""Avro source/sink — capability-probed, the sas7bdat pattern
(sources/sas7bdat.py), but in THIS distribution the avro classes ship in
the assembly while the ``DataSourceRegister`` short-name mapping does
not: ``format("avro")`` throws the "external module" hint even though
``org.apache.spark.sql.avro.AvroFileFormat`` loads and works. The
entry points therefore resolve the format to whichever spelling the
session supports — short name where registered, fully-qualified class
name where only the classes are present — and raise a remediation error
only when neither exists.

Avro is Spark's canonical ROW-ORIENTED interchange format (Kafka
payloads, schema-registry pipelines); at scale files split on
sync-marker block boundaries, so large files parallelize across
executors like parquet row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FQN = "org.apache.spark.sql.avro.AvroFileFormat"


def avro_available(spark: SparkSession) -> bool:
    """True iff some spelling of the avro format works in this session."""
    return _format_name(spark) is not None


def _format_name(spark: SparkSession) -> str | None:
    jvm = spark._jvm  # type: ignore[union-attr]
    try:
        jvm.java.lang.Class.forName(_FQN)
    except Exception:
        return None
    # prefer the short name when the register mapping exists (it spells
    # the same implementation); fall back to the class name
    try:
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return "avro"
    except Exception:
        return _FQN


def _require(spark: SparkSession) -> str:
    name = _format_name(spark)
    if name is None:
        raise NotImplementedError(
            "avro I/O needs the spark-avro classes on the classpath "
            "(spark.jars.packages="
            "org.apache.spark:spark-avro_2.13:<spark-version>); this "
            "session has neither the short-name registration nor the "
            "classes — use the parquet/orc/jsonl paths instead"
        )
    return name


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read avro files; raises with remediation if no avro support."""
    return spark.read.format(_require(spark)).load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write df as avro; raises with remediation if no avro support."""
    spark = df.sparkSession
    df.write.mode(mode).format(_require(spark)).save(path)
