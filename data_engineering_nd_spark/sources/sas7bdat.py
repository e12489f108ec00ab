"""sas7bdat source (reference S1: Capstone/scripts/etl.py:739-740, jar
config etl.py:80).

The reference hard-wires ``spark.read.format('com.github.saurfang.sas.spark')``
and assumes the jar is always present. Here the format is *pluggable*: the
capability is probed once per session, and callers without the jar get a
clear error instead of a py4j stack trace — the testdata pipeline substitutes
parquet (SURVEY.md §7.4) so nothing in this repo requires the jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SAS_FORMAT = "com.github.saurfang.sas.spark"


def sas_jar_available(spark: SparkSession) -> bool:
    """True iff the saurfang sas reader is on the session's JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "com.github.saurfang.sas.spark.SasRelation"
        )
        return True
    except Exception:
        return False


def read_sas(spark: SparkSession, path: str) -> DataFrame:
    """Read a sas7bdat file; raises with remediation if the jar is absent.

    At scale the sas reader splits files on page boundaries, so one 6 GB
    monthly file still parallelizes across executors (the reference reads
    12 of them and unions — io.read_many covers that shape)."""
    if not sas_jar_available(spark):
        raise NotImplementedError(
            "sas7bdat input needs the saurfang spark-sas7bdat jar on the "
            "classpath (spark.jars.packages="
            "saurfang:spark-sas7bdat:3.0.0-s_2.12); this environment does "
            "not ship it — use the parquet testdata path instead"
        )
    return spark.read.format(SAS_FORMAT).load(path)
