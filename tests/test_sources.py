from __future__ import annotations

import pytest

from data_engineering_nd_spark.sources import read_sas, sas_jar_available


def test_sas_source_is_gated_not_crashing(spark):
    # this container has no saurfang jar: capability probe is False and the
    # reader raises a remediation error instead of a py4j stack trace.
    assert sas_jar_available(spark) is False
    with pytest.raises(NotImplementedError, match="spark-sas7bdat"):
        read_sas(spark, "/nonexistent/apr16.sas7bdat")
