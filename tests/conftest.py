from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from data_engineering_nd_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
