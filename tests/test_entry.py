"""Driver-contract smoke tests: entry() returns rows; every registered query
runs at sf0.001; every oracle key has a matching query."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 4


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize(
    "name",
    sorted(__import__("__spark_entry__").queries()),
)
def test_query_runs(spark, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, SF_DIR)
    # every query must produce a stable schema and execute; most return rows
    assert df.columns
    df.count()
