"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``data_engineering_nd_spark``; this module only
re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_nd_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_engineering_nd_spark.analytics import q02_top_nations_by_revenue

    return q02_top_nations_by_revenue(spark, "/root/testdata/sf0.001")


def _with_worker_imports(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Ship the package to Python workers before the first job — the
    mapInPandas / pandas-UDF queries pickle references to it, and a
    driver running from a foreign cwd would otherwise hit
    ModuleNotFoundError at task time (idempotent, ~no-op when the cwd
    already suffices)."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        registry.ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data-pipeline operators)."""
    registry.load_all_modules()
    return {
        name: _with_worker_imports(fn)
        for name, fn in registry.gate_ordered(registry.QUERIES).items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each SQL-expressible query."""
    registry.load_all_modules()
    return registry.gate_ordered(registry.ORACLE_SQL)
