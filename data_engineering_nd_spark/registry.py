"""Query registry: the driver-facing contract surface.

Every implemented operator registers (a) a PySpark query callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, (b) the
equivalent ANSI SQL for the driver's DuckDB oracle. ``__spark_entry__``
re-exports these. Column names must match between the two (the driver's
compare sorts columns by name before value-hashing), so every computed
column is aliased identically on both sides.

Determinism rules used throughout (SURVEY.md §7.4):
- money-ish double sums go through DECIMAL(18,4/6) accumulation and are cast
  back to DOUBLE, so Spark's and DuckDB's different summation orders cannot
  diverge in the last ulp;
- averages are computed as CAST(decimal-sum AS DOUBLE) / CAST(count AS
  DOUBLE) for the same reason;
- no monotonically_increasing_id / rand anywhere — content-derived keys only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible operator
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import data_engineering_nd_spark.analytics  # noqa: F401
    import data_engineering_nd_spark.i94_parity  # noqa: F401
    import data_engineering_nd_spark.operators.dedup  # noqa: F401
    import data_engineering_nd_spark.operators.graph  # noqa: F401
    import data_engineering_nd_spark.operators.joins  # noqa: F401
    import data_engineering_nd_spark.operators.multimodal  # noqa: F401
    import data_engineering_nd_spark.operators.quality  # noqa: F401
    import data_engineering_nd_spark.operators.similarity  # noqa: F401
    import data_engineering_nd_spark.operators.text_analysis  # noqa: F401
    import data_engineering_nd_spark.streaming.queries  # noqa: F401
