from data_engineering_nd_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_python_udf_in,
    assert_operator,
    count_exchanges,
    physical_plan,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "scan_read_schema",
    "count_exchanges",
    "assert_operator",
    "assert_broadcast_join",
    "assert_no_python_udf_in",
]
