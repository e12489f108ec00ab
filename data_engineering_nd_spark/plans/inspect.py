"""Physical-plan inspection: the engine's "did Catalyst pick the plan we
designed for?" surface.

The reference never looks at a plan (SURVEY.md §4 — it inherits Catalyst
wholesale and still pays for UDF barriers and double executions). This
module turns plan properties into assertable facts so tests can pin the
scale-critical choices:

- small dims broadcast (no shuffle of the fact side),
- filters reach the parquet scan (PushedFilters),
- scans read only referenced columns (ReadSchema pruning),
- global top-k runs as TakeOrderedAndProject (no full sort),
- hot paths stay out of Python (no BatchEvalPython in whole-stage spans).

These checks guard plan regressions the same way value tests guard result
regressions — at 100 TB a lost broadcast or a dropped pushdown is a
correctness-of-cost bug.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (same text as .explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reaches a scan, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame, table_hint: str | None = None) -> list[str]:
    """Column names each scan actually reads (ReadSchema). With
    ``table_hint``, only scans whose Location mentions it."""
    plan = physical_plan(df)
    cols: list[str] = []
    for scan in re.finditer(
        r"Scan parquet[^\n]*\n(?:[^\n]*\n)*?[^\n]*ReadSchema: struct<([^>]*)>",
        plan,
    ):
        block = scan.group(0)
        if table_hint and table_hint not in block:
            continue
        body = scan.group(1)
        cols.extend(f.split(":")[0].strip() for f in body.split(",") if f.strip())
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (broadcast exchanges
    excluded — those move only the small side)."""
    plan = simple_plan(df)
    return len(re.findall(r"Exchange (?!SinglePartition)(?:hash|range|Round)", plan)) + len(
        re.findall(r"Exchange SinglePartition", plan)
    )


def assert_operator(df: DataFrame, operator: str) -> None:
    plan = physical_plan(df)
    assert operator in plan, f"expected {operator} in physical plan:\n{plan}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected >={min_count} broadcast joins:\n{plan}"


def assert_no_python_udf_in(df: DataFrame) -> None:
    """Hot-path guard: no row-at-a-time Python evaluation in the plan
    (Arrow-batched pandas ops show as ArrowEvalPython/FlatMapGroupsInPandas
    and are allowed — they're the designated vectorized escape hatch)."""
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, f"row-wise Python UDF in plan:\n{plan}"


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Operator multiset of the physical plan — the drift-snapshot unit
    (VERDICT r06 #7). Counts only the scale-relevant node classes, so the
    fingerprint is stable across cosmetic plan changes (ids, orderings)
    but moves whenever a shuffle, broadcast, scan, or Python stage
    appears or disappears."""
    plan = simple_plan(df)
    return {
        "exchanges": count_exchanges(df),
        "broadcasts": plan.count("BroadcastExchange"),
        # 'FileScan parquet' contains BOTH 'FileScan' and 'Scan parquet' —
        # counting each substring double-counted parquet scans (and
        # weighted csv/orc scans differently); FileScan alone covers every
        # v1 file source, BatchScan the DSv2 ones
        "scans": plan.count("FileScan") + plan.count("BatchScan"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loops": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "rowwise_python": plan.count("BatchEvalPython"),
        "arrow_python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }
