"""Executed-plan guards — runtime detection of scale anti-patterns.

VERDICT r11 task #3: q115's no-partition WindowExec was invisible to the
sf0.001 plan FINGERPRINTS because the operator multiset looked bounded —
only the executed plan shows a single-partition window whose input grows
with the data. This module walks a DataFrame's EXECUTED plan (post-AQE)
and reports every ``WindowExec`` with an EMPTY partition spec whose input
is not PROVABLY bounded by an upstream limit or aggregate — the one shape
that serializes an n-proportional row stream through one thread at 100 TB.

Used three ways:

- ``tools/window_sweep.py`` sweeps all registered queries at two scale
  factors and flags hits whose measured input ROWS GROW with SF (the
  ground-truth n-proportionality test; results adjudicated in
  SWEEP_r12.md);
- ``tests/test_plans.py`` pins the structural check over the
  window-heavy headliners (zero unbounded no-partition windows);
- :func:`install_collect_hook` lets a sweep see the plans of INTERNAL
  materializations (convergence-witness collects, checkpoint rounds)
  that never reach the returned DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

#: wrappers / row-count-preserving nodes the structural scan descends
#: through when classifying a window's input
_PASS_THROUGH = {
    "AdaptiveSparkPlanExec",
    "ResultQueryStageExec",
    "ShuffleQueryStageExec",
    "BroadcastQueryStageExec",
    "TableCacheQueryStageExec",
    "WholeStageCodegenExec",
    "InputAdapter",
    "ProjectExec",
    "SortExec",
    "ShuffleExchangeExec",
    "AQEShuffleReadExec",
    "CoalesceExec",
    "ReusedExchangeExec",
    "SerializeFromObjectExec",
    "DeserializeToObjectExec",
    "ColumnarToRowExec",
    "RowToColumnarExec",
}

#: operators that PROVABLY bound their output row count regardless of
#: input size — limits and GLOBAL (no grouping expressions) aggregates
#: only.  A GROUPED aggregate bounds output to group cardinality, which
#: can itself be n-proportional (a per-customer groupBy feeding a
#: no-partition window is exactly the q115 failure class), so grouped
#: aggregates are no longer classified as bounding (ADVICE r12):
#: they produce a ``WindowHit`` tagged ``[grouped]`` with measured
#: rows, and the two-SF growth criterion adjudicates them.
_LIMIT_BOUNDING = {
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
}

#: aggregate nodes — bounding iff their grouping-expression list is
#: empty (a global aggregate emits exactly one row per grouping set)
_AGG_NODES = {
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
}


@dataclass
class WindowHit:
    """One no-partition WindowExec that is not structurally bounded."""

    window: str  # simpleString of the window node (truncated)
    input_node: str  # first non-pass-through descendant's class
    input_rows: int  # its numOutputRows metric, -1 if unavailable


def _resolve(node):
    """Unwrap adaptive / codegen / query-stage shells to the real node."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return _resolve(node.executedPlan())
    if name.endswith("QueryStageExec"):
        return _resolve(node.plan())
    if name in ("WholeStageCodegenExec", "InputAdapter"):
        return _resolve(node.children().apply(0))
    if name == "ReusedExchangeExec":
        return _resolve(node.child())
    return node


def _children(node):
    node = _resolve(node)
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


#: additional row-count-preserving (or row-reducing) nodes skipped when
#: classifying a window's INPUT only — a stacked global window is judged
#: by the stream feeding the stack (the innermost window gets its own
#: visit from the detector walk, so nothing is missed)
_INPUT_TRANSPARENT = _PASS_THROUGH | {"WindowExec", "WindowGroupLimitExec"}


def _first_effective(node):
    """First descendant (inclusive) that is not a pass-through wrapper."""
    node = _resolve(node)
    while node.getClass().getSimpleName() in _INPUT_TRANSPARENT:
        kids = _children(node)
        if not kids:
            return node
        node = _resolve(kids[0])
    return node


def _rows_metric(node) -> int:
    """numOutputRows of ``node`` or its first descendant carrying one."""
    queue = [node]
    while queue:
        n = _resolve(queue.pop(0))
        try:
            m = n.metrics()
            if m.contains("numOutputRows"):
                return int(m.apply("numOutputRows").value())
        except Exception:
            pass
        queue.extend(_children(n))
    return -1


def unbounded_global_windows(df: DataFrame) -> list[WindowHit]:
    """Every executed ``WindowExec`` in ``df``'s plan with an EMPTY
    partition spec whose input is not provably bounded by an upstream
    limit / aggregate. Call AFTER an action so post-AQE metrics exist."""
    hits: list[WindowHit] = []
    seen: set[int] = set()

    def _plan_key(node) -> int:
        # JVM-stable identity: SparkPlan.id (unique per plan node).
        # Python id() on transient py4j proxies both misses duplicates
        # (every children().apply() makes a fresh proxy) and can alias
        # UNVISITED nodes after GC address reuse.
        try:
            return int(node.id())
        except Exception:
            return int(node.hashCode())

    def walk(node):
        node = _resolve(node)
        key = _plan_key(node)
        if key in seen:  # reused exchanges can alias subtrees
            return
        seen.add(key)
        name = node.getClass().getSimpleName()
        if name == "WindowExec" and node.partitionSpec().isEmpty():
            child = _first_effective(node.children().apply(0))
            cname = child.getClass().getSimpleName()
            if cname in _AGG_NODES:
                try:
                    if child.groupingExpressions().isEmpty():
                        cname = None  # global aggregate: bounded
                    else:
                        cname = f"{cname}[grouped]"
                except Exception:
                    cname = f"{cname}[grouped?]"
            elif cname in _LIMIT_BOUNDING:
                cname = None
            if cname is not None:
                hits.append(
                    WindowHit(
                        window=node.simpleString(120),
                        input_node=cname,
                        input_rows=_rows_metric(child),
                    )
                )
        for c in _children(node):
            walk(c)

    walk(df._jdf.queryExecution().executedPlan())
    return hits


def install_collect_hook(sink: list) -> callable:
    """Patch DataFrame.collect / count / toPandas / localCheckpoint so
    every INTERNAL materialization also gets scanned; appends
    ``(method, WindowHit)`` pairs to ``sink``. Returns an uninstall
    callable. Sweep-tool use only — never in the hot path."""
    originals = {}

    def wrap(method_name):
        orig = getattr(DataFrame, method_name)
        originals[method_name] = orig

        def patched(self, *a, **kw):
            out = orig(self, *a, **kw)
            try:
                for h in unbounded_global_windows(self):
                    sink.append((method_name, h))
            except Exception:
                pass  # plan introspection must never fail the query
            return out

        setattr(DataFrame, method_name, patched)

    for m in ("collect", "count", "toPandas", "localCheckpoint"):
        wrap(m)

    def uninstall():
        for m, orig in originals.items():
            setattr(DataFrame, m, orig)

    return uninstall
