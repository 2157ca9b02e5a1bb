"""Executed-plan inspection helpers (see package docstring)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_columns(df: DataFrame, table_hint: str = "") -> list[list[str]]:
    """ReadSchema column lists for each parquet scan (optionally filtered
    by a substring of the scan's path/identifier)."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\][^\n]*", plan):
        if table_hint and table_hint not in m.group(0):
            continue
        cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    # Spark truncates long filter lists ("EqualTo(l_returnfl...") without a
    # closing bracket — don't require one
    plan = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\n\]]*)", plan)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = executed_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, saw {n}\n{plan}"


def assert_columns_pruned(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """Assert the scan of a table reads at most ``max_cols`` columns —
    catches accidental SELECT * plans."""
    scans = scan_columns(df, table_hint)
    assert scans, f"no parquet scan matching {table_hint!r}"
    widest = max(len(s) for s in scans)
    assert widest <= max_cols, f"scan reads {widest} cols (> {max_cols}): {scans}"


def bnlj_build_row_counts(df: DataFrame) -> list[int]:
    """Execute ``df`` and return the broadcast-side OUTPUT ROW COUNT of
    every BroadcastNestedLoopJoin in the final adaptive plan — the
    scale-audit number behind the plan lint's BNLJ whitelist: a
    whitelisted "1-row aggregate" broadcast that silently grows past
    its reviewed bound is a runaway O(rows × build) join, and the plan
    STRING can't see it.  Implemented by walking the executed JVM plan
    (unwrapping AQE / query stages / codegen adapters / reused
    exchanges) to each join's build-side BroadcastExchange and reading
    its ``numOutputRows`` SQLMetric."""
    df.collect()  # metrics (and the final AQE plan) exist only after a run

    def simple(n) -> str:
        return n.getClass().getSimpleName()

    def unwrap(n):
        while simple(n) == "AdaptiveSparkPlanExec":
            n = n.executedPlan()
        return n

    def children(n) -> list:
        nm = simple(n)
        if nm.endswith("QueryStageExec"):
            return [n.plan()]
        if nm == "ReusedExchangeExec":
            return [n.child()]
        ch = n.children()
        return [ch.apply(i) for i in range(ch.size())]

    def find_exchange(n, depth: int = 0):
        n = unwrap(n)
        if "BroadcastExchange" in simple(n):
            return n
        if depth > 12:
            return None
        for k in children(n):
            r = find_exchange(k, depth + 1)
            if r is not None:
                return r
        return None

    counts: list[int] = []
    stack = [unwrap(df._jdf.queryExecution().executedPlan())]
    while stack:
        n = unwrap(stack.pop())
        kids = children(n)
        if "BroadcastNestedLoopJoin" in n.nodeName():
            build = kids[0] if str(n.buildSide()) == "BuildLeft" else kids[1]
            ex = find_exchange(build)
            if ex is not None and ex.metrics().contains("numOutputRows"):
                counts.append(int(ex.metrics().apply("numOutputRows").value()))
        stack.extend(kids)
    return counts


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Requires executing the frame: under AQE the final adaptive plan only
    exists after a run.  Codegen stages render as ``*(n)`` markers."""
    df.collect()
    plan = executed_plan(df)
    assert "*(" in plan or "WholeStageCodegen" in plan, plan
