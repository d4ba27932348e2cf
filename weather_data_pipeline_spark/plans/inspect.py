"""Physical-plan introspection (SURVEY.md §4).

The engine's 100 TB posture rests on Catalyst doing specific things —
filters reaching the parquet scan, projections pruning columns, small
dimensions broadcasting, aggregates partial-aggregating before the
exchange. These helpers turn those properties into assertions, so tests
pin the *plan*, not just the answer: a regression that keeps results
correct but silently drops a pushdown fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final physical plan string (post-AQE where applicable)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Data-source filters that reached the scan (empty = nothing pushed).

    Spark's plan renderer ELIDES long filter lists ("GreaterThan(l_shipda...,"
    with the closing bracket truncated away), so the list is matched up to
    the bracket OR the rendered field that follows it — a bracket-only
    regex silently reported zero pushed filters on exactly the scans with
    the most pushdown."""
    out: list[str] = []
    pat = r"PushedFilters: \[([^\]\n]*)(?:\]|$)"
    for m in re.finditer(pat, executed_plan(df), re.MULTILINE):
        body = m.group(1).split(", ReadSchema:")[0].strip()
        if body:
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each parquet scan actually reads (pruning check)."""
    plans = executed_plan(df)
    return [
        re.findall(r"(\w+):", m.group(1))
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plans)
    ]


def num_shuffles(df: DataFrame) -> int:
    """Exchange count in the plan — the scale-determining number."""
    return executed_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the exchange (keys aggregate pre-shuffle)."""
    plan = executed_plan(df)
    return bool(re.search(r"partial_(sum|count|min|max|avg|first)", plan))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (fused operator pipelines).
    Executes the plan first (collect on ITS OWN QueryExecution — a write
    action would clone the plan): under AQE the final plan with its
    ``*(n)`` codegen markers only exists after a run."""
    df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))
