"""Plan inspection & linting — scale-readiness checks on Catalyst plans.

Pig exposes EXPLAIN of its three IRs (GruntParser.java:330); here the
single IR is the Catalyst plan, and what matters at 100 TB is *plan
shape*: filters pushed to the scan, columns pruned, small dims
broadcast, no Python row UDFs in hot paths. ``lint_plan`` inspects the
executed-plan string for those properties so tests can assert them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)  # noqa: SLF001


def lint_plan(df: DataFrame) -> dict[str, object]:
    """Heuristic plan facts for assertions/benchmark reports."""
    s = plan_string(df, "formatted")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan_string(df, "codegen"))
    return {
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", s)),
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sortmerge_joins": s.count("SortMergeJoin"),
        "shuffles": s.count("Exchange"),
        "python_udfs": ("BatchEvalPython" in s) or ("ArrowEvalPython" in s),
        "wholestage_codegen": bool(m) and int(m.group(1)) > 0,
        "cartesian": ("CartesianProduct" in s) or ("BroadcastNestedLoopJoin" in s),
    }


def executed_plan_string(df: DataFrame) -> str:
    """Run the plan and return the final adaptive physical plan — the
    only place codegen spans and AQE decisions are visible. Test-sized
    inputs only (collects the result to finalize the plan)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def read_schema_width(df: DataFrame) -> int:
    """Number of columns actually read from the scan (column pruning
    check: a 2-column projection must not read 16)."""
    s = plan_string(df, "formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", s)
    if not m:
        return -1
    return len([c for c in m.group(1).split(",") if c])
