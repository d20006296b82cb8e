"""Plan auditing as a user-facing utility — the repo's test-side plan
checks (tests/test_plans.py), packaged so a pipeline author can assert
the same physical properties on THEIR queries before paying for them at
100 TB. The numbers a plan review actually needs:

* how many Exchanges (every one is a full shuffle of its input),
* whether filters reached the parquet scan (``PushedFilters``) and how
  many columns the scan reads (``ReadSchema`` — a 2-column projection
  reading 16 columns is a missing prune),
* how much of the plan runs inside WholeStageCodegen (JVM-compiled)
  versus interpreted or Python (Arrow boundary nodes),
* whether any join degenerated to a nested loop (the quadratic trap a
  missing equi-key produces).

``audit(df)`` returns a plain dict so callers can assert on it; use
``assert_scales(df, ...)`` for the common gate. Reference tie: SURVEY §4
(optimizer & physical execution) — these are the properties every
registered query's plan audit pins, exposed as an API.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: plan nodes that cross the JVM→Python (Arrow) boundary
_PY_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInArrow",
    "PythonMapInArrow",
)


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The exact string ``df.explain(mode)`` prints, returned instead."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def audit(df: DataFrame) -> dict:
    """Structured physical-plan audit of a DataFrame (formatted-mode
    parse; see module docstring for what each number means)."""
    plan = plan_text(df, "formatted")
    nodes = re.findall(r"^\(\d+\) ([A-Za-z][\w ]*?)\s*(?:\[codegen id.*)?$",
                       plan, flags=re.M)
    exchanges = [n for n in nodes if n.startswith("Exchange")]
    scans = plan.count("Scan parquet")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_cols = [
        len([c for c in m.split(",") if ":" in c])
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    return {
        "n_exchanges": len(exchanges),
        "n_scans": scans,
        "pushed_filters": [p for p in pushed if p.strip()],
        "scan_read_cols": read_cols,
        "n_codegen_stages": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "python_nodes": sorted(
            {n for n in _PY_NODES if n in plan}
        ),
        "has_nested_loop_join": "NestedLoop" in plan
        or "CartesianProduct" in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan,
        "has_sort_merge_join": "SortMergeJoin" in plan,
    }


def assert_scales(
    df: DataFrame,
    max_exchanges: int,
    max_scan_cols: int | None = None,
    allow_nested_loop: bool = False,
    allow_python: bool = True,
) -> dict:
    """The common pre-flight gate: raise AssertionError (with the full
    audit in the message) if the plan shuffles more than ``max_exchanges``
    times, reads more than ``max_scan_cols`` columns in any scan, or
    contains a nested-loop/cartesian join (unless allowed). Returns the
    audit dict on success so callers can log it."""
    a = audit(df)
    ok = (
        a["n_exchanges"] <= max_exchanges
        and (allow_nested_loop or not a["has_nested_loop_join"])
        and (allow_python or not a["python_nodes"])
        and (
            max_scan_cols is None
            or all(c <= max_scan_cols for c in a["scan_read_cols"])
        )
    )
    if not ok:
        raise AssertionError(f"plan fails the scale gate: {a}")
    return a
