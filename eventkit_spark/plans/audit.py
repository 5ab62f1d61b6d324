"""Physical-plan audit helpers.

The engine's performance contract is that operators stay declarative so
Catalyst can optimize (SURVEY.md §4.2): filters reach the parquet scan,
small dimensions broadcast, windows don't force extra shuffles. These
helpers make those properties assertable in tests and inspectable in
notebooks — `.explain()` as a unit-testable API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate was pushed into the scan (shows up in the
    FileSourceScan's PushedFilters list)."""
    plan = physical_plan(df)
    scans = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    if not any(fragment in ln for ln in scans):
        raise AssertionError(
            f"filter fragment {fragment!r} not pushed to any scan.\n"
            + "\n".join(scans or [plan])
        )


def assert_broadcast_join(df: DataFrame, execute: bool = False) -> None:
    """Assert at least one join in the plan executes as a broadcast.

    ``execute=True`` runs the query first so AQE's FINAL plan is
    inspected — required for joins the engine deliberately leaves
    unhinted (e.g. keyed takeuntil cut tables) where only runtime
    statistics reveal the small side."""
    if execute:
        df.count()
    plan = physical_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"no broadcast join in plan:\n{plan}")


def count_shuffles(df: DataFrame) -> int:
    """Number of exchanges in the physical plan (lower = better for the
    same result; windows/joins/aggregations each justify at most one)."""
    plan = physical_plan(df)
    return sum(1 for ln in plan.splitlines() if "Exchange" in ln and "Reused" not in ln)
