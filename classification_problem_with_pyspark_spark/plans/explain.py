"""Plan-inspection helpers (SURVEY.md §4): assert the physical plan is the
one we'd want at 100 TB, not just one that returns correct rows.

Used by tests/test_plans.py to enforce the engine's scale invariants:
- filters reach the parquet scan (PushedFilters),
- scans read only referenced columns (ReadSchema),
- dims broadcast (BroadcastHashJoin), facts never,
- aggregations partial before the exchange (partial_ functions),
- top-k plans TakeOrderedAndProject, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan missing {missing}:\n{plan}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}:\n{plan}"


def pushed_filters(df: DataFrame) -> str:
    """All PushedFilters lines from the formatted plan."""
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines() if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> str:
    return "\n".join(
        line.strip() for line in formatted_plan(df).splitlines() if "ReadSchema" in line
    )
