"""Physical-plan introspection helpers (SURVEY §4).

The engine performs no custom planning — Catalyst owns optimization —
but the *shape* of the chosen plan is part of the contract at 100 TB:
filters must reach the scan, `html` must never be read unless asked
for, small dims must broadcast.  These helpers make those properties
assertable in tests and in tools/explain_audit.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_of(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError("expected a broadcast join in plan:\n" + plan[:2000])


def assert_pushed_filters(df: DataFrame) -> None:
    plan = plan_of(df)
    if not re.search(r"PushedFilters: \[[^\]]+\]", plan):
        raise AssertionError("expected pushed filters in plan:\n" + plan[:2000])


def assert_no_single_partition_stage(df: DataFrame) -> None:
    """No stage may funnel the whole dataset through one task (global
    no-partition sorts/windows show up as an `Exchange SinglePartition`
    feeding a Sort/Window — the round-1 rate-source scale bug)."""
    plan = plan_of(df)
    if "Exchange SinglePartition" in plan:
        raise AssertionError(
            "plan funnels data through a single partition:\n" + plan[:2000]
        )


def assert_no_column_read(df: DataFrame, column: str) -> None:
    plan = plan_of(df)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        if column in m.group(1):
            raise AssertionError(
                f"scan reads forbidden column {column!r}: struct<{m.group(1)}>"
            )
