"""Physical-plan introspection: make scale properties ASSERTABLE.

The reference delegates all planning to Spark and never looks back
(SURVEY §4.1).  At 100 TB the physical plan IS the performance model,
so this engine treats plan shape as a testable contract: every operator
family has invariants (dims broadcast, filters reach the scan, no
nested-loop joins, codegen covers the hot path) and CI asserts them
with these helpers instead of hoping Catalyst picked well.

PySpark 4 note: ``df._jdf.queryExecution().explainString`` is not
reachable from Python; ``df.explain(...)`` prints to stdout, so we
capture it (the one supported, version-stable surface).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (``explain`` output captured)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges and
    AQE re-used ones) — the dominant cost term at scale."""
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = physical_plan(df)
    return len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))


def has_nested_loop_join(df: DataFrame) -> bool:
    """True if ANY nested-loop join appears — an O(n*m) pair scan that
    must never survive review for unbounded inputs."""
    return "NestedLoopJoin" in physical_plan(df)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan: verifies column pruning (a scan
    listing columns the query never uses reads them off disk too)."""
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (.+)", plan)]

def scan_pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters of every file scan (empty string when none)."""
    plan = physical_plan(df)
    return [m.group(1).strip() for m in re.finditer(r"PushedFilters: \[(.*)\]", plan)]


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen span count; fewer, wider spans = more of the
    plan runs as fused JVM bytecode rather than interpreted operators."""
    plan = physical_plan(df, "simple")
    ids = re.findall(r"\*\((\d+)\)", plan)
    return len(set(ids))


def assert_scalable(df: DataFrame, max_exchanges: int | None = None) -> None:
    """The baseline plan contract for any operator in this engine:
    no nested-loop joins, and optionally a shuffle budget."""
    plan = physical_plan(df)
    if "NestedLoopJoin" in plan:
        raise AssertionError(f"nested-loop join in plan:\n{plan}")
    if max_exchanges is not None:
        n = len(re.findall(r"\(\d+\) Exchange\b", plan))
        if n > max_exchanges:
            raise AssertionError(
                f"{n} shuffle exchanges (budget {max_exchanges}):\n{plan}"
            )
