"""Physical-plan introspection helpers.

The engine's scale properties are structural: transforms must stay
map-only, fit aggregations must do map-side partial aggregation, and
predicates/projections must reach the parquet scan. These helpers read
the executed plan so tests (and users tuning a deployment) can assert
those properties instead of assuming them — the programmatic analog of
eyeballing ``df.explain("formatted")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def num_shuffles(df: DataFrame) -> int:
    """Count of Exchange operators (each is one shuffle boundary)."""
    return executed_plan(df).count("Exchange")


def is_map_only(df: DataFrame) -> bool:
    """True when the plan has no shuffle — a narrow, pipelined job
    (the required shape for every transform/score path)."""
    return num_shuffles(df) == 0


def uses_partial_aggregation(df: DataFrame) -> bool:
    """True when aggregation is split into partial (map-side) + final
    hash aggregates around an exchange — Spark's combiner contract,
    the same add/merge shape as the reference's sketch API."""
    plan = executed_plan(df)
    return plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = executed_plan(df)
    if "PushedFilters: [" not in plan:
        return ""
    return plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]


def scan_schema(df: DataFrame) -> str:
    """The ReadSchema of the (first) file scan — verifies column
    pruning reached the reader ('' if no file scan)."""
    plan = executed_plan(df)
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:", 1)[1].splitlines()[0].strip()


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans; wider spans = more of the
    plan fused into generated JVM code."""
    plan = executed_plan(df)
    return plan.count("WholeStageCodegen")
