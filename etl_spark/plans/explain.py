"""Assertable plan inspection: the tests pin the physical properties the
engine relies on at 100 TB (pushdown, pruning, broadcast, codegen),
instead of hoping Catalyst did the right thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan_string(df: DataFrame) -> str:
    """The executedPlan tree as text (node names incl. aggregate/join
    strategies — what the hazard sweep greps)."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the parquet scan reports all fragments under PushedFilters."""
    plan = formatted_plan(df)
    lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    blob = " ".join(lines)
    return all(f in blob for f in fragments)


def read_schema_columns(df: DataFrame) -> set[str]:
    """Column names the scan actually reads (ReadSchema) — column pruning."""
    import re

    plan = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            if ":" in part:
                cols.add(part.split(":")[0].strip())
    return cols


def exchange_inputs(df: DataFrame) -> list[tuple[str, set[str]]]:
    """(arguments, input-column-names) per Exchange node — i.e. what
    actually crosses each shuffle. Lets tests pin that wide columns
    (arrays, content) don't ride a shuffle they don't need to."""
    import re

    plan = formatted_plan(df)
    out: list[tuple[str, set[str]]] = []
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: ([^\n]*)", plan
    ):
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()}
        out.append((m.group(2), cols))
    return out


def executed_node_rows(df: DataFrame) -> list[tuple[str, int]]:
    """(node class name, numOutputRows) for every executed-plan node that
    reports the metric — AFTER an action has run on ``df``. Lets tests
    pin data-volume bounds (e.g. "this join fans out O(touched keys),
    not O(commits × chain rows)") mechanically instead of by wall time.
    AQE-aware: descends into materialized query stages; reused exchanges
    are NOT descended (their rows were produced once by the original)."""
    out: list[tuple[str, int]] = []
    seen: set[int] = set()

    def walk(node):
        if node is None:
            return
        oid = node.hashCode()
        name = node.getClass().getSimpleName()
        if name == "ReusedExchangeExec":
            return
        if (oid, name) in seen:
            return
        seen.add((oid, name))
        try:
            metrics = node.metrics()
            if metrics.contains("numOutputRows"):
                out.append((name, int(metrics.apply("numOutputRows").value())))
        except Exception:
            pass
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif name.endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())  # noqa: SLF001
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
