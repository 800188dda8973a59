"""Schema evolution: detect add/rename/type-widen events, apply before merge.

Reference analog: the ES ``customFields`` variant maps whose schema is
discovered from the payload at runtime (incidents_for_dashboards/
main.py:160-166, thehive_to_dwh/transform_load.py:51-171). Here schema
changes arrive as explicit control events in the same ordered log
(FIXTURES.md §2 ``schema_change``), so evolution is deterministic and
replayable.

Semantics (matched by the oracle reducer in gen.py):
- ``add column c type t``      → table gains c (null backfill).
- ``rename a -> b``            → values already materialized under a move
                                 to b; within the same batch, data events
                                 with lsn < rename.lsn that carry ``a`` in
                                 their extra map are re-homed to ``b``.
- ``widen c -> t'``            → column type widens along WIDEN_OK.

Renames/widens force a copy-on-write rewrite of all live files (the
parquet fallback has no Iceberg field-ID metadata; with real
iceberg-spark-runtime jars this becomes a metadata-only ALTER TABLE).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import PROTECTED_COLS, WIDEN_OK, ddl_to_type


@dataclass(frozen=True)
class SchemaChange:
    lsn: int
    kind: str
    column: str
    new_name: str | None
    new_type: str | None


class SchemaEvolutionError(ValueError):
    pass


def extract_schema_changes(schema_rows) -> list[SchemaChange]:
    """Fold pre-collected ``(lsn, schema_change)`` structs into ordered
    changes. The rows arrive from the batch's single counting aggregate
    (merge.py) — schema events are rare, so the list is tiny. Duplicate
    deliveries of a control event (same lsn) collapse to one."""
    seen: set[int] = set()
    out: list[SchemaChange] = []
    for r in sorted(schema_rows or [], key=lambda r: r["lsn"]):
        if r["lsn"] in seen:
            continue
        seen.add(r["lsn"])
        sc = r["schema_change"]
        out.append(
            SchemaChange(r["lsn"], sc["kind"], sc["column"], sc["new_name"], sc["new_type"])
        )
    return out


def apply_to_dyn_schema(
    dyn: list[tuple[str, str]], changes: list[SchemaChange]
) -> list[tuple[str, str]]:
    """Fold schema changes (lsn order) into the dynamic-column schema."""
    out = [list(c) for c in dyn]
    names = {c[0] for c in out}
    for ch in changes:
        for n in (ch.column, ch.new_name or ""):
            if n in PROTECTED_COLS or n.startswith("_"):
                raise SchemaEvolutionError(
                    f"schema change touches protected/reserved column: {ch}"
                )
        if ch.kind == "add":
            if ch.column in names:
                raise SchemaEvolutionError(f"duplicate add: {ch.column}")
            out.append([ch.column, ch.new_type or "string"])
            names.add(ch.column)
        elif ch.kind == "rename":
            if ch.column not in names:
                raise SchemaEvolutionError(f"rename of unknown column: {ch.column}")
            if ch.new_name in names:
                raise SchemaEvolutionError(f"rename collides: {ch.new_name}")
            for c in out:
                if c[0] == ch.column:
                    c[0] = ch.new_name
            names.discard(ch.column)
            names.add(ch.new_name)
        elif ch.kind == "widen":
            for c in out:
                if c[0] == ch.column:
                    old_t = ddl_to_type(c[1]).typeName()
                    new_t = ddl_to_type(ch.new_type).typeName()
                    if old_t != new_t and (old_t, new_t) not in WIDEN_OK:
                        raise SchemaEvolutionError(
                            f"illegal widen {c[1]} -> {ch.new_type} on {ch.column}"
                        )
                    c[1] = ch.new_type
        else:
            raise SchemaEvolutionError(f"unknown schema_change kind: {ch.kind}")
    return [tuple(c) for c in out]


def requires_rewrite(changes: list[SchemaChange]) -> bool:
    """add = metadata-only (schema-on-read nulls); rename/widen = CoW rewrite."""
    return any(ch.kind in ("rename", "widen") for ch in changes)


def remap_extra_keys(data: DataFrame, changes: list[SchemaChange]) -> DataFrame:
    """Re-home extra-map values of events that predate an in-batch rename.

    An event at lsn L carrying key 'a' refers to the column later renamed
    a->b at lsn R > L; after the batch the column is 'b', so the value
    must land there. Applied as a transform_keys chain (JVM-side).
    """
    renames = [c for c in changes if c.kind == "rename"]
    if not renames:
        return data

    def key_fn(k, _v):
        expr = k
        for ch in renames:
            expr = F.when(
                (F.col("lsn") < ch.lsn) & (expr == ch.column), F.lit(ch.new_name)
            ).otherwise(expr)
        return expr

    return data.withColumn(
        "extra",
        F.when(
            F.col("extra").isNotNull(), F.transform_keys(F.col("extra"), key_fn)
        ),
    )


def evolve_table(
    target: DataFrame, changes: list[SchemaChange], final_dyn: list[tuple[str, str]]
) -> DataFrame:
    """Bring a materialized target (read under its stored schema) to the
    post-change schema: rename columns, widen casts, add nulls."""
    for ch in changes:
        if ch.kind == "rename" and ch.column in target.columns:
            target = target.withColumnRenamed(ch.column, ch.new_name)
    existing = set(target.columns)
    for name, ddl in final_dyn:
        if name in existing:
            target = target.withColumn(name, F.col(name).cast(ddl))
        else:
            target = target.withColumn(name, F.lit(None).cast(ddl))
    return target
