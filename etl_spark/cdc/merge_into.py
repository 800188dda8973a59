"""General-purpose MERGE INTO: upsert/delete an arbitrary keyed
DataFrame into the lake table — the K1/K2/K4 surface for callers that
have a SNAPSHOT of rows rather than an ordered change log (the
reference's per-connector upload.py loops are exactly this shape:
"here are today's rows, upsert them", replication_otrs_to_dwh/
postgresql/upload.py:35-308).

Implementation: one synthetic single-batch replay through the standard
``apply_batch`` (slim conflict resolution, semi-join reduction,
bucket-scoped CoW, metrics, atomic commit) — every row carries the SAME
synthetic LSN (checkpoint + 1), which is correct because MERGE INTO
requires source keys to be unique. Uniqueness is ENFORCED, not assumed:
with equal LSNs the per-key winner would be scheduling-dependent, so
duplicate source keys raise BEFORE anything is written instead of
silently picking one (the reference's resolve_doubles order-dependence
is the bug this refuses to inherit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import SnapshotTable
from .metrics import BatchMetrics
from .policies import NO_POLICIES, MergePolicies
from .schema import EVENT_SCHEMA


class DuplicateSourceKeysError(ValueError):
    """MERGE INTO source contains the same (repo, path) key twice."""


def merge_into(
    spark: SparkSession,
    table: SnapshotTable,
    source: DataFrame,
    delete_when: Column | None = None,
    policies: MergePolicies = NO_POLICIES,
) -> BatchMetrics:
    """Upsert ``source`` rows (columns: repo, path, commit, lang,
    content; optional ts/extra) into ``table``; rows matching
    ``delete_when`` delete their key instead. Returns batch metrics.
    Raises ``DuplicateSourceKeysError`` if a key appears twice.

    Checkpoint note: the merge consumes one LSN (checkpoint + 1) from
    the table's sequence. On a table also fed by a live change log this
    SHADOWS the log event at that LSN (it would drop as late) — use
    merge_into on snapshot-managed tables, or interleave only at log
    positions you own."""
    from .merge import apply_batch

    ckpt = table.last_lsn()
    lsn = ckpt + 1
    cols = {c.lower() for c in source.columns}

    # Materialize the source ONCE before the guard and the merge read it:
    # a non-deterministic source (sample/limit/shuffle-order-dependent
    # input, or a directory mutated between jobs) could otherwise pass
    # the uniqueness check in job 1 and still deliver duplicates to the
    # merge in job 2. localCheckpoint pins the evaluated partitions so
    # both jobs see the same rows.
    source = source.localCheckpoint(eager=True)

    # contract check FIRST — nothing may be committed if the source is
    # ambiguous (one narrow aggregate over the key columns)
    dup = (
        source.groupBy("repo", "path").count().where(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise DuplicateSourceKeysError(
            "merge_into source contains duplicate (repo, path) keys; "
            "per-key winners would be scheduling-dependent — dedupe the "
            "source first (e.g. dedup_last_writer on your own order column)"
        )

    def _opt(name: str, ddl: str):
        return F.col(name) if name in cols else F.lit(None).cast(ddl)

    op = F.lit("U") if delete_when is None else (
        F.when(delete_when, "D").otherwise("U")
    )
    events = source.select(
        F.lit(lsn).cast("long").alias("lsn"),
        op.alias("op"),
        "repo",
        "path",
        _opt("commit", "string").alias("commit"),
        _opt("lang", "string").alias("lang"),
        _opt("content", "string").alias("content"),
        _opt("ts", "timestamp").alias("ts"),
        _opt("extra", "map<string,string>").alias("extra"),
        F.lit(None).cast(EVENT_SCHEMA["schema_change"].dataType).alias("schema_change"),
    )
    if delete_when is not None:
        # deletes never carry content
        events = events.withColumn(
            "content", F.when(F.col("op") != "D", F.col("content"))
        )
    return apply_batch(
        spark, table, events,
        batch_id=table.version() + 1, lsn_from=ckpt, lsn_to=lsn,
        policies=policies,
    )
