"""Downstream replication: apply a table's changelog onto a mirror.

The consumer half of the CDF story (changelog.py is the producer): a
downstream lake table subscribes to an upstream table's committed
change feed and folds it in incrementally — per-version diffs, never a
full snapshot copy. This is the engine-grade version of the
reference's fan-out DAGs that re-read a source and re-upsert it into a
second store (hive_to_dwh + thehive_to_dwh chains); here the transfer
cost is O(changes), not O(table).

Exactly-once composition: the mirror's manifest records the upstream
version it has applied (``last_lsn`` carries the upstream COMMIT
VERSION — the replication cursor and the data commit in one atomic
rename, same invariant as the main engine's LSN checkpoint). Re-running
``sync`` after any crash resumes from the committed cursor; an already
applied version range is a no-op.

Each upstream commit's diff becomes one merge batch: changelog rows map
to I/U/D events with ``lsn = _commit_version`` and replay through the
standard ``apply_batch`` (slim conflict resolution, bucket-scoped CoW,
metrics) — the mirror is just another table of the same engine. The
mirror's ``_last_lsn`` is therefore the upstream VERSION, and row
equality with the upstream holds on (key, content, content_sha256).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .changelog import read_changelog
from .lake import SnapshotTable
from .merge import apply_batch
from .metrics import BatchMetrics
from .schema import EVENT_SCHEMA


def sync(
    spark: SparkSession,
    source: SnapshotTable,
    mirror: SnapshotTable,
    to_version: int | None = None,
) -> list[BatchMetrics]:
    """Fold the source's changes since the mirror's cursor into the
    mirror, one upstream commit per batch. Returns per-batch metrics
    (empty when already caught up). Raises ``SnapshotExpiredError`` if
    the source expired a needed snapshot — re-bootstrap the mirror from
    a full scan in that case.
    """
    from_version = mirror.last_lsn()
    to_version = source.version() if to_version is None else to_version
    out: list[BatchMetrics] = []
    for v in range(from_version + 1, to_version + 1):
        feed = read_changelog(source, v - 1, v)
        events = feed.select(
            F.lit(v).cast("long").alias("lsn"),
            F.when(F.col("_change_type") == "delete", "D").otherwise("U").alias("op"),
            "repo",
            "path",
            "commit",
            "lang",
            F.when(F.col("_change_type") != "delete", F.col("content")).alias("content"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("map<string,string>").alias("extra"),
            F.lit(None).cast(EVENT_SCHEMA["schema_change"].dataType).alias("schema_change"),
        )
        out.append(
            apply_batch(spark, mirror, events, batch_id=v, lsn_from=v - 1, lsn_to=v)
        )
    return out
