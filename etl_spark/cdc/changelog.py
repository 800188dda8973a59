"""Change-data-feed reader: the committed change stream between snapshots.

The Iceberg ``create_changelog_view`` / Delta CDF analog for the CoW
lake table: given two committed versions, emit one row per key whose
state changed, tagged ``insert`` / ``update`` / ``delete`` — so every
downstream (a search index, a cache, another lake table) can consume
the table's changes incrementally instead of re-reading snapshots.
Reference semantics ancestor: the per-run inserted/updated/deleted row
sets the connectors hand-collect to mirror changes onward
(thehive_to_dwh/transform_load.py:196-204 delete+replace,
es_deleting_old_writes/main.py:25-57 retention deletes).

Design — *reconstruct lazily from snapshots, never write a second log*:

- The write path stays untouched (no double-write, no changelog files to
  keep transactionally consistent with data). The manifest chain tells
  us, per bucket, exactly which commits swapped its data dir; only those
  dirs are scanned. Cost scales with the update footprint of the
  interval, exactly like the CoW merge itself — never with table size.
- **One plan for the whole interval, however many commits it spans.**
  Every distinct bucket dir referenced anywhere in the interval is read
  by a SINGLE parquet scan; a tiny broadcast map keyed on the dir path
  (from ``input_file_name``) tags each row with the commit(s) whose diff
  it participates in and its role there (``o`` = outgoing state, ``n``
  = incoming state — a dir is the new side of the commit that published
  it and the old side of the commit that replaced it, so each dir is
  scanned once and serves both). A naive reader would instead union one
  full-outer join per commit — plan depth, compile time and scan count
  all linear in the commit count; this shape is constant-depth:
  scan -> broadcast tag -> slim HashAggregate -> join-back.
- Classification rides ``_last_lsn``, aggregated per (key, commit) as
  two LONG buffers (HashAggregate-safe — string payloads never enter an
  aggregation buffer, which would force SortAggregate): no old state ->
  insert; no new state -> delete; advanced lsn -> update. A rewrite
  that did not change the row (compaction, rebucket) leaves both sides'
  ``_last_lsn`` identical and emits nothing — maintenance commits are
  changelog-invisible by construction. The payload is then fetched by
  joining the slim verdicts back to the tagged rows on
  (key, commit, winning side).
- Output column convention follows Delta CDF: ``_change_type``,
  ``_commit_version``; the row payload is the post-image (pre-image for
  deletes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lake import SnapshotTable
from .schema import KEY_COLS

CHANGE_COLS = ["commit", "lang", "content", "content_sha256", "_last_lsn"]

# matches the manifest-relative bucket-dir path inside a task's file URI;
# anchored to the trailing file name so a table ROOT that itself contains
# a data/vN/_bucket=K segment can never shadow the real bucket dir
_DIR_RE = r"(data/v\d+/_bucket=\d+)/[^/]*$"


def _dir_tags(manifests: dict[int, dict], from_version: int, to_version: int
              ) -> list[tuple[str, int, str]]:
    """(bucket-dir relpath, commit version, role) for every diff side in
    the interval. Walking the manifest chain per bucket: each commit
    where a bucket's dir reference changes contributes the outgoing dir
    as the ``o`` side and the incoming dir as the ``n`` side of that
    commit's diff (either may be absent — bucket born or emptied). A dir
    carried forward by reference across commits appears in no diff, and
    any one dir appears at most twice (new side once, old side once), so
    the tag list is O(changed buckets), never O(commits × buckets)."""
    tags: list[tuple[str, int, str]] = []
    cur = dict(manifests[from_version]["files"])
    for v in range(from_version + 1, to_version + 1):
        nxt = manifests[v]["files"]
        for b in set(cur) | set(nxt):
            o, n = cur.get(b), nxt.get(b)
            if o != n:
                if o is not None:
                    tags.append((o, v, "o"))
                if n is not None:
                    tags.append((n, v, "n"))
        cur = dict(nxt)
    return tags


def read_changelog(
    table: SnapshotTable, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Changes committed after ``from_version`` up to ``to_version``
    (default latest), one diff per intermediate commit so every
    transition is visible (a key inserted then deleted within the range
    yields both rows, like a real CDC feed). Raises
    ``SnapshotExpiredError`` if retention dropped a needed snapshot —
    the consumer must re-bootstrap from a full scan, exactly Iceberg's
    contract for an expired incremental read.
    """
    to_version = table.version() if to_version is None else to_version
    if to_version < from_version:
        raise ValueError(f"to_version {to_version} < from_version {from_version}")
    manifests = {v: table.manifest_at(v) for v in range(from_version, to_version + 1)}
    chained = sorted({
        b for m in manifests.values()
        for b, entry in m["files"].items() if not isinstance(entry, str)
    })
    if chained:
        raise NotImplementedError(
            "read_changelog over merge-on-read delta commits is not "
            f"supported yet (buckets {chained[:8]} are delta chains in the "
            "interval); run maintain.compact to fold chains, then read the "
            "changelog across the compacted snapshots"
        )
    tags = _dir_tags(manifests, from_version, to_version)
    if not tags:
        schema_src = table.read().select(
            *KEY_COLS, *CHANGE_COLS,
            F.lit("").alias("_change_type"), F.lit(0).alias("_commit_version"),
        )
        return schema_src.where(F.lit(False))
    spark = table.spark
    # one scan over every distinct dir, pruned to the diff columns
    wanted = set(KEY_COLS) | set(CHANGE_COLS)
    schema = T.StructType([f for f in table.base_fields if f.name in wanted])
    dirs = sorted({t[0] for t in tags})
    scan = spark.read.schema(schema).parquet(
        *[os.path.join(table.root, d) for d in dirs]
    )
    tags_df = spark.createDataFrame(
        tags, "_dirkey string, _commit_version int, _side string"
    )
    tagged = scan.withColumn(
        "_dirkey", F.regexp_extract(F.input_file_name(), _DIR_RE, 1)
    ).join(F.broadcast(tags_df), "_dirkey")
    # slim verdict: only longs cross the aggregation buffer
    side, lsn = F.col("_side"), F.col("_last_lsn")
    agg = (
        tagged.select(*KEY_COLS, "_commit_version", "_side", "_last_lsn")
        .groupBy(*KEY_COLS, "_commit_version")
        .agg(
            F.max(F.when(side == "o", lsn)).alias("_o_lsn"),
            F.max(F.when(side == "n", lsn)).alias("_n_lsn"),
        )
    )
    o_lsn, n_lsn = F.col("_o_lsn"), F.col("_n_lsn")
    change = (
        F.when(o_lsn.isNull(), "insert")
        .when(n_lsn.isNull(), "delete")
        .when(n_lsn != o_lsn, "update")
    )
    decided = (
        agg.withColumn("_change_type", change)
        .where(F.col("_change_type").isNotNull())
        # post-image payload; pre-image for deletes (the only side that exists)
        .withColumn(
            "_img_side",
            F.when(F.col("_change_type") == "delete", F.lit("o")).otherwise(F.lit("n")),
        )
        .select(*KEY_COLS, "_commit_version", "_change_type", "_img_side")
    )
    return (
        tagged.join(decided, [*KEY_COLS, "_commit_version"])
        .where(F.col("_side") == F.col("_img_side"))
        .select(*KEY_COLS, *CHANGE_COLS, "_change_type", "_commit_version")
    )
