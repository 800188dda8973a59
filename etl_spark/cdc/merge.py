"""Copy-on-write MERGE of one deduped micro-batch into the snapshot table.

Reference semantics implemented here (SURVEY.md §2.2):
- K1 keyed upsert  (replication_otrs_to_dwh/postgresql/upload.py:35-308)
- K2 insert-if-absent        (upload.py:468-520)  — I on an absent key
- K4 delete/replace-on-change (thehive_to_dwh/transform_load.py:196-204)
- K7 predicate delete         (es_deleting_old_writes/main.py:25-57) — D op
- D1 identity-hash invariant  (transform_load.py:176-203) — content_sha256
- A6 run-metrics counters     (multiple; see metrics.py)

Physical plan (chosen over a full-outer join deliberately):

    target(touched buckets)  LEFT JOIN  broadcast(upd keys+op)   -- no shuffle,
        -> keep unmatched rows ("carry"), drop matched            -- one pass
    UNION ALL  upd rows with op in (I,U)                          -- appended
    -> write partitionBy(_bucket)                                 -- CoW dirs

Spark cannot broadcast either side of a FULL OUTER join, so the naive
``target.join(upd, key, 'full_outer')`` would sort-merge-shuffle the whole
touched partition set. The anti-join-shaped left join broadcasts the
(small) update keyset instead: the target is read exactly once, streamed
through a BroadcastHashJoin, and never shuffled. When a batch is too big
to broadcast, the hint is skipped and AQE picks SMJ. Per-op counters ride
on ``DataFrame.observe`` so the metrics pass is fused into the write.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import lang_norm, lang_norm_expr, sha256_hex
from .dedup import bucket_expr, dedup_last_writer
from .evolve import (
    SchemaChange,
    apply_to_dyn_schema,
    evolve_table,
    extract_schema_changes,
    remap_extra_keys,
    requires_rewrite,
)
from .lake import SnapshotTable
from .metrics import BatchMetrics
from .schema import KEY_COLS

# above this many update rows, let AQE pick the join instead of broadcasting
BROADCAST_MAX_ROWS = 4_000_000


def _project_updates(
    winners: DataFrame, dyn_final: list[tuple[str, str]], use_arrow_udfs: bool = False
) -> DataFrame:
    """Winner events -> lake-table row shape (+op for merge routing).

    The two row transforms (content sha256, lang normalization) have two
    implementations, byte-identical (tests/test_replay.py):

    - default: JVM-native ``F.sha2``/CASE-chain — stays inside whole-stage
      codegen, zero Python boundary crossings. Measured ~10x faster than
      the Arrow path at 500k-events/batch (no Arrow round-trip of the
      ~2KB content column).
    - ``use_arrow_udfs=True``: Arrow-batched pandas UDFs (udfs.py) — the
      pattern every transform that genuinely needs Python follows (never
      per-row Python). Runs on deduped winners only, the minimum row
      count that ever crosses the Python boundary.
    """
    if use_arrow_udfs:
        lang_col = lang_norm(F.col("lang"))
        sha_col = sha256_hex(F.col("content"))
    else:
        lang_col = lang_norm_expr(F.col("lang"))
        sha_col = F.sha2(F.col("content"), 256)
    cols = [
        F.col("repo"),
        F.col("path"),
        F.col("commit"),
        lang_col.alias("lang"),
        F.col("content"),
        sha_col.alias("content_sha256"),
        F.col("lsn").alias("_last_lsn"),
    ]
    for name, ddl in dyn_final:
        cols.append(F.element_at(F.col("extra"), name).cast(ddl).alias(name))
    cols.append(F.col("op"))
    return winners.select(*cols)


def apply_batch(
    spark: SparkSession,
    table: SnapshotTable,
    batch: DataFrame,
    batch_id: int,
    lsn_from: int,
    lsn_to: int,
    salted_dedup: bool = False,
    use_arrow_udfs: bool = False,
) -> BatchMetrics:
    """Apply one LSN-bounded micro-batch exactly-once; returns metrics.

    Idempotent: a batch whose lsn_to <= checkpoint is a recorded no-op;
    individual events at-or-below the checkpoint count as late and drop
    (D5 grace semantics, replication_otrs_to_dwh/main.py:64-66 analog).
    """
    t0 = time.time()
    ckpt = table.last_lsn()
    m = BatchMetrics(batch_id=batch_id, lsn_from=lsn_from, lsn_to=lsn_to)

    if lsn_to <= ckpt:  # replayed batch: exactly-once no-op
        m.wall_secs = time.time() - t0
        return m

    # --- batch-level counts + schema-control events, ONE pass over the
    # batch scan (schema events are rare, so collect_list stays tiny)
    live = F.col("lsn") > ckpt
    counts = batch.agg(
        F.count("*").alias("seen"),
        F.sum(F.when(~live, 1).otherwise(0)).alias("late"),
        F.sum(F.when(live, 1).otherwise(0)).alias("n_live"),
        F.count_distinct(F.when(live, F.col("lsn"))).alias("n_live_distinct"),
        F.sum(F.when(live & (F.col("op") != "S"), 1).otherwise(0)).alias("n_data"),
        F.collect_list(
            F.when(live & (F.col("op") == "S"), F.struct("lsn", "schema_change"))
        ).alias("schema_rows"),
    ).collect()[0]
    m.events_seen = counts["seen"] or 0
    m.late_events = counts["late"] or 0
    m.duplicate_deliveries = (counts["n_live"] or 0) - (counts["n_live_distinct"] or 0)
    m.data_events = counts["n_data"] or 0
    m.schema_events = (counts["n_live"] or 0) - m.data_events

    # --- schema evolution (fold the collected control events, lsn order,
    # idempotent under duplicate deliveries)
    changes: list[SchemaChange] = extract_schema_changes(counts["schema_rows"])
    dyn_prev = table.dyn_schema()
    dyn_final = apply_to_dyn_schema(dyn_prev, changes)
    full_rewrite = requires_rewrite(changes)
    m.full_rewrite = full_rewrite

    # --- dedup to per-key winners, project to table shape
    data = batch.where(live & (F.col("op") != "S"))
    data = remap_extra_keys(data, changes)
    winners = dedup_last_writer(data, KEY_COLS, "lsn", salted=salted_dedup)
    upd = _project_updates(winners, dyn_final, use_arrow_udfs=use_arrow_udfs).withColumn(
        "_bucket", bucket_expr(table.n_buckets)
    )
    # observe only when data exists: on a provably-empty plan (e.g. a
    # schema-only batch) Catalyst's empty-relation propagation elides the
    # CollectMetrics node and Observation.get would fail
    op_obs = Observation(f"ops_b{batch_id}") if m.data_events else None
    if op_obs is not None:
        upd = upd.observe(
            op_obs,
            F.sum(F.when(F.col("op").isin("I", "U"), 1).otherwise(0)).alias("n_iu"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_d"),
        )
    upd = upd.persist()

    try:
        # one action fills the cache, yields touched buckets AND (via the
        # observation) per-op counters — no separate counting jobs
        touched = sorted(
            r["_bucket"] for r in upd.select("_bucket").distinct().collect()
        )
        ops = op_obs.get if op_obs is not None else {}
        n_iu = int(ops.get("n_iu") or 0)
        n_d = int(ops.get("n_d") or 0)
        m.winners = n_iu + n_d
        m.conflicts_resolved = m.data_events - m.winners
        manifest_prev = table.manifest()
        if full_rewrite:
            committed = [int(b) for b in manifest_prev["files"]]
            touched = sorted(set(touched) | set(committed))

        if not touched and not full_rewrite:
            # schema-only (add) or fully-late batch: metadata-only commit
            table.commit(
                table.version() + 1, None, [], max(ckpt, lsn_to), dyn_final, m.to_dict()
            )
            m.wall_secs = time.time() - t0
            return m

        # --- target side: only touched buckets are read & rewritten (CoW)
        target = table.read(buckets=None if full_rewrite else touched)
        target = evolve_table(target, changes, dyn_final)

        data_cols = [c for c in target.columns]  # final table column order

        upd_keys = upd.select(*KEY_COLS, "op")
        if n_iu + n_d <= BROADCAST_MAX_ROWS:
            upd_keys = F.broadcast(upd_keys)
        j = target.join(upd_keys, on=KEY_COLS, how="left")
        obs = Observation(f"merge_b{batch_id}")
        j = j.observe(
            obs,
            F.sum(F.when(F.col("op").isNull(), 1).otherwise(0)).alias("carried"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deleted"),
            F.sum(F.when(F.col("op").isin("I", "U"), 1).otherwise(0)).alias("replaced"),
        )
        # Both union branches arrive at the writer already bucket-aligned:
        # - kept: target files are read per-bucket-dir, so each task holds
        #   rows of exactly one bucket (broadcast join preserves that);
        # - upserts: the dedup shuffle mixes every bucket into every task,
        #   so ONE explicit repartition on _bucket (the small, deduped
        #   winner set — not the raw batch) re-aligns it.
        # partitionBy then writes O(n_buckets) files instead of
        # O(tasks x n_buckets) — the small-file explosion is the write-side
        # bottleneck at any scale.
        kept = (
            j.where(F.col("op").isNull())
            .select(*data_cols)
            .withColumn("_bucket", bucket_expr(table.n_buckets))
        )
        upserts = (
            upd.where(F.col("op") != "D")
            .select(*data_cols, "_bucket")
            .repartition(max(len(touched), 1), "_bucket")
        )
        final = kept.unionByName(upserts)

        version = table.version() + 1
        out_dir = table.new_data_dir(version)
        final.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)

        got = obs.get
        m.deleted = int(got.get("deleted") or 0)
        replaced = int(got.get("replaced") or 0)
        m.updated = replaced
        m.inserted = n_iu - replaced
        m.delete_noop = n_d - m.deleted
        m.rows_out = int(got.get("carried") or 0) + n_iu
        m.buckets_touched = len(touched)

        # per-partition lineage from the freshly written CoW dirs
        has_bucket_dirs = os.path.isdir(out_dir) and any(
            e.startswith("_bucket=") for e in os.listdir(out_dir)
        )
        if has_bucket_dirs:
            lineage_rows = (
                spark.read.option("basePath", out_dir)
                .parquet(out_dir)
                .groupBy("_bucket")
                .agg(F.count("*").alias("rows"), F.max("_last_lsn").alias("max_lsn"))
                .collect()
            )
            m.lineage = {
                str(r["_bucket"]): {
                    "rows": r["rows"],
                    "max_lsn": r["max_lsn"],
                    "dir": f"data/v{version}/_bucket={r['_bucket']}",
                }
                for r in lineage_rows
            }

        table.commit(
            version,
            out_dir,
            touched,
            max(ckpt, lsn_to),
            dyn_final,
            m.to_dict(),
            full_rewrite=full_rewrite,
        )
        m.wall_secs = time.time() - t0
        return m
    finally:
        upd.unpersist()
