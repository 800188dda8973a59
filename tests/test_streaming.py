"""Structured Streaming front-end + snapshot retention.

- stream_replay(availableNow) over a static log must materialize the
  SAME final state as the batch replay loop (same oracle).
- restarting the stream after new files arrive continues incrementally
  (file-source checkpoint) and stays exactly-once.
- expire_snapshots drops old version dirs but never live data.
"""

import os

from etl_spark.cdc.gen import GenConfig, generate_events, oracle_reduce, write_events
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.streaming import stream_replay

from .conftest import assert_table_matches_oracle


def _order_mtimes_by_lsn(log_dir: str) -> None:
    """Model a real log tail: part files (range-partitioned by lsn, so
    part index == lsn order) get ascending mtimes. Spark's file source
    delivers oldest-first, which is the engine's in-order contract."""
    parts = sorted(p for p in os.listdir(log_dir) if p.startswith("part-"))
    base = 1_700_000_000
    for i, p in enumerate(parts):
        os.utime(os.path.join(log_dir, p), (base + i, base + i))


def test_stream_replay_matches_oracle(spark, tmp_path):
    cfg = GenConfig(n_events=3000, n_keys=150, seed=17, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    write_events(spark, cfg, log_dir, n_files=6)
    _order_mtimes_by_lsn(log_dir)
    state, dyn = oracle_reduce(generate_events(spark, cfg).collect())

    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    metrics = []
    q = stream_replay(
        spark, log_dir, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        collected_metrics=metrics,
    )
    q.awaitTermination(120)
    assert table.version() >= 1
    assert_table_matches_oracle(table.read().collect(), state, dyn)
    assert sum(m.events_seen for m in metrics) >= 3000  # dups redelivered too


def test_stream_restart_is_incremental_and_exactly_once(spark, tmp_path):
    cfg_a = GenConfig(n_events=1000, n_keys=80, seed=5)
    log_dir = str(tmp_path / "log")
    write_events(spark, cfg_a, log_dir, n_files=2)

    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    q = stream_replay(spark, log_dir, table, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    v_after_first = table.version()
    lsn_after_first = table.last_lsn()
    assert lsn_after_first == 1000

    # new files arrive: events 1001..2000 (same generator, wider range,
    # written as extra files into the same directory)
    cfg_b = GenConfig(n_events=2000, n_keys=80, seed=5)
    df_b = generate_events(spark, cfg_b).where("lsn > 1000")
    (df_b.repartitionByRange(2, "lsn").sortWithinPartitions("lsn")
        .write.mode("append").parquet(log_dir))

    q2 = stream_replay(spark, log_dir, table, checkpoint_dir=ckpt)
    q2.awaitTermination(120)
    assert table.last_lsn() == 2000
    assert table.version() > v_after_first

    # full-log oracle equivalence after the incremental pass
    state, dyn = oracle_reduce(generate_events(spark, cfg_b).collect())
    assert_table_matches_oracle(table.read().collect(), state, dyn)

    # restart with nothing new: no-op, no version churn
    v = table.version()
    q3 = stream_replay(spark, log_dir, table, checkpoint_dir=ckpt)
    q3.awaitTermination(120)
    assert table.version() == v


def test_expire_snapshots_keeps_live_data(spark, tmp_path):
    from etl_spark.cdc.runner import replay

    cfg = GenConfig(n_events=2000, n_keys=100, seed=9)
    df = generate_events(spark, cfg)
    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, table, batch_size=400)  # 5 versions
    assert table.version() == 5
    before = sorted(map(tuple, table.read().collect()))

    removed = table.expire_snapshots(keep_last=2)
    assert removed, "old version dirs should be dropped"
    data_root = str(tmp_path / "lake" / "data")
    remaining = set(os.listdir(data_root))
    # live manifest still fully readable, identical rows
    after = sorted(map(tuple, table.read().collect()))
    assert after == before
    # every path referenced by the live manifest survived
    from etl_spark.cdc.lake import _chain

    for entry in table.manifest()["files"].values():
        for rel in _chain(entry):
            assert rel.split("/")[1] in remaining


def test_out_of_order_delivery_fails_loudly(spark, tmp_path):
    """A NEW batch entirely below the checkpoint (source delivered files
    out of LSN order — backfilled/copied files, mtime ties) must raise,
    not silently drop; crash-redelivery of the same epoch stays a no-op
    (covered by the restart test above)."""
    import pyspark.sql.functions as F

    from etl_spark.cdc.gen import GenConfig, generate_events

    log_dir = str(tmp_path / "log")
    df = generate_events(spark, GenConfig(n_events=2000, n_keys=80, seed=21))
    # write the SECOND half first with an older mtime, so the file source
    # delivers high LSNs in trigger 1 and low LSNs in trigger 2
    (df.where(F.col("lsn") > 1000).coalesce(1)
       .write.mode("append").parquet(log_dir))
    hi_part = [p for p in os.listdir(log_dir) if p.startswith("part-")]
    (df.where(F.col("lsn") <= 1000).coalesce(1)
       .write.mode("append").parquet(log_dir))
    for p in os.listdir(log_dir):
        if p.startswith("part-"):
            t = 1_700_000_000 if p in hi_part else 1_700_000_100
            os.utime(os.path.join(log_dir, p), (t, t))

    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    q = stream_replay(
        spark, log_dir, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    try:
        q.awaitTermination(120)
        raised = False
    except Exception as e:  # StreamingQueryException wraps the sink error
        raised = "OutOfOrderDeliveryError" in str(e) or "out of LSN order" in str(e)
    assert raised, "out-of-order batch must fail the stream, not drop data"


def test_windowed_rates_watermark_drops_late(spark, tmp_path):
    """Event-time windowed aggregation in APPEND mode: a window is
    emitted exactly once when the watermark passes its end, late rows to
    a finalized window are strictly dropped, and unfinalized windows are
    never emitted. State is bounded by the watermark — the property that
    keeps the aggregation runnable at 10^10 events."""
    import datetime

    from pyspark.sql import functions as F

    from etl_spark.cdc.schema import EVENT_SCHEMA
    from etl_spark.streaming.stream_runner import stream_windowed_rates

    log_dir = str(tmp_path / "wlog")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(lsn, secs):
        return {
            "lsn": lsn, "op": "I", "repo": "r1", "path": f"f{lsn}.py",
            "commit": f"c{lsn}", "lang": "python", "content": "x",
            "ts": t0 + datetime.timedelta(seconds=secs),
            "extra": None, "schema_change": None,
        }

    # Three files -> three micro-batches (maxFilesPerTrigger=1). The
    # watermark a batch OPERATES under is the one computed after the
    # batch BEFORE the previous one (Spark propagates it with one batch
    # of lag), so the late file is placed two batches after the events
    # that advance the watermark past its window:
    #   A: minute-0 events + a minute-3 event (max ts 03:00)
    #   B: minute-3 event (max ts 03:30) -> watermark 03:00 operative in C
    #   C: LATE minute-0 event -> strictly dropped; window already final
    writes = [
        [ev(1, 10), ev(2, 40), ev(3, 180)],
        [ev(4, 210)],
        [ev(5, 20)],  # late: window [00:00, 01:00) long finalized
    ]
    base = 1_700_000_000
    have: set = set()
    for i, rows in enumerate(writes):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(log_dir)
        new = {p for p in os.listdir(log_dir) if p.startswith("part-")} - have
        for p_ in new:  # uuid part names: order mtimes by write order
            os.utime(os.path.join(log_dir, p_), (base + 60 * i, base + 60 * i))
        have |= new

    agg = stream_windowed_rates(spark, log_dir, "1 minute", "30 seconds")
    batches = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, eid: batches.append((eid, df.collect())))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = [r for _, rows in batches for r in rows]
    # exactly ONE window finalized — minute 0, emitted once the 03:00
    # watermark (from file B) became operative — and the late lsn=5
    # event was strictly dropped: count stays 2, max_lsn stays 2.
    # Minute 3 never finalizes (watermark never passes 04:00) and is
    # never emitted.
    assert [(r["window_start"], r["repo"], r["n_events"], r["max_lsn"])
            for r in emitted] == [(t0, "r1", 2, 2)]


def test_stream_inherits_quarantine(spark, tmp_path):
    """The streaming front-end runs the same prepare/apply pipeline, so
    malformed events in a streamed log divert to the dead-letter sink
    instead of merging (or failing the stream)."""
    from pyspark.sql import Row

    from etl_spark.cdc.schema import EVENT_SCHEMA

    cfg = GenConfig(n_events=1000, n_keys=60, seed=41)
    log_dir = str(tmp_path / "log")
    write_events(spark, cfg, log_dir, n_files=2)
    bad = spark.createDataFrame([
        Row(lsn=1001, op="X", repo="r0", path="evil.py", commit="c",
            lang="py", content="boom", ts=None, extra=None,
            schema_change=None),
        Row(lsn=1002, op="I", repo=None, path="p", commit="c",
            lang="py", content="boom2", ts=None, extra=None,
            schema_change=None),
    ], EVENT_SCHEMA)
    bad.coalesce(1).write.mode("append").parquet(log_dir)
    _order_mtimes_by_lsn(log_dir)

    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    metrics = []
    q = stream_replay(
        spark, log_dir, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        collected_metrics=metrics,
    )
    q.awaitTermination(120)

    state, dyn = oracle_reduce(generate_events(spark, cfg).collect())
    assert_table_matches_oracle(table.read().collect(), state, dyn)
    assert sum(m.quarantined for m in metrics) == 2
    got = {r["lsn"]: r["_reason"] for r in table.read_quarantine().collect()}
    assert got == {1001: "bad_op", 1002: "null_key"}


def test_stream_replay_delta_mode_with_chain_budget(spark, tmp_path):
    """The unbounded 10^10-event shape: streaming tail -> winners-only
    merge-on-read commits + per-bucket chain folding inside the sink.
    Final state matches the oracle, chains respect the budget, and
    compaction inside foreachBatch does not break exactly-once."""
    from etl_spark.cdc.maintain import chain_lengths

    cfg = GenConfig(n_events=3000, n_keys=150, seed=17, dup_rate=0.1)
    log_dir = str(tmp_path / "log")
    write_events(spark, cfg, log_dir, n_files=6)
    _order_mtimes_by_lsn(log_dir)
    state, dyn = oracle_reduce(generate_events(spark, cfg).collect())

    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    q = stream_replay(
        spark, log_dir, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        write_mode="delta",
        compact_chain_len=2,
    )
    q.awaitTermination(120)
    assert table.version() >= 1
    assert max(chain_lengths(table).values()) <= 2
    assert_table_matches_oracle(table.read().collect(), state, dyn)
    # redelivery after restart stays a no-op on a chained table
    q2 = stream_replay(
        spark, log_dir, table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        write_mode="delta",
        compact_chain_len=2,
    )
    q2.awaitTermination(120)
    assert table.last_lsn() == 3000
    assert_table_matches_oracle(table.read().collect(), state, dyn)
