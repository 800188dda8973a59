"""Stateful streaming sessionization (applyInPandasWithState):
sessions close either by a later event proving the gap, or by
event-time timeout once the watermark passes session_end + gap; open
sessions are never emitted early."""

import os
from datetime import datetime, timedelta

from etl_spark.cdc.schema import EVENT_SCHEMA
from etl_spark.streaming.sessions import stream_sessionize

T0 = datetime(2024, 3, 1)


def _write_file(spark, log_dir: str, idx: int, rows):
    """One log file of (repo, ts_offset_secs) data events; mtime ascends
    with idx so the file source delivers in order."""
    full = [
        (idx * 1000 + i, "U", repo, f"p{i}", "c", "py", "x",
         T0 + timedelta(seconds=off), None, None)
        for i, (repo, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(full, EVENT_SCHEMA).coalesce(1)
    df.write.mode("append").parquet(log_dir)
    base = 1_700_000_000
    for p in os.listdir(log_dir):
        if p.startswith("part-"):
            mt = os.path.getmtime(os.path.join(log_dir, p))
            if mt > base + 100:  # fresh file: pin after the existing ones
                os.utime(os.path.join(log_dir, p), (base + idx, base + idx))


def test_stream_sessions_close_by_data_and_timeout(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    # gap 30s. r0: [0,10] then [100,110]; r1: [5,5] then [200,200];
    # rf: [10000] closed by its own later event, [20000] stays open.
    _write_file(spark, log_dir, 0, [("r0", 0), ("r0", 10), ("r1", 5)])
    _write_file(spark, log_dir, 1, [("r0", 100), ("r0", 110), ("r1", 200)])
    _write_file(spark, log_dir, 2, [("rf", 10000)])
    _write_file(spark, log_dir, 3, [("rf", 20000)])

    q = (
        stream_sessionize(
            spark, log_dir, gap_secs=30, key_col="repo",
            watermark="1 second", max_files_per_trigger=1,
        )
        .writeStream.format("memory")
        .queryName("sessions_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["repo"], (r["session_start"] - T0).total_seconds(),
         (r["session_end"] - T0).total_seconds(), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_t").collect()
    }
    assert got == {
        ("r0", 0.0, 10.0, 2),      # closed by r0@100 (data)
        ("r0", 100.0, 110.0, 2),   # closed by timeout (watermark via rf)
        ("r1", 5.0, 5.0, 1),       # closed by r1@200 (data)
        ("r1", 200.0, 200.0, 1),   # closed by timeout
        ("rf", 10000.0, 10000.0, 1),  # closed by rf@20000 (data)
        # rf@20000 stays open: watermark never passes 20000+gap
    }


def test_stream_sessions_match_batch_operator(spark, tmp_path):
    """Streamed closed sessions == the batch sessionize() result for
    every session the watermark finalized."""
    import random

    from pyspark.sql import functions as F

    from etl_spark.operators.temporal import sessionize

    rng = random.Random(13)
    rows, t = [], 0.0
    for _ in range(120):
        t += rng.choice([1, 5, 20, 90])  # gaps straddle the 30s threshold
        rows.append((f"r{rng.randrange(4)}", t))
    flush_t = t + 10_000
    log_dir = str(tmp_path / "log")
    third = len(rows) // 3
    _write_file(spark, log_dir, 0, rows[:third])
    _write_file(spark, log_dir, 1, rows[third: 2 * third])
    _write_file(spark, log_dir, 2, rows[2 * third:])
    _write_file(spark, log_dir, 3, [("rflush", flush_t)])

    q = (
        stream_sessionize(spark, log_dir, gap_secs=30, key_col="repo",
                          watermark="1 second", max_files_per_trigger=1)
        .writeStream.format("memory").queryName("sessions_m")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["repo"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_m").collect()
    }

    ev = spark.read.schema(EVENT_SCHEMA).parquet(log_dir)
    batch = sessionize(ev.where(F.col("repo") != "rflush"), ["repo"], "ts",
                       gap_secs=30, tiebreak="lsn")
    expected = {
        (r["repo"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    # every streamed session is a true batch session, and only sessions
    # the final watermark could not yet finalize may be missing
    assert streamed <= expected
    final_wm = T0 + timedelta(seconds=flush_t - 1)
    missing = expected - streamed
    for _, _, end, _ in missing:
        assert end + timedelta(seconds=30) > final_wm, (
            f"finalizable session not emitted: {missing}"
        )
