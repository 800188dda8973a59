"""Idempotency / resume suite (FIXTURES.md §6): kill-after-batch-k resume
equals an uninterrupted run; re-applying a batch is a no-op; a crash
between data write and manifest publish rolls back cleanly.
"""

import os
import shutil

import pytest

from etl_spark.cdc.gen import GenConfig, generate_events, oracle_reduce
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.merge import apply_batch
from etl_spark.cdc.runner import replay

from .conftest import assert_table_matches_oracle


@pytest.fixture(scope="module")
def log(spark):
    cfg = GenConfig(n_events=1500, n_keys=70, seed=23)
    df = generate_events(spark, cfg).cache()
    state, dyn = oracle_reduce(df.collect())
    yield df, state, dyn
    df.unpersist()


def test_kill_and_resume_equals_uninterrupted(spark, log, tmp_path):
    df, state, dyn = log
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, t, batch_size=400, max_batches=2)  # "crash" after k=2
    assert t.last_lsn() == 800
    replay(spark, df, t, batch_size=400)  # resume
    assert_table_matches_oracle(t.read().collect(), state, dyn)


def test_reapply_batch_is_noop(spark, log, tmp_path):
    df, state, dyn = log
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, t, batch_size=500)
    v = t.version()
    m = apply_batch(spark, t, df.where("lsn <= 500"), 99, 0, 500)
    assert t.version() == v, "no new snapshot for a replayed batch"
    assert m.events_seen == 0 and m.winners == 0
    assert_table_matches_oracle(t.read().collect(), state, dyn)


def test_crash_between_write_and_publish(spark, log, tmp_path):
    """Orphan data dir from a crashed commit must be invisible and the
    re-run must land the same state (atomic _LATEST swap)."""
    df, state, dyn = log
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, t, batch_size=800, max_batches=1)

    # simulate: batch 2 wrote its data dir, crashed before manifest/_LATEST
    orphan = t.new_data_dir(2)
    os.makedirs(os.path.join(orphan, "_bucket=0"), exist_ok=True)
    with open(os.path.join(orphan, "_bucket=0", "garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert t.version() == 1  # pointer untouched

    replay(spark, df, t, batch_size=800)  # re-runs batch 2, overwrites orphan
    assert t.version() == 2
    assert_table_matches_oracle(t.read().collect(), state, dyn)


def test_partial_late_batch_applies_only_new_lsns(spark, log, tmp_path):
    """A batch overlapping the checkpoint applies only lsn > ckpt; the
    overlap is counted late and dropped (D5 grace semantics)."""
    df, state, dyn = log
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    apply_batch(spark, t, df.where("lsn <= 1000"), 1, 0, 1000)
    m = apply_batch(spark, t, df.where("lsn > 500"), 2, 500, 1500)
    assert m.late_events == 500
    assert m.events_seen == 1000
    assert_table_matches_oracle(t.read().collect(), state, dyn)


def test_expire_snapshots_keeps_live_data(spark, log, tmp_path):
    df, state, dyn = log
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, t, batch_size=300)
    assert t.version() == 5
    removed = t.expire_snapshots(keep_last=2)
    assert removed, "old unreferenced version dirs should be dropped"
    assert_table_matches_oracle(t.read().collect(), state, dyn)
