"""Changelog-driven downstream replication: a mirror table stays equal
to the source by consuming per-commit diffs, never a snapshot copy."""

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.delete import delete_where
from etl_spark.cdc.gen import GenConfig, generate_events
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.replicate import sync
from etl_spark.cdc.runner import replay


def _rows(t):
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"], r["content_sha256"])
        for r in t.read().collect()
    }


@pytest.fixture(scope="module")
def log(spark):
    df = generate_events(
        spark, GenConfig(n_events=2400, n_keys=130, hot_frac=0.3, hot_keys=8, seed=41)
    ).cache()
    yield df
    df.unpersist()


def test_incremental_sync_tracks_source(spark, log, tmp_path):
    src = SnapshotTable(spark, str(tmp_path / "src"), n_buckets=8)
    mir = SnapshotTable(spark, str(tmp_path / "mir"), n_buckets=4)  # layouts differ

    # stage 1: half the log, then catch the mirror up
    replay(spark, log.where(F.col("lsn") <= 1200), src, batch_size=400)
    ms = sync(spark, src, mir)
    assert len(ms) == src.version() and mir.last_lsn() == src.version()
    assert _rows(mir) == _rows(src)

    # stage 2: rest of the log + a retention delete on the source
    replay(spark, log, src, batch_size=400)
    delete_where(spark, src, F.col("_last_lsn") <= 600)
    ms = sync(spark, src, mir)
    assert ms and mir.last_lsn() == src.version()
    assert _rows(mir) == _rows(src)

    # caught up: sync is a no-op; re-sync after crash is idempotent
    assert sync(spark, src, mir) == []


def test_sync_transfer_is_o_changes(spark, log, tmp_path):
    """The batch a sync applies contains only changed keys — not the
    table (metrics prove O(changes) transfer)."""
    src = SnapshotTable(spark, str(tmp_path / "src"), n_buckets=8)
    mir = SnapshotTable(spark, str(tmp_path / "mir"), n_buckets=8)
    replay(spark, log, src, batch_size=2400)  # one commit with everything
    sync(spark, src, mir)
    n_keys_total = src.read().count()

    # one more tiny source commit: touch a handful of keys
    extra = log.where(F.col("lsn") > 2390).select(
        (F.col("lsn") + 10).alias("lsn"), "op", "repo", "path", "commit",
        "lang", "content", "ts", "extra", "schema_change",
    )
    n_extra_keys = extra.select("repo", "path").distinct().count()
    replay(spark, extra, src, batch_size=100)
    ms = sync(spark, src, mir)
    assert _rows(mir) == _rows(src)
    assert sum(m.events_seen for m in ms) <= n_extra_keys < n_keys_total
