"""Exactly-once metrics + per-partition lineage invariants (FIXTURES.md §6):
    events_seen == late + schema + data        (per batch)
    data == conflicts_resolved + winners
    winners == inserted + updated + deleted + delete_noop
    sum(events_seen) over batches == log length
    lineage row counts == rows written per touched bucket
"""

import pytest

from etl_spark.cdc.gen import GenConfig, SchemaEvent, generate_events
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.runner import replay


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    cfg = GenConfig(
        n_events=2000,
        n_keys=100,
        seed=31,
        dup_rate=0.1,
        schema_events=(SchemaEvent(lsn=777, kind="add", column="stars", new_type="int"),),
    )
    df = generate_events(spark, cfg).cache()
    n_rows = df.count()
    t = SnapshotTable(
        spark, str(tmp_path_factory.mktemp("lake")), n_buckets=4
    )
    ms = replay(spark, df, t, batch_size=600)
    yield df, n_rows, t, ms
    df.unpersist()


def test_per_batch_invariants(run):
    _, _, _, ms = run
    for m in ms:
        assert m.events_seen == m.late_events + m.schema_events + m.data_events
        assert m.data_events == m.conflicts_resolved + m.winners
        assert m.winners == m.inserted + m.updated + m.deleted + m.delete_noop
        assert m.wall_secs > 0


def test_log_fully_accounted(run):
    _, n_rows, _, ms = run
    assert sum(m.events_seen for m in ms) == n_rows
    assert sum(m.duplicate_deliveries for m in ms) > 0


def test_lineage_matches_table(spark, run):
    """Per-bucket lineage of the last commit == actual rows per bucket dir."""
    from pyspark.sql import functions as F

    _, _, t, ms = run
    last = ms[-1]
    assert last.lineage, "lineage recorded per touched bucket"
    total_lineage = sum(v["rows"] for v in last.lineage.values())
    assert total_lineage == last.rows_out
    # every lineage dir's files are live manifest refs for that bucket
    # (file-level CoW entries: freshly written refs + carried cold refs)
    manifest = t.manifest()
    for b, v in last.lineage.items():
        entry = manifest["files"][b]
        assert isinstance(entry, dict), entry
        new_refs = [r for r in entry["base"] if r[0].startswith(v["dir"])]
        assert new_refs, (b, entry, v)
        assert sum(r[1] for r in new_refs) == v["rows"]
        n = spark.read.parquet(f"{t.root}/{v['dir']}").count()
        assert n == v["rows"]


def test_metrics_persisted_with_commit(run):
    import json
    import os

    _, _, t, ms = run
    assert t.version() == len(ms)
    for v in range(1, t.version() + 1):
        p = os.path.join(t.root, "metrics", f"batch-v{v}.json")
        assert os.path.exists(p)
        d = json.load(open(p))
        assert d["events_seen"] == ms[v - 1].events_seen


def test_table_key_uniqueness(spark, run):
    from pyspark.sql import functions as F

    _, _, t, _ = run
    df = t.read()
    assert (
        df.groupBy("repo", "path").count().where(F.col("count") > 1).count() == 0
    )
