"""Snapshot time travel + incremental scan over the manifest history."""

import pytest

from etl_spark.cdc.gen import GenConfig, generate_events, oracle_reduce
from etl_spark.cdc.lake import SnapshotExpiredError, SnapshotTable
from etl_spark.cdc.runner import replay

from .conftest import assert_table_matches_oracle


@pytest.fixture(scope="module")
def versioned(spark, tmp_path_factory):
    cfg = GenConfig(n_events=3000, n_keys=150, seed=21)
    df = generate_events(spark, cfg).cache()
    rows = df.collect()
    table = SnapshotTable(
        spark, str(tmp_path_factory.mktemp("tt") / "lake"), n_buckets=4
    )
    replay(spark, df, table, batch_size=1000)  # versions 1..3
    yield table, rows
    df.unpersist()


def test_time_travel_matches_oracle_prefix(spark, versioned):
    """read(version=v) must equal the oracle state of the log PREFIX that
    version committed (manifest last_lsn) — for every retained version."""
    table, rows = versioned
    assert table.version() == 3
    for v in (1, 2, 3):
        cut = int(table.manifest_at(v)["last_lsn"])
        state, dyn = oracle_reduce([r for r in rows if r["lsn"] <= cut])
        assert_table_matches_oracle(
            table.read(version=v).collect(), state, dyn
        )


def test_incremental_scan_is_exact_upsert_diff(spark, versioned):
    """read_incremental(v1, v2) = rows of v2 whose _last_lsn lies in
    (lsn_v1, lsn_v2] — checked against the two oracle prefixes."""
    table, rows = versioned
    lo = int(table.manifest_at(1)["last_lsn"])
    hi = int(table.manifest_at(3)["last_lsn"])
    s3, _ = oracle_reduce([r for r in rows if r["lsn"] <= hi])
    want = {k: v for k, v in s3.items() if lo < v["_last_lsn"] <= hi}
    got = {(r["repo"], r["path"]): r for r in
           table.read_incremental(1, 3).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        assert got[k]["content_sha256"] == w["content_sha256"]
        assert got[k]["_last_lsn"] == w["_last_lsn"]


def test_incremental_from_zero_is_full_table(spark, versioned):
    table, _ = versioned
    assert (table.read_incremental(0).count()
            == table.read().count())


def test_expired_version_raises(spark, versioned, tmp_path):
    """After retention drops a version's files, time travel to it fails
    loudly instead of reading a partial table."""
    table, rows = versioned
    # fresh table so we don't disturb the shared fixture
    t2 = SnapshotTable(spark, str(tmp_path / "lake2"), n_buckets=4)
    ev = generate_events(spark, GenConfig(n_events=1200, n_keys=60, seed=5))
    replay(spark, ev, t2, batch_size=400)  # versions 1..3
    t2.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpiredError):
        t2.read(version=1)
    # the latest version still reads fine
    assert t2.read(version=t2.version()).count() == t2.read().count()


def test_lookup_reads_only_key_buckets(spark, versioned):
    """lookup() returns exactly the live rows for the requested keys and
    scans only the buckets those keys hash into (the bucket layout as a
    point-read index)."""
    table, rows = versioned
    from etl_spark.cdc.gen import oracle_reduce

    state, _ = oracle_reduce(rows)
    live = list(state)
    probe = [live[0], live[7], ("no/such", "key.py")]
    got = {(r["repo"], r["path"]): r for r in table.lookup(probe).collect()}
    assert set(got) == {live[0], live[7]}
    for k in (live[0], live[7]):
        assert got[k]["content_sha256"] == state[k]["content_sha256"]

    # plan touches a strict subset of bucket dirs + pushes the key filter
    df = table.lookup([live[0]])
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    scanned = set(re.findall(r"bucket=(\d+)", plan))
    assert len(scanned) <= 1 or "PushedFilters" in plan
    assert df.count() == 1

    # empty probe and >64-key (semi-join) path agree with the predicate path
    assert table.lookup([]).count() == 0
    many = live[:70] + [("ghost", f"g{i}") for i in range(5)]
    assert table.lookup(many).count() == 70


def test_rollback_restores_and_rereplay_converges(spark, tmp_path):
    """lake.rollback: metadata-only restore as a NEW commit. The
    restored read equals the target snapshot, last_lsn resets so
    re-replaying the unchanged log reproduces the pre-rollback state
    exactly, and history stays time-travelable."""
    from etl_spark.cdc.gen import GenConfig, generate_events
    from etl_spark.cdc.runner import replay

    log = generate_events(
        spark, GenConfig(n_events=3000, n_keys=120, seed=41)
    ).cache()
    t = SnapshotTable(spark, str(tmp_path / "rb"), n_buckets=4)
    replay(spark, log, t, batch_size=1000)
    assert t.version() == 3

    def state(version=None):
        return {
            (r["repo"], r["path"]): (r["content_sha256"], r["_last_lsn"])
            for r in t.read(version=version).collect()
        }

    final = state()
    at_v1 = state(version=1)
    m = t.rollback(1)
    assert m["version"] == 4 and m["last_lsn"] == 1000
    assert state() == at_v1            # restored by reference
    assert state(version=3) == final   # history not rewritten
    # the cursor reset means replaying the same log re-applies 1001..3000
    replay(spark, log, t, batch_size=1000)
    assert t.version() == 6
    assert state() == final            # rollback + re-replay = original
    log.unpersist()


def test_rollback_changelog_is_undo_and_mirror_converges(spark, tmp_path):
    """The change feed across a rollback commit is the exact undo of the
    rolled-back interval, so a replicate.sync mirror lands on the
    restored state with no special casing; delta-mode sources included."""
    from etl_spark.cdc.gen import GenConfig, generate_events
    from etl_spark.cdc.replicate import sync
    from etl_spark.cdc.runner import replay

    log = generate_events(
        spark, GenConfig(n_events=2000, n_keys=90, seed=43)
    ).cache()
    src = SnapshotTable(spark, str(tmp_path / "src"), n_buckets=4)
    replay(spark, log, src, batch_size=500, write_mode="delta")
    mirror = SnapshotTable(spark, str(tmp_path / "m"), n_buckets=4)
    sync(spark, src, mirror)

    def state(t):
        return {
            (r["repo"], r["path"]): r["content_sha256"]
            for r in t.read().collect()
        }

    assert state(mirror) == state(src)
    src.rollback(2)
    sync(spark, src, mirror)
    assert state(mirror) == state(src)  # mirror followed the undo feed
    log.unpersist()
