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
