"""General-purpose MERGE INTO (snapshot-shaped sources): upsert/delete
semantics, duplicate-key contract, metrics, checkpoint interplay with
the log-replay path."""

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.merge_into import DuplicateSourceKeysError, merge_into


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def _state(t):
    return {
        (r["repo"], r["path"]): (r["commit"], r["lang"], r["content"])
        for r in t.read().collect()
    }


def test_upsert_then_delete(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    m1 = merge_into(spark, t, _df(spark, [
        ("r1", "a", "c1", "Python", "aa"),
        ("r1", "b", "c1", "go", "bb"),
        ("r2", "c", "c1", "C++", "cc"),
    ]))
    assert (m1.inserted, m1.updated, m1.deleted) == (3, 0, 0)
    # every source row rides ONE synthetic lsn: the duplicate-delivery
    # probe must group by (lsn, key-hash), not lsn alone, or a unique-
    # keyed multi-row merge reports rows-1 phantom duplicates and the
    # dup_free fast path (skip the full-content dedup shuffle) never
    # fires for merge_into/scd2 batches
    assert m1.duplicate_deliveries == 0
    assert _state(t) == {
        ("r1", "a"): ("c1", "py", "aa"),
        ("r1", "b"): ("c1", "go", "bb"),
        ("r2", "c"): ("c1", "cpp", "cc"),
    }

    # second merge: update one, insert one, delete one (flag column)
    src = spark.createDataFrame(
        [
            ("r1", "a", "c2", "Python", "aa2", False),
            ("r3", "d", "c2", "rs", "dd", False),
            ("r1", "b", None, None, None, True),
        ],
        "repo string, path string, commit string, lang string, content string, gone boolean",
    )
    m2 = merge_into(spark, t, src, delete_when=F.col("gone"))
    assert (m2.inserted, m2.updated, m2.deleted) == (1, 1, 1)
    assert _state(t) == {
        ("r1", "a"): ("c2", "py", "aa2"),
        ("r2", "c"): ("c1", "cpp", "cc"),
        ("r3", "d"): ("c2", "rs", "dd"),
    }
    # sha invariant maintained by the standard merge path
    for r in t.read().collect():
        assert r["content_sha256"] is not None


def test_duplicate_source_keys_reject_before_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    merge_into(spark, t, _df(spark, [("r1", "a", "c1", "py", "x")]))
    v = t.version()
    with pytest.raises(DuplicateSourceKeysError):
        merge_into(spark, t, _df(spark, [
            ("r1", "a", "c2", "py", "y"),
            ("r1", "a", "c3", "py", "z"),
        ]))
    # nothing committed, state untouched
    assert t.version() == v
    assert _state(t)[("r1", "a")] == ("c1", "py", "x")


def test_merge_into_interleaves_with_replay(spark, tmp_path):
    """A snapshot merge between replay batches advances the checkpoint
    by one synthetic LSN; subsequent log replay continues cleanly. The
    documented cost: the log event AT the consumed LSN (401 here) is
    shadowed — it drops as late (merge_into docstring)."""
    from etl_spark.cdc.gen import GenConfig, generate_events
    from etl_spark.cdc.runner import replay

    log = generate_events(spark, GenConfig(n_events=800, n_keys=60, seed=3))
    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, log.where(F.col("lsn") <= 400), t, batch_size=400)
    ck = t.last_lsn()
    merge_into(spark, t, _df(spark, [("zz", "top", "c9", "py", "manual")]))
    assert t.last_lsn() == ck + 1
    # replay resumes: events 401..800 are above the bumped checkpoint
    replay(spark, log, t, batch_size=400)
    assert t.last_lsn() == 800
    assert _state(t).get(("zz", "top")) == ("c9", "py", "manual")
