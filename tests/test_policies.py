"""K3 column-policy merge + K7 predicate delete.

Reference semantics: hive_to_dwh/load.py:25-26 (touch last_seen only),
host_available_info_from_hive_to_dwh/main.py:181-183 (first_seen kept,
last_seen updated), es_deleting_old_writes/main.py:25-57 (delete-by-query
retention)."""

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.delete import delete_where
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.policies import MergePolicies
from etl_spark.cdc.runner import replay


def _log(spark, rows):
    df = spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, "
        "lang string, content string, ts string, extra map<string,string>, "
        "schema_change struct<kind:string,column:string,new_name:string,new_type:string>",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


ROWS = [
    (1, "I", "r1", "a", "c1", "py", "A1", "2024-01-01 00:00:00", None, None),
    (2, "I", "r1", "b", "c2", "py", "B1", "2024-01-02 00:00:00", None, None),
    # partial update: content NULL must keep A1, commit/lsn still advance
    (3, "U", "r1", "a", "c3", "py", None, "2024-01-03 00:00:00", None, None),
    (4, "U", "r1", "b", "c4", "py", "B2", "2024-01-04 00:00:00", None, None),
    # later full update replaces content again
    (5, "U", "r1", "a", "c5", "py", "A2", "2024-01-05 00:00:00", None, None),
    (6, "U", "r1", "a", "c6", "py", None, "2024-01-06 00:00:00", None, None),
]


@pytest.mark.parametrize("batch_size", [1, 3, 6])
def test_coalesce_policy_batch_invariant(spark, tmp_path, batch_size):
    t = SnapshotTable(spark, str(tmp_path / f"lake{batch_size}"), n_buckets=2)
    replay(spark, _log(spark, ROWS), t, batch_size=batch_size,
           policies=MergePolicies(coalesce_cols=("content",)))
    got = {(r["repo"], r["path"]): r.asDict() for r in t.read().collect()}
    a, b = got[("r1", "a")], got[("r1", "b")]
    assert a["content"] == "A2" and a["commit"] == "c6" and a["_last_lsn"] == 6
    assert b["content"] == "B2" and b["commit"] == "c4"
    # identity invariant recomputed over the COALESCED content
    import hashlib
    assert a["content_sha256"] == hashlib.sha256(b"A2").hexdigest()


DELETE_ROWS = [
    (1, "I", "r1", "a", "c1", "py", "A1", "2024-01-01 00:00:00", None, None),
    (2, "D", "r1", "a", None, None, None, "2024-01-02 00:00:00", None, None),
    # re-insert with NULL content: the pre-delete A1 must NOT resurrect
    (3, "I", "r1", "a", "c3", "py", None, "2024-01-03 00:00:00", None, None),
    # second key: delete then re-insert with a value after the delete
    (4, "I", "r1", "b", "c4", "py", "B1", "2024-01-04 00:00:00", None, None),
    (5, "D", "r1", "b", None, None, None, "2024-01-05 00:00:00", None, None),
    (6, "I", "r1", "b", "c6", "py", "B2", "2024-01-06 00:00:00", None, None),
]


@pytest.mark.parametrize("batch_size", [1, 3, 6])
def test_coalesce_policy_delete_does_not_resurrect(spark, tmp_path, batch_size):
    """A delete wipes row state: a value set BEFORE an in-batch delete
    (or in an earlier batch) must not leak into a post-delete re-insert
    through the coalesce fallback — result independent of where the
    batch boundary falls."""
    t = SnapshotTable(spark, str(tmp_path / f"ld{batch_size}"), n_buckets=2)
    replay(spark, _log(spark, DELETE_ROWS), t, batch_size=batch_size,
           policies=MergePolicies(coalesce_cols=("content",)))
    got = {(r["repo"], r["path"]): r.asDict() for r in t.read().collect()}
    assert got[("r1", "a")]["content"] is None, batch_size
    assert got[("r1", "b")]["content"] == "B2", batch_size


def test_coalesce_policy_duplicate_pointer_delivery(spark, tmp_path):
    """At-least-once delivery: the pointer event arriving twice must not
    fan the winner row out into duplicate table rows (the value fetch
    joins on (key, lsn) and collapses re-deliveries first)."""
    rows = ROWS + [ROWS[4]]  # lsn 5 (the content pointer for key a) twice
    t = SnapshotTable(spark, str(tmp_path / "lkdup"), n_buckets=2)
    replay(spark, _log(spark, rows), t, batch_size=7,
           policies=MergePolicies(coalesce_cols=("content",)))
    rows_out = t.read().collect()
    assert len(rows_out) == 2, [r.asDict() for r in rows_out]
    got = {(r["repo"], r["path"]): r.asDict() for r in rows_out}
    assert got[("r1", "a")]["content"] == "A2"


def test_merge_into_with_coalesce_policy(spark, tmp_path):
    """merge_into stamps ONE synthetic lsn across the whole source batch;
    with a coalesce policy the per-key value fetch must still resolve
    each key to ITS OWN row (key-aware join), never another key's value
    and never a row-count blow-up."""
    from etl_spark.cdc.merge_into import merge_into

    t = SnapshotTable(spark, str(tmp_path / "lkmi"), n_buckets=2)
    pol = MergePolicies(coalesce_cols=("content",))
    src1 = spark.createDataFrame(
        [("r1", "a", "c1", "py", "A1"), ("r1", "b", "c1", "py", "B1")],
        "repo string, path string, commit string, lang string, content string",
    )
    merge_into(spark, t, src1, policies=pol)
    # partial update: a's content NULL keeps A1; b gets a new value
    src2 = spark.createDataFrame(
        [("r1", "a", "c2", "py", None), ("r1", "b", "c2", "py", "B2")],
        "repo string, path string, commit string, lang string, content string",
    )
    merge_into(spark, t, src2, policies=pol)
    rows_out = t.read().collect()
    assert len(rows_out) == 2, [r.asDict() for r in rows_out]
    got = {(r["repo"], r["path"]): r.asDict() for r in rows_out}
    assert got[("r1", "a")]["content"] == "A1"
    assert got[("r1", "b")]["content"] == "B2"


@pytest.mark.parametrize("batch_size", [1, 2, 6])
def test_track_seen_batch_invariant(spark, tmp_path, batch_size):
    t = SnapshotTable(spark, str(tmp_path / f"lk{batch_size}"), n_buckets=2)
    replay(spark, _log(spark, ROWS), t, batch_size=batch_size,
           policies=MergePolicies(track_seen=True))
    got = {(r["repo"], r["path"]): r.asDict() for r in t.read().collect()}
    a = got[("r1", "a")]
    assert str(a["first_seen"]) == "2024-01-01 00:00:00"
    assert str(a["last_seen"]) == "2024-01-06 00:00:00"
    b = got[("r1", "b")]
    assert str(b["first_seen"]) == "2024-01-02 00:00:00"
    assert str(b["last_seen"]) == "2024-01-04 00:00:00"
    # policy columns live in the committed dyn schema
    assert ("first_seen", "timestamp") in t.dyn_schema()


def test_policy_rejects_protected_columns():
    with pytest.raises(ValueError, match="not allowed"):
        MergePolicies(coalesce_cols=("content_sha256",))


def test_delete_where_cow_scoped(spark, tmp_path):
    from etl_spark.cdc.gen import GenConfig, generate_events

    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=8)
    ev = generate_events(spark, GenConfig(n_events=3000, n_keys=200, seed=7))
    replay(spark, ev, t, batch_size=3000)
    files_before = dict(t.manifest()["files"])
    before = t.read().count()
    victims = t.read().where(F.col("_last_lsn") <= 2800).count()
    assert victims > 0

    m = delete_where(spark, t, F.col("_last_lsn") <= 2800)
    assert m["deleted"] == victims
    after = t.read()
    assert after.count() == before - victims
    assert after.where(F.col("_last_lsn") <= 2800).count() == 0
    # untouched buckets carried forward by reference, not rewritten
    files_after = t.manifest()["files"]
    carried = [b for b in files_before if files_after.get(b) == files_before[b]]
    rewritten = [b for b in files_after if files_after[b] != files_before.get(b)]
    assert m["buckets_touched"] == len(rewritten)
    assert len(carried) + len(rewritten) >= len(files_after)

    # idempotent: re-delete matches nothing, commits no new version
    v = t.version()
    m2 = delete_where(spark, t, F.col("_last_lsn") <= 2800)
    assert m2["deleted"] == 0 and t.version() == v

    # NULL predicate rows survive (SQL DELETE semantics)
    m3 = delete_where(spark, t, F.lit(None).cast("boolean"))
    assert m3["deleted"] == 0


def test_delete_where_then_resume_replay(spark, tmp_path):
    """A retention delete must not disturb the replay checkpoint: resuming
    after a delete applies only genuinely-new events."""
    from etl_spark.cdc.gen import GenConfig, generate_events

    t = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    ev = generate_events(spark, GenConfig(n_events=2000, n_keys=150, seed=9))
    replay(spark, ev, t, batch_size=1000, max_batches=1)
    ckpt = t.last_lsn()
    delete_where(spark, t, F.col("_last_lsn") <= 500)
    assert t.last_lsn() == ckpt  # delete is maintenance, not log progress
    ms = replay(spark, ev, t, batch_size=1000)
    assert sum(m.events_seen for m in ms) == 1000  # only the second half
