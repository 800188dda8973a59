"""Dead-letter quarantine: malformed events (unknown op, null key) are
diverted to a batch-scoped sink with reasons, never merged, never
silently dropped — and replay/resume semantics are unchanged."""

import os

from pyspark.sql import Row

from etl_spark.cdc.gen import GenConfig, generate_events, oracle_reduce
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.runner import replay
from etl_spark.cdc.schema import EVENT_SCHEMA

from .conftest import assert_table_matches_oracle


def _bad_rows(spark, base_lsn):
    rows = [
        # unknown op: would otherwise pack as op_code 0 (an insert)
        Row(lsn=base_lsn + 1, op="X", repo="r0", path="evil.py",
            commit="c", lang="py", content="boom", ts=None, extra=None,
            schema_change=None),
        # null path on a data op: would otherwise upsert a null key
        Row(lsn=base_lsn + 2, op="I", repo="r0", path=None,
            commit="c", lang="py", content="boom2", ts=None, extra=None,
            schema_change=None),
        Row(lsn=base_lsn + 3, op="Z", repo=None, path=None,
            commit=None, lang=None, content=None, ts=None, extra=None,
            schema_change=None),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_quarantine_diverts_and_state_matches_oracle(spark, tmp_path):
    cfg = GenConfig(n_events=2000, n_keys=100, seed=31)
    good = generate_events(spark, cfg)
    good_rows = good.collect()
    hi = max(r["lsn"] for r in good_rows)
    events = good.unionByName(_bad_rows(spark, hi))

    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    ms = replay(spark, events, table, batch_size=800)

    # final state == oracle over the GOOD rows only
    state, dyn = oracle_reduce(good_rows)
    assert_table_matches_oracle(table.read().collect(), state, dyn)

    # every malformed row is in the dead-letter sink with its reason
    qdir = os.path.join(table.root, "quarantine")
    q = spark.read.parquet(f"{qdir}/*").select("lsn", "op", "_reason")
    got = {r["lsn"]: r["_reason"] for r in q.collect()}
    assert got == {hi + 1: "bad_op", hi + 2: "null_key", hi + 3: "bad_op"}
    # the table-level reader sees the same rows (and typed columns)
    got2 = {r["lsn"]: r["_reason"] for r in table.read_quarantine().collect()}
    assert got2 == got

    # metrics: quarantined counted, accounting identity extended
    assert sum(m.quarantined for m in ms) == 3
    for m in ms:
        assert m.events_seen == (m.late_events + m.schema_events
                                 + m.data_events + m.quarantined)

    # resume is still a no-op and quarantine is not re-written
    before = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(qdir) for f in fs
    )
    ms2 = replay(spark, events, table, batch_size=800)
    assert ms2 == [] or all(m.noop for m in ms2) or sum(
        m.events_seen for m in ms2) == 0
    after = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(qdir) for f in fs
    )
    assert before == after


def test_clean_log_writes_no_quarantine(spark, tmp_path):
    cfg = GenConfig(n_events=1000, n_keys=80, seed=32)
    events = generate_events(spark, cfg)
    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    ms = replay(spark, events, table, batch_size=500)
    assert sum(m.quarantined for m in ms) == 0
    assert not os.path.isdir(os.path.join(table.root, "quarantine"))
    assert table.read_quarantine().count() == 0


def test_preflight_counts(spark):
    from etl_spark.cdc.runner import preflight_counts

    good = generate_events(spark, GenConfig(n_events=500, n_keys=50, seed=33))
    assert preflight_counts(good) == {
        "total": 500, "null_lsn": 0, "bad_op": 0, "null_key": 0}

    from pyspark.sql import types as T

    # a null lsn violates EVENT_SCHEMA's non-null contract — which is
    # exactly why only a pre-flight scan over a permissive read can
    # surface it (a conforming log can't contain one)
    permissive = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in EVENT_SCHEMA]
    )
    bad = good.unionByName(spark.createDataFrame([
        Row(lsn=None, op="I", repo="r", path="p", commit=None, lang=None,
            content=None, ts=None, extra=None, schema_change=None),
        Row(lsn=10**6, op="Q", repo="r", path=None, commit=None, lang=None,
            content=None, ts=None, extra=None, schema_change=None),
    ], permissive))
    pf = preflight_counts(bad)
    assert pf == {"total": 502, "null_lsn": 1, "bad_op": 1, "null_key": 1}


# --- property: random malformed injections never corrupt state ------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_bad_kinds = st.sampled_from(["bad_op", "null_repo", "null_path"])


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(
    kinds=st.lists(_bad_kinds, min_size=1, max_size=6),
    batch_size=st.sampled_from([300, 700, 1500]),
)
def test_quarantine_property(spark, tmp_path_factory, kinds, batch_size):
    """Any mix of malformed events interleaved into a valid log: final
    state equals the oracle over the valid events alone, every bad row
    is dead-lettered exactly once with the right reason, accounting
    stays exact — independent of batch boundaries."""
    cfg = GenConfig(n_events=1200, n_keys=80, seed=37)
    good = generate_events(spark, cfg)
    good_rows = good.collect()
    hi = max(r["lsn"] for r in good_rows)
    bad_rows = []
    want_reasons = {}
    for j, kind in enumerate(kinds):
        lsn = hi + 1 + j
        op = "X" if kind == "bad_op" else "I"
        repo = None if kind == "null_repo" else "r1"
        path = None if kind == "null_path" else "p1"
        bad_rows.append(Row(
            lsn=lsn, op=op, repo=repo, path=path, commit="c", lang="py",
            content="z", ts=None, extra=None, schema_change=None))
        want_reasons[lsn] = "bad_op" if kind == "bad_op" else "null_key"
    events = good.unionByName(spark.createDataFrame(bad_rows, EVENT_SCHEMA))

    table = SnapshotTable(
        spark, str(tmp_path_factory.mktemp("qprop") / "lake"), n_buckets=4)
    ms = replay(spark, events, table, batch_size=batch_size)

    state, dyn = oracle_reduce(good_rows)
    assert_table_matches_oracle(table.read().collect(), state, dyn)
    got = {r["lsn"]: r["_reason"] for r in table.read_quarantine().collect()}
    assert got == want_reasons
    assert sum(m.quarantined for m in ms) == len(kinds)
    for m in ms:
        assert m.events_seen == (m.late_events + m.schema_events
                                 + m.data_events + m.quarantined)
