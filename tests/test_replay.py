"""Replay-equivalence: full distributed replay == single-threaded oracle.

The core correctness gate (FIXTURES.md §6, north_rule): after replaying
the whole CDC log in micro-batches, the materialized lake table must
equal the oracle reducer's final state per key, under per-row
content_sha256 equality.
"""

import pytest

from etl_spark.cdc.gen import GenConfig, generate_events, oracle_reduce
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.runner import replay

from .conftest import assert_table_matches_oracle


@pytest.fixture(scope="module")
def small_log(spark):
    cfg = GenConfig(n_events=4000, n_keys=180, hot_frac=0.35, hot_keys=12, seed=7)
    df = generate_events(spark, cfg).cache()
    rows = df.collect()
    state, dyn = oracle_reduce(rows)
    yield cfg, df, state, dyn
    df.unpersist()


def test_generator_deterministic(spark, small_log):
    cfg, df, _, _ = small_log
    again = generate_events(spark, cfg)
    a = sorted(map(tuple, df.drop("ts").collect()))
    b = sorted(map(tuple, again.drop("ts").collect()))
    assert a == b


def test_full_replay_matches_oracle(spark, small_log, tmp_path):
    cfg, df, state, dyn = small_log
    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=8)
    metrics = replay(spark, df, table, batch_size=900)
    assert table.version() == len(metrics) == 5  # ceil(4000/900)
    rows = table.read().collect()
    assert_table_matches_oracle(rows, state, dyn)


def test_single_batch_replay_matches_oracle(spark, small_log, tmp_path):
    _, df, state, dyn = small_log
    table = SnapshotTable(spark, str(tmp_path / "lake1"), n_buckets=8)
    replay(spark, df, table, batch_size=10_000)
    assert_table_matches_oracle(table.read().collect(), state, dyn)


def test_batch_size_invariance(spark, small_log, tmp_path):
    """Different micro-batch splits must yield identical final state."""
    _, df, state, dyn = small_log
    for i, bs in enumerate([150, 1333]):
        table = SnapshotTable(spark, str(tmp_path / f"lake_bs{i}"), n_buckets=8)
        replay(spark, df, table, batch_size=bs)
        assert_table_matches_oracle(table.read().collect(), state, dyn)


def test_bucket_count_and_salt_invariance(spark, small_log, tmp_path):
    """Salted vs plain dedup and any bucket count: same final state
    (determinism under parallelism, SURVEY.md §7.4.4)."""
    _, df, state, dyn = small_log
    for nb, salted in [(2, False), (17, True)]:
        table = SnapshotTable(spark, str(tmp_path / f"lake_nb{nb}"), n_buckets=nb)
        replay(spark, df, table, batch_size=1000, salted_dedup=salted)
        assert_table_matches_oracle(table.read().collect(), state, dyn)


def test_duplicate_deliveries_are_idempotent(spark, tmp_path):
    cfg = GenConfig(n_events=1500, n_keys=80, seed=11, dup_rate=0.2)
    df = generate_events(spark, cfg)
    state, dyn = oracle_reduce(df.collect())
    table = SnapshotTable(spark, str(tmp_path / "lake_dup"), n_buckets=4)
    metrics = replay(spark, df, table, batch_size=400)
    assert_table_matches_oracle(table.read().collect(), state, dyn)
    assert sum(m.duplicate_deliveries for m in metrics) > 0
