"""Skewed / sparse-update generator knobs (GenConfig zipf_s,
update_focus_keys, base_lsn) — the workload shapes the skewed bench mode
replays (bench.run_skewed). Pins:

- determinism: same (seed, knobs) -> same event set at any parallelism;
- zipf_s: repo popularity is rank-ordered (rank-0 repo hottest) with a
  long tail, and the op mix is unchanged by the key remap;
- update_focus_keys: every U/D event's key lands in the focus working
  set (at most N distinct keys), while the oracle semantics still hold
  end-to-end when the log replays onto a zipf base;
- base_lsn: lsns continue a prior log's range exactly.
"""

import pytest
from pyspark.sql import functions as F

from etl_spark.cdc.gen import GenConfig, generate_events, oracle_reduce
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.runner import replay

from .conftest import assert_table_matches_oracle

ZIPF = dict(n_events=4000, n_keys=2000, n_repos=40, zipf_s=1.1, seed=11)


def test_zipf_repo_skew_and_determinism(spark):
    cfg = GenConfig(**ZIPF)
    df = generate_events(spark, cfg)
    counts = {
        r["repo"]: r["c"]
        for r in df.groupBy("repo").agg(F.count("*").alias("c")).collect()
    }
    # rank-0 repo is the hottest and holds a zipf-sized share (~1/H(40,1.1)
    # ~= 24%; assert a loose band so the pin survives hash jitter)
    top = max(counts.values())
    assert counts["org0/repo0"] == top
    assert 0.15 * cfg.n_events < top < 0.40 * cfg.n_events
    # long tail: at least half the repos still get events
    assert len(counts) >= cfg.n_repos // 2

    # determinism under parallelism: same knobs, different partitioning
    a = df.orderBy("lsn").collect()
    b = (
        generate_events(spark, cfg).repartition(13).orderBy("lsn").collect()
    )
    assert a == b


def test_update_focus_confines_ud_keys(spark):
    focus = 50
    cfg = GenConfig(
        n_events=3000, n_keys=2000, n_repos=40, zipf_s=1.1,
        p_insert=0.0, p_update=0.8, update_focus_keys=focus, seed=7,
    )
    df = generate_events(spark, cfg)
    ops = {r["op"] for r in df.select("op").distinct().collect()}
    assert ops <= {"U", "D"}  # p_insert=0 -> no inserts
    n_keys_ud = (
        df.where(F.col("op").isin("U", "D"))
        .select("repo", "path").distinct().count()
    )
    assert 0 < n_keys_ud <= focus


def test_base_lsn_continues_range(spark):
    cfg = GenConfig(n_events=500, n_keys=100, seed=3, base_lsn=12345)
    row = generate_events(spark, cfg).agg(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
    ).collect()[0]
    assert (row["lo"], row["hi"]) == (12346, 12845)


def test_zipf_sparse_update_replay_matches_oracle(spark, tmp_path):
    """End-to-end: zipf insert base + focused U/D tail replayed through
    the engine equals the single-threaded oracle over the concatenated
    log — the skewed bench's exact workload shape at unit scale."""
    base_cfg = GenConfig(
        n_events=1500, n_keys=1500, n_repos=30, zipf_s=1.1,
        p_insert=1.0, p_update=0.0, seed=23,
    )
    upd_cfg = GenConfig(
        n_events=600, n_keys=1500, n_repos=30, zipf_s=1.1,
        p_insert=0.0, p_update=0.8, update_focus_keys=40,
        base_lsn=1500, seed=23,
    )
    base = generate_events(spark, base_cfg)
    upd = generate_events(spark, upd_cfg)
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay(spark, base.unionByName(upd), t, batch_size=700)
    state, dyn = oracle_reduce(base.collect() + upd.collect())
    assert_table_matches_oracle(t.read().collect(), state, dyn)


def test_key_offset_disjoint_keyspace(spark):
    """key_offset shifts the whole keyspace: an offset log shares NO
    (repo,path) key with the base log, and the derived paths interleave
    lexicographically (the append-ingest bench's adversarial property)."""
    base_cfg = GenConfig(n_events=400, n_keys=400, n_repos=20,
                         hot_frac=0.0, p_insert=1.0, p_update=0.0, seed=5)
    app_cfg = GenConfig(n_events=200, n_keys=400, n_repos=20,
                        hot_frac=0.0, p_insert=1.0, p_update=0.0,
                        key_offset=400, base_lsn=400, seed=5)
    base_keys = {
        (r["repo"], r["path"])
        for r in generate_events(spark, base_cfg)
        .select("repo", "path").distinct().collect()
    }
    app_keys = {
        (r["repo"], r["path"])
        for r in generate_events(spark, app_cfg)
        .select("repo", "path").distinct().collect()
    }
    assert base_keys and app_keys
    assert not (base_keys & app_keys)
    # lexicographic interleave: some offset path sorts strictly inside
    # the base paths' span (so range stats cannot exclude it)
    lo, hi = min(base_keys), max(base_keys)
    assert any(lo < k < hi for k in app_keys)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_key_offset_rejects_skewed_modes(spark):
    """key_offset assumes a zero-based key index: combined with zipf_s
    or the legacy hot-repo mode the rank->repo map would silently
    produce a wrong repo distribution — the generator must refuse."""
    with pytest.raises(ValueError, match="key_offset"):
        generate_events(spark, GenConfig(
            n_events=10, n_keys=10, zipf_s=1.1, hot_frac=0.0,
            key_offset=10))
    with pytest.raises(ValueError, match="key_offset"):
        generate_events(spark, GenConfig(
            n_events=10, n_keys=10, hot_frac=0.3, key_offset=10))
