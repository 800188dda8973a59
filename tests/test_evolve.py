"""Schema-evolution suite: add / rename / type-widen detected from the log
and applied before merge (north_rule; FIXTURES.md §6), matching the oracle.
"""

import pytest

from etl_spark.cdc.evolve import SchemaEvolutionError, apply_to_dyn_schema, SchemaChange
from etl_spark.cdc.gen import GenConfig, SchemaEvent, generate_events, oracle_reduce
from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.runner import replay

from .conftest import assert_table_matches_oracle

SCHEMA_EVENTS = (
    SchemaEvent(lsn=300, kind="add", column="stars", new_type="int"),
    SchemaEvent(lsn=500, kind="add", column="license", new_type="string"),
    SchemaEvent(lsn=900, kind="rename", column="stars", new_name="rating"),
    SchemaEvent(lsn=1300, kind="widen", column="rating", new_type="bigint"),
)


@pytest.fixture(scope="module")
def evo_log(spark):
    cfg = GenConfig(
        n_events=2000, n_keys=90, seed=13, schema_events=SCHEMA_EVENTS
    )
    df = generate_events(spark, cfg).cache()
    state, dyn = oracle_reduce(df.collect())
    yield df, state, dyn
    df.unpersist()


def test_oracle_final_schema(evo_log):
    _, _, dyn = evo_log
    assert dyn == [("rating", "bigint"), ("license", "string")]


def test_evolution_replay_matches_oracle(spark, evo_log, tmp_path):
    """Schema events land mid-batch: remap + widen + backfill all correct."""
    df, state, dyn = evo_log
    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, table, batch_size=700)
    assert table.dyn_schema() == dyn
    assert_table_matches_oracle(table.read().collect(), state, dyn)
    names = [f.name for f in table.read().schema.fields]
    assert names[-2:] == ["rating", "license"]


def test_evolution_batch_boundary_invariance(spark, evo_log, tmp_path):
    """Splitting exactly AT a schema event lsn must not change the result."""
    df, state, dyn = evo_log
    for i, bs in enumerate([300, 900, 2000]):
        table = SnapshotTable(spark, str(tmp_path / f"lake{i}"), n_buckets=4)
        replay(spark, df, table, batch_size=bs)
        assert_table_matches_oracle(table.read().collect(), state, dyn)


def test_illegal_changes_rejected():
    with pytest.raises(SchemaEvolutionError, match="protected"):
        apply_to_dyn_schema([], [SchemaChange(1, "add", "content", None, "string")])
    with pytest.raises(SchemaEvolutionError, match="unknown column"):
        apply_to_dyn_schema([], [SchemaChange(1, "rename", "nope", "x", None)])
    with pytest.raises(SchemaEvolutionError, match="illegal widen"):
        apply_to_dyn_schema(
            [("n", "bigint")], [SchemaChange(1, "widen", "n", None, "int")]
        )
    with pytest.raises(SchemaEvolutionError, match="duplicate add"):
        apply_to_dyn_schema(
            [("n", "int")], [SchemaChange(1, "add", "n", None, "int")]
        )
    # engine-internal names: a dyn column named 'op' would make the merge
    # join's F.col('op') ambiguous and crash every later batch; '_bucket'
    # would be clobbered by the write partitioner; all '_' names reserved
    for bad in ("op", "lsn", "extra", "_bucket", "_anything"):
        with pytest.raises(SchemaEvolutionError, match="protected|reserved"):
            apply_to_dyn_schema([], [SchemaChange(1, "add", bad, None, "string")])
        with pytest.raises(SchemaEvolutionError, match="protected|reserved|unknown"):
            apply_to_dyn_schema(
                [("ok", "string")], [SchemaChange(1, "rename", "ok", bad, None)]
            )


def test_add_is_metadata_only_widen_rewrites(spark, tmp_path):
    """column-add must NOT rewrite untouched buckets (schema-on-read);
    rename/widen force the CoW migration."""
    cfg = GenConfig(n_events=400, n_keys=40, seed=3)
    df = generate_events(spark, cfg)
    table = SnapshotTable(spark, str(tmp_path / "lake"), n_buckets=4)
    replay(spark, df, table, batch_size=400)
    files_v1 = dict(table.manifest()["files"])

    import pyspark.sql.functions as F

    from etl_spark.cdc.merge import apply_batch
    from etl_spark.cdc.schema import EVENT_SCHEMA

    add_only = spark.createDataFrame(
        [(401, "S", None, None, None, None, None, None, None, ("add", "forks", None, "int"))],
        EVENT_SCHEMA,
    )
    m = apply_batch(spark, table, add_only, 2, 400, 401)
    assert not m.full_rewrite
    # every pre-existing bucket carried forward by reference
    assert all(table.manifest()["files"][b] == p for b, p in files_v1.items())
    assert table.dyn_schema() == [("forks", "int")]
    assert table.read().where(F.col("forks").isNotNull()).count() == 0

    widen = spark.createDataFrame(
        [(402, "S", None, None, None, None, None, None, None, ("widen", "forks", None, "bigint"))],
        EVENT_SCHEMA,
    )
    m2 = apply_batch(spark, table, widen, 3, 401, 402)
    assert m2.full_rewrite
    from etl_spark.cdc.lake import _chain

    assert all(
        p.startswith("data/v3/")
        for e in table.manifest()["files"].values() for p in _chain(e)
    )
