"""Physical-plan assertions: pin the properties the engine relies on at
100 TB (predicate pushdown, column pruning, broadcast joins, whole-stage
codegen) instead of hoping Catalyst did the right thing. A regression
here is a silent 10-100x slowdown at scale long before it is a wrong
answer."""

from pyspark.sql import functions as F

from etl_spark.plans.explain import (
    codegen_stage_count,
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)
from etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_filtered_scan_pushes_predicates(spark):
    df = QUERIES["filtered_scan"](spark, SF_DIR)
    assert has_pushed_filters(df, "IsNotNull(props)", "EqualTo(event_type,click)")
    # the scan must read exactly the referenced columns (projection +
    # filter columns), nothing else
    assert read_schema_columns(df) == {
        "event_id", "user_id", "value", "ts", "event_type", "props",
    }


def test_identity_hash_prunes_columns(spark):
    df = QUERIES["identity_hash"](spark, SF_DIR)
    assert read_schema_columns(df) == {"doc_id", "text"}


def test_dim_join_broadcasts(spark):
    assert uses_broadcast_join(QUERIES["dim_join_lang_norm"](spark, SF_DIR))


def test_group_max_partial_agg(spark):
    """Two-phase aggregation: map-side partial combine before the
    exchange. (Codegen spans are not visible in an unexecuted AQE plan,
    so assert the aggregate shape instead.)"""
    df = QUERIES["group_max"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "partial_max" in plan


def test_window_dedup_is_aggregate_not_window(spark):
    """The per-key max-LSN dedup must plan as the slim shape: a
    HashAggregate over a single-long buffer (map-side partial combine —
    the two-phase 'salted' reduce for free) + a semi-join back for the
    wide columns. Neither a sort-window (shuffles and sorts EVERY event
    of a hot key into one task) nor a SortAggregate over full-row
    structs (per-partition sort of all events, wide) is acceptable."""
    df = QUERIES["window_dedup"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "partial_max" in plan
    assert "Window" not in plan


def test_slim_dedup_is_hash_aggregate(spark, tmp_path):
    """The engine's conflict-resolution aggregate (key -> packed
    lsn<<2|op) must stay a HashAggregate over a single long buffer —
    this one runs over the FULL batch, where SortAggregate would sort
    every partition."""
    from etl_spark.cdc.gen import GenConfig, write_events
    from etl_spark.cdc.runner import read_event_log
    from etl_spark.cdc.schema import KEY_COLS

    log = str(tmp_path / "log")
    write_events(spark, GenConfig(n_events=2000, n_keys=100), log, n_files=4)
    data = read_event_log(spark, log).where(F.col("op") != "S")
    op_code = F.when(F.col("op") == "D", 2).when(F.col("op") == "U", 1).otherwise(0)
    slim = (
        data.select(*KEY_COLS, (F.shiftleft(F.col("lsn"), 2) + op_code).alias("_p"))
        .groupBy(*KEY_COLS)
        .agg(F.max("_p").alias("_p"))
    )
    plan = formatted_plan(slim)
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    assert "partial_max" in plan
    assert "content" not in read_schema_columns(slim)


def test_coalesce_merge_has_bounded_buffers(spark):
    """last-non-null-per-key must use max_by (single-value buffer,
    HashAggregate, map-side partial combine) — not collect_list of a
    key's whole history (executor OOM on a hot key at scale)."""
    df = QUERIES["coalesce_merge"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "collect_list" not in plan
    assert "HashAggregate" in plan and "SortAggregate" not in plan
    assert "partial_max" in plan


def test_topk_buffers_are_partition_bounded(spark):
    """The per-probe top-k must be the two-phase shape: local phase
    groups by (probe, spark_partition_id) so no aggregation buffer ever
    exceeds one input partition, merge phase only sees <=k-element
    arrays. A single collect_list per probe would buffer the whole
    corpus per probe."""
    for q in ("ann_brute_topk", "ann_lsh_topk"):
        plan = formatted_plan(QUERIES[q](spark, SF_DIR))
        assert "SPARK_PARTITION_ID" in plan.upper(), q
        # both phases slice to k before anything leaves the aggregate
        assert plan.count("slice") >= 2, q


def test_replay_batch_scan_prunes_lsn_range(spark, tmp_path):
    """The per-batch lsn BETWEEN filter must reach the parquet scan, so
    row-group min/max stats skip everything outside the batch."""
    from etl_spark.cdc.gen import GenConfig, write_events
    from etl_spark.cdc.runner import read_event_log

    log = str(tmp_path / "log")
    write_events(spark, GenConfig(n_events=2000, n_keys=100), log, n_files=4)
    ev = read_event_log(spark, log)
    batch = ev.where((F.col("lsn") > 500) & (F.col("lsn") <= 1000))
    assert has_pushed_filters(batch, "GreaterThan(lsn,500)", "LessThanOrEqual(lsn,1000)")


def test_counting_aggregate_prunes_content(spark, tmp_path):
    """The batch counting aggregate must not read the ~2KB content column
    (it only needs lsn/op/repo/path/schema_change)."""
    from etl_spark.cdc.dedup import bucket_expr
    from etl_spark.cdc.gen import GenConfig, write_events
    from etl_spark.cdc.runner import read_event_log
    from etl_spark.cdc.schema import KEY_COLS

    log = str(tmp_path / "log")
    write_events(spark, GenConfig(n_events=2000, n_keys=100), log, n_files=4)
    batch = read_event_log(spark, log).where(F.col("lsn") <= 1000)
    live = F.col("lsn") > 0
    is_data = live & (F.col("op") != "S")
    agg = batch.agg(
        F.count("*"),
        F.count_distinct(F.when(live, F.col("lsn"))),
        F.collect_set(F.when(is_data, bucket_expr(8))),
        F.count_distinct(*[F.when(is_data, F.col(c)) for c in KEY_COLS]),
        F.collect_list(F.when(live & (F.col("op") == "S"), F.struct("lsn", "schema_change"))),
    )
    assert "content" not in read_schema_columns(agg)


def test_cidr_join_is_broadcast_equi_join(spark):
    """J8 must plan as a broadcast EQUI-join on (plen, prefix) — never a
    BroadcastNestedLoopJoin against the networks table (the O(n*m) theta
    join the radix-tree reference avoids); the <=33-row plen fan-out is
    the only NLJ allowed."""
    plan = formatted_plan(QUERIES["cidr_longest_match"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan and "SortAggregate" not in plan


def test_minhash_band_shuffle_is_slim(spark):
    """The LSH band self-join must shuffle only fixed-width columns
    (id, band, bh) — the n_hashes-long signature array attaches AFTER
    pair dedup via id equi-joins, never riding the band exchange.
    Broadcast is disabled so the join plans the way it would at corpus
    scale (shuffle join with a real band exchange); and the signature
    aggregation subtree must be computed ONCE (ReusedExchange), not
    re-scanned per self-join side / attach join."""
    from etl_spark.plans.explain import exchange_inputs

    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = QUERIES["minhash_lsh"](spark, SF_DIR)
        band_exchanges = [
            (args, cols) for args, cols in exchange_inputs(df)
            if {"band", "bh"} & cols
        ]
        assert band_exchanges, "expected a band-keyed exchange in the plan"
        for args, cols in band_exchanges:
            assert cols <= {"id", "band", "bh"}, (
                f"wide column crosses the band exchange: {cols}")
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "ReusedExchange" in executed, (
            "signature subtree must be shared across self-join sides")
    finally:
        spark.conf.set(key, old)


def test_simhash_chunk_shuffle_is_slim(spark):
    """Same property for SimHash banding: every (band, chunk)-keyed
    exchange carries only fixed-width columns — the text column rides
    only the fan_out repartition of the input scan itself, never a
    banding shuffle."""
    from etl_spark.plans.explain import exchange_inputs

    df = QUERIES["simhash"](spark, SF_DIR)
    for args, cols in exchange_inputs(df):
        if "band" in cols or "chunk" in cols:
            assert "text" not in cols and "toks" not in cols, (
                f"wide column crosses a banding exchange: {cols}")


def test_no_plan_hazards_across_query_library(spark):
    """Sweep: no query's physical plan may contain a SortAggregate, a
    CartesianProduct, or row-at-a-time Python — and non-equi nested-loop
    joins are allowed only where the algorithm IS a bounded fan-out
    (brute-force ANN's corpus x probes; CIDR's <=33-row plen dimension).
    Pure plan construction only: queries that materialize side effects
    (codec round trips, replay-backed snapshots, mutating ops) are
    exercised elsewhere and skipped here."""
    from etl_spark.plans.explain import executed_plan_string

    skip = {
        # write/replay side effects on call — covered by their own tests
        "cdc_replay_snapshot", "cdc_merge_upsert", "merge_into_snapshot",
        "predicate_delete", "touch_first_last_seen", "coalesce_content_merge",
        "time_travel_incremental", "changelog_feed", "mirror_sync",
        "scd2_history", "csv_roundtrip", "rpsl_roundtrip",
        # rollback_restore needs >=3 committed versions (the sf0.001
        # sweep log replays as ONE batch); its plan is a plain snapshot
        # read and the op is oracle-checked at sf0.01
        "rollback_restore",
    }
    bnlj_ok = {"ann_brute_topk", "cidr_longest_match", "cidr6_longest_match"}
    bad = {}
    for name, fn in sorted(QUERIES.items()):
        if name in skip:
            continue
        plan = executed_plan_string(fn(spark, SF_DIR))
        flags = [
            t for t in ("SortAggregate", "CartesianProduct", "BatchEvalPython")
            if t in plan
        ]
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            flags.append("BroadcastNestedLoopJoin")
        if flags:
            bad[name] = flags
    assert not bad, f"plan hazards: {bad}"
