"""As-of join + sessionization operator tests: semantics vs a naive
in-memory reference, tie/no-match edges, and the plan-shape guarantees
(no range explosion, single key shuffle)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_spark.operators.temporal import asof_join, sessionize


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [("k1", 5), ("k1", 10), ("k1", 2), ("k2", 7), ("k3", 1)], "k string, t long"
    )
    right = spark.createDataFrame(
        [("k1", 3, "a"), ("k1", 5, "b"), ("k1", 9, "c"), ("k2", 8, "d")],
        "k string, t long, v string",
    )
    out = asof_join(left, right, on=["k"], left_order="t", right_order="t",
                    values={"v": "v", "ref_t": "t"})
    got = {(r["k"], r["t"]): (r["v"], r["ref_t"]) for r in out.collect()}
    assert got == {
        ("k1", 5): ("b", 5),     # tie: inclusive (ref.t <= probe.t)
        ("k1", 10): ("c", 9),
        ("k1", 2): (None, None),  # no earlier ref
        ("k2", 7): (None, None),  # k2's only ref is later
        ("k3", 1): (None, None),  # key absent from right
    }


def test_asof_matches_naive_reference(spark):
    import random

    rng = random.Random(7)
    lrows = [(f"k{rng.randrange(6)}", rng.randrange(1000)) for _ in range(300)]
    rrows = [
        (f"k{rng.randrange(6)}", t, i)
        for i, t in enumerate(rng.sample(range(1000), 200))
    ]
    left = spark.createDataFrame(lrows, "k string, t long")
    right = spark.createDataFrame(rrows, "k string, rt long, rid long")
    out = asof_join(left, right, ["k"], "t", "rt", {"rid": "rid"})

    def naive(k, t):
        cands = [(rt, rid) for (rk, rt, rid) in rrows if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    for r in out.collect():
        assert r["rid"] == naive(r["k"], r["t"]), (r["k"], r["t"])


def test_asof_plan_no_explosion(spark):
    left = spark.createDataFrame([("a", 1)], "k string, t long")
    right = spark.createDataFrame([("a", 1, 1.0)], "k string, t long, v double")
    plan = _plan(asof_join(left, right, ["k"], "t", "t", {"v": "v"}))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # one key shuffle feeding the window — not a join at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_sessionize_boundaries_and_ties(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        # key a: two sessions — gap of exactly 60s stays, 61s splits
        ("a", t0, 1),
        ("a", t0 + timedelta(seconds=60), 2),
        ("a", t0 + timedelta(seconds=121), 3),
        ("a", t0 + timedelta(seconds=150), 4),
        # key b: single event; shares a timestamp with key a's first
        ("b", t0, 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    out = sessionize(df, ["k"], "ts", gap_secs=60, tiebreak="id")
    got = sorted(
        (r["k"], r["session_id"], r["n_events"],
         (r["session_end"] - r["session_start"]).total_seconds())
        for r in out.collect()
    )
    assert got == [("a", 1, 2, 60.0), ("a", 2, 2, 29.0), ("b", 1, 1, 0.0)]


def test_sessionize_counts_partition_events(spark):
    """Sum of session n_events == input rows; session intervals per key
    don't overlap."""
    ev = spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.col("id") * 37 % 10000).alias("ts"),
        F.col("id"),
    )
    out = sessionize(ev, ["k"], "ts", gap_secs=120, tiebreak="id").collect()
    assert sum(r["n_events"] for r in out) == 500
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(
            (r["session_id"], r["session_start"], r["session_end"])
        )
    for k, ss in by_key.items():
        ss.sort()
        for (_, _, e1), (_, s2, _) in zip(ss, ss[1:]):
            assert e1 < s2, f"{k}: overlapping sessions"
