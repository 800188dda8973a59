"""Benchmark harness (driver contract).

Default mode: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": 0.1, "cdc_events_per_sec": N, ...}

Each query is materialized with a noop write (full execution, no
driver collect). The flagship number is the CDC engine itself: a
deterministic synthetic change log (etl_spark.cdc.gen, seed-fixed) is
replayed end-to-end (late-filter -> per-key max-LSN dedup -> CoW
MERGE -> snapshot commit) and reported as events/sec.

--scaling mode: runs the SAME replay job as two fresh subprocesses at
local[N] and local[4N] (N = SPARK_GRAFT_SCALE_N, default 8) on the
SAME pre-materialized log, verifies the two final table states are
identical (determinism under parallelism), computes scaling
efficiency = eps_4N / (4 * eps_N), and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# log size for the flagship replay measurement (JVM-side generator)
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))

# headline suite: one per load-bearing operator family (SURVEY.md §2)
HEADLINE = [
    "window_dedup",        # D2 per-key max-LSN window
    "cdc_merge_upsert",    # K1 upsert-as-query
    "group_max",           # A1 hash aggregate
    "union_distinct",      # A7
    "coalesce_merge",      # D2/F6 last-non-null
    "fourway_left_join",   # J1 dimension joins
    "topk_per_group",      # §2.8 ranking window
    "windowed_derivative", # S7/A5 time window + lag
    "identity_hash",       # F1/D1 sha256 invariant
    "dedup_exact",         # exact text dedup
    "minhash_lsh",         # MinHash+LSH near-dup
    "token_stats",         # tokenization
    "quality_score",       # quality scoring
    "lang_id",             # language id
    "ann_brute_topk",      # brute-force cosine top-k
    "ann_lsh_topk",        # LSH-bucketed ANN
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_headline() -> dict:
    from etl_spark.queries import QUERIES
    from etl_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _materialize(QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship: full CDC replay of a generated log, events/sec
    from etl_spark.cdc.gen import GenConfig, write_events
    from etl_spark.cdc.lake import SnapshotTable
    from etl_spark.cdc.runner import read_event_log, replay

    work = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        log_dir = os.path.join(work, "log")
        write_events(
            spark,
            GenConfig(n_events=N_EVENTS, n_keys=N_EVENTS // 8, n_repos=200,
                      hot_frac=0.3, hot_keys=N_EVENTS // 64),
            log_dir,
            n_files=CPUS,
        )
        # untimed warmup: a tiny replay into a throwaway table compiles the
        # merge plan / JIT-warms the JVM so the timed number is steady-state
        warm_log = os.path.join(work, "warm_log")
        write_events(spark, GenConfig(n_events=20_000, n_keys=2_000), warm_log, n_files=8)
        warm_table = SnapshotTable(spark, os.path.join(work, "warm_table"), n_buckets=8)
        replay(spark, read_event_log(spark, warm_log), warm_table, batch_size=10_000)

        table = SnapshotTable(spark, os.path.join(work, "table"), n_buckets=CPUS)
        t0 = time.time()
        replay(spark, read_event_log(spark, log_dir), table,
               batch_size=max(N_EVENTS // 4, 1))
        replay_sec = time.time() - t0
        timings["cdc_replay"] = round(replay_sec, 3)
        eps = N_EVENTS / replay_sec if replay_sec else 0.0
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline suite wall time (16 operator queries + full CDC replay)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "cdc_events": N_EVENTS,
        "cdc_events_per_sec": round(eps, 1),
        "cores": CPUS,
    }


# --------------------------------------------------------------------------
# scaling mode: same job, two parallelism levels, fresh JVM each
# --------------------------------------------------------------------------

def _run_replay_subprocess(log_dir: str, table_dir: str, cores: int,
                           batch_size: int) -> dict:
    """Run the replay CLI in a fresh process pinned to local[cores]."""
    env = dict(os.environ, SPARK_GRAFT_MASTER=f"local[{cores}]")
    cmd = [
        sys.executable, "-m", "etl_spark.cdc.runner",
        "--events", log_dir, "--table", table_dir,
        "--batch-size", str(batch_size),
        "--n-buckets", str(max(cores, 32)),
        "--master", f"local[{cores}]",
        "--warmup",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    if out.returncode != 0:
        raise RuntimeError(f"replay at local[{cores}] failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _table_state_hash(spark, root: str) -> str:
    """Order-insensitive hash of the final materialized table state."""
    from pyspark.sql import functions as F

    from etl_spark.cdc.lake import SnapshotTable

    df = SnapshotTable(spark, root).read()
    row = df.select(
        F.md5(F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
                                 for c in sorted(df.columns)])).alias("h")
    ).agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
          F.count("*").alias("n")).collect()[0]
    return f"{row['s']}/{row['n']}"


def run_scaling(n_small: int, n_events: int) -> dict:
    from etl_spark.cdc.gen import GenConfig, write_events
    from etl_spark.session import get_spark

    n_big = n_small * 4
    work = tempfile.mkdtemp(prefix="bench_scale_")
    spark = get_spark("bench-scale-gen", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        log_dir = os.path.join(work, "log")
        write_events(
            spark,
            GenConfig(n_events=n_events, n_keys=n_events // 8, n_repos=200,
                      hot_frac=0.3, hot_keys=n_events // 64),
            log_dir,
            n_files=max(CPUS, n_big),
        )
        results = {}
        tdirs = {}
        for cores in (n_small, n_big):
            tdirs[cores] = os.path.join(work, f"table_{cores}")
            results[cores] = _run_replay_subprocess(
                log_dir, tdirs[cores], cores, batch_size=max(n_events // 4, 1))
        h_small = _table_state_hash(spark, tdirs[n_small])
        h_big = _table_state_hash(spark, tdirs[n_big])
        eps_small = results[n_small]["events_per_sec"]
        eps_big = results[n_big]["events_per_sec"]
        eff = eps_big / (4.0 * eps_small) if eps_small else 0.0
        return {
            "n_events": n_events,
            "small": {"cores": n_small, **results[n_small]},
            "big": {"cores": n_big, **results[n_big]},
            "scaling_efficiency": round(eff, 3),
            "state_match": h_small == h_big,
            "state_hash": h_small,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def write_scaling_md(res: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    s, b = res["small"], res["big"]
    md = f"""# BENCH — measured baseline (CDC replay throughput + scaling)

North rule: change-events/sec applied end-to-end; scaling efficiency
>= 0.8 from N to 4N executors. Sandbox evidence: the SAME replay job
(read log -> late-filter -> salted dedup -> CoW MERGE -> snapshot
commit) run in two fresh JVMs at two parallelism levels on the SAME
pre-materialized {res['n_events']:,}-event log (seed-fixed generator,
30% hot-repo skew).

| parallelism | batches | events | wall sec | events/sec |
|---|---|---|---|---|
| local[{s['cores']}] (N) | {s['batches']} | {s['events']:,} | {s['secs']} | {s['events_per_sec']:,} |
| local[{b['cores']}] (4N) | {b['batches']} | {b['events']:,} | {b['secs']} | {b['events_per_sec']:,} |

**Scaling efficiency (eps_4N / (4 x eps_N)) = {res['scaling_efficiency']}**

Determinism under parallelism: final table state hash at local[{s['cores']}]
== local[{b['cores']}]: **{res['state_match']}** (`{res['state_hash']}`).
All conflict resolution is strictly LSN-ordered (window dedup), so the
materialized state is independent of task scheduling — SURVEY.md §7.4
hard-part 4.

Reproduce: `python bench.py --scaling` (env: SPARK_GRAFT_SCALE_N,
SPARK_GRAFT_SCALE_EVENTS).
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true",
                    help="two-parallelism scaling run -> BENCH/BASELINE.md")
    args = ap.parse_args()
    if args.scaling:
        res = run_scaling(
            int(os.environ.get("SPARK_GRAFT_SCALE_N", "8")),
            int(os.environ.get("SPARK_GRAFT_SCALE_EVENTS", "8000000")),
        )
        write_scaling_md(res)
        print(json.dumps(res))
    else:
        print(json.dumps(run_headline()))


if __name__ == "__main__":
    main()
