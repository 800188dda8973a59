#!/usr/bin/env bash
# Pinned multi-executor Spark standalone cluster on one box — the
# faithful single-machine model of "N executors": every worker JVM (and
# the executor it forks) is taskset-pinned to its OWN disjoint core set,
# so adding executors adds real, non-overlapping compute the way adding
# cluster nodes does. Used for the N -> 4N executor scaling evidence
# (BENCH/BASELINE.md) alongside the pinned local[N] protocol.
#
#   tools/standalone_cluster.sh start <n_workers> <cores_per_worker>
#   tools/standalone_cluster.sh stop
#
# Then submit with executor sizing, e.g. 2 executors x 4 cores:
#   SPARK_SUBMIT_ARGS="--master spark://127.0.0.1:7077 --executor-cores 4 \
#       --executor-memory 4g --conf spark.cores.max=8" \
#     tools/submit_replay.sh --events <log> --table <lake> \
#       --master spark://127.0.0.1:7077
#
# Measured on this sandbox (8M-event log, ~2 KB content): 2 executors x
# 4 pinned cores = 236k events/s — faster than one local[8] JVM on the
# same 8 cores (192k), because driver work and GC live in their own
# JVMs, exactly as on a real cluster.
set -euo pipefail

SPARK_HOME="$(python -c 'import pyspark, pathlib; print(pathlib.Path(pyspark.__file__).parent)')"
RUN_DIR="${SPARK_STANDALONE_DIR:-/tmp/etl_spark_cluster}"

start() {
    local n_workers="${1:?n_workers}" cores="${2:?cores_per_worker}"
    mkdir -p "$RUN_DIR/logs"
    # stale logs from a previous (larger) topology in the same RUN_DIR
    # would over-count registrations below
    rm -f "$RUN_DIR"/logs/master.log "$RUN_DIR"/logs/worker*.log
    # a stale master on 7077 silently absorbs the new workers AND offers
    # its own stale pinned workers to the next submit — refuse to start
    # into that contaminated state instead of measuring garbage
    if ss -tln 2>/dev/null | grep -q ':7077 '; then
        echo "port 7077 already bound (stale master?) — run stop/kill first" >&2
        exit 1
    fi
    nohup "$SPARK_HOME/bin/spark-class" org.apache.spark.deploy.master.Master \
        --host 127.0.0.1 --port 7077 --webui-port 8090 \
        > "$RUN_DIR/logs/master.log" 2>&1 &
    echo $! > "$RUN_DIR/master.pid"
    sleep 5
    for i in $(seq 0 $((n_workers - 1))); do
        local a=$((i * cores)) b=$((i * cores + cores - 1))
        SPARK_LOCAL_DIRS="$RUN_DIR/local_w$i" \
        nohup taskset -c "$a-$b" "$SPARK_HOME/bin/spark-class" \
            org.apache.spark.deploy.worker.Worker spark://127.0.0.1:7077 \
            --cores "$cores" --memory 6g --webui-port $((8100 + i)) \
            --work-dir "$RUN_DIR/w$i" \
            > "$RUN_DIR/logs/worker$i.log" 2>&1 &
        echo $! > "$RUN_DIR/w$i.pid"
    done
    # wait for every worker to register (fixed sleeps race under load);
    # grep must not abort the script under set -e when nothing matches yet
    local waited=0 reg=0
    while [ "$waited" -lt 150 ]; do
        reg=$( (grep -l "Successfully registered" "$RUN_DIR"/logs/worker*.log 2>/dev/null || true) | wc -l)
        [ "$reg" -eq "$n_workers" ] && break
        sleep 2; waited=$((waited + 2))
    done
    echo "master spark://127.0.0.1:7077, $n_workers workers x $cores pinned cores"
    echo "$reg"
    [ "$reg" -eq "$n_workers" ] || {
        echo "workers failed to register; log tails:" >&2
        tail -n 8 "$RUN_DIR"/logs/*.log >&2 2>/dev/null || true
        exit 1
    }
}

stop() {
    for f in "$RUN_DIR"/*.pid; do
        [ -f "$f" ] && kill "$(cat "$f")" 2>/dev/null || true
        rm -f "$f"
    done
    echo "stopped"
}

case "${1:-}" in
    start) shift; start "$@" ;;
    stop) stop ;;
    *) echo "usage: $0 start <n_workers> <cores_per_worker> | stop" >&2; exit 1 ;;
esac
