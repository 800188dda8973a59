"""Replay driver: micro-batch loop over LSN ranges + spark-submit entrypoint.

The reference's "streaming" is Airflow cron windows over ``change_time``
(SURVEY.md §2.9); deterministic replay of an ordered log is a plain loop
over LSN chunks — each iteration is one exactly-once ``apply_batch``.
Resume: the checkpoint (last applied lsn) is read back from the table
manifest, so killing the driver between batches and re-running continues
from the next unapplied lsn; re-running an applied batch is a no-op.

Cluster launch (north_rule):
    spark-submit --py-files etl_spark.zip -m etl_spark.cdc.runner \\
        --events <log dir> --table <lake root> --batch-size 1000000

The event-log parquet is written repartitionByRange(lsn) (gen.py), so
each batch's ``lsn BETWEEN a AND b`` filter prunes row groups via parquet
min/max stats — a batch scan touches only its slice of the log.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import SnapshotTable
from .merge import apply_batch
from .metrics import BatchMetrics
from .policies import NO_POLICIES, MergePolicies
from .schema import EVENT_SCHEMA


def read_event_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(EVENT_SCHEMA).parquet(path)


def replay(
    spark: SparkSession,
    events: DataFrame,
    table: SnapshotTable,
    batch_size: int = 1_000_000,
    max_batches: int | None = None,
    salted_dedup: bool = False,
    use_arrow_udfs: bool = False,
    log: bool = False,
    policies: MergePolicies = NO_POLICIES,
) -> list[BatchMetrics]:
    """Replay the whole log (or the next ``max_batches``) into the table."""
    bounds = events.agg(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
    ).collect()[0]
    if bounds["hi"] is None:
        return []
    hi = int(bounds["hi"])

    out: list[BatchMetrics] = []
    batch_id = table.version()
    cursor = table.last_lsn()
    while cursor < hi:
        lsn_from, lsn_to = cursor, min(cursor + batch_size, hi)
        batch = events.where(
            (F.col("lsn") > lsn_from) & (F.col("lsn") <= lsn_to)
        )
        batch_id += 1
        bm = apply_batch(
            spark, table, batch, batch_id, lsn_from, lsn_to,
            salted_dedup=salted_dedup, use_arrow_udfs=use_arrow_udfs,
            policies=policies,
        )
        out.append(bm)
        if log:
            print(json.dumps(bm.to_dict()), file=sys.stderr)
        cursor = table.last_lsn()
        if max_batches and len(out) >= max_batches:
            break
    return out


def main(argv: list[str] | None = None) -> None:
    from ..session import get_spark

    ap = argparse.ArgumentParser(description="etl_spark CDC replay")
    ap.add_argument("--events", required=True, help="event-log parquet dir")
    ap.add_argument("--table", required=True, help="lake table root")
    ap.add_argument("--batch-size", type=int, default=1_000_000)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--salted-dedup", action="store_true",
                    help="explicit two-phase (key,salt)->key dedup; default is "
                         "groupBy max_by, whose map-side partial aggregation is "
                         "the same two-phase reduce without the second shuffle")
    ap.add_argument("--arrow-udfs", action="store_true",
                    help="run sha256/lang-norm as Arrow pandas UDFs instead of "
                         "the (faster, equal-output) JVM-native expressions")
    ap.add_argument("--warmup", action="store_true",
                    help="run a tiny throwaway replay first so the reported "
                         "throughput is steady-state (JIT/codegen warm)")
    args = ap.parse_args(argv)

    spark = get_spark("etl_spark-replay", master=args.master)
    if args.warmup:
        import tempfile

        from .gen import GenConfig, generate_events

        wtab = SnapshotTable(
            spark, tempfile.mkdtemp(prefix="replay_warm_"), n_buckets=8
        )
        replay(spark, generate_events(spark, GenConfig(n_events=20_000, n_keys=2_000)),
               wtab, batch_size=10_000)
    table = SnapshotTable(spark, args.table, n_buckets=args.n_buckets)
    metrics = replay(
        spark,
        read_event_log(spark, args.events),
        table,
        batch_size=args.batch_size,
        max_batches=args.max_batches,
        salted_dedup=args.salted_dedup,
        use_arrow_udfs=args.arrow_udfs,
        log=True,
    )
    total = sum(bm.events_seen for bm in metrics)
    secs = sum(bm.wall_secs for bm in metrics)
    print(
        json.dumps(
            {
                "batches": len(metrics),
                "events": total,
                "secs": round(secs, 3),
                "events_per_sec": round(total / secs, 1) if secs else 0.0,
                "final_version": table.version(),
                "final_lsn": table.last_lsn(),
            }
        )
    )


if __name__ == "__main__":
    main()
