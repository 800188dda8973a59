"""SparkSession factory with the engine's defaults.

Local mode is a test stand-in for a multi-executor cluster; every knob
here also applies unchanged under ``spark-submit --py-files`` on a real
cluster (see cdc/runner.py for the submit entrypoint).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    - AQE on: runtime coalesce + skew-join splitting (SURVEY.md §4).
    - Arrow on: all Python-side transforms are pandas UDFs.
    - UTC session TZ: oracle (DuckDB) comparisons are TZ-naive UTC.
    - shuffle partitions = 4x cores in local mode, not the 200 default:
      1 task/core wave-quantizes (one straggler idles the whole pool at
      the stage tail — measured 1.6x slower at local[32]); 4 waves keep
      cores fed and AQE coalesces whatever ends up too small.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            cores = (os.cpu_count() or 8) if inner == "*" else int(inner)
            shuffle_partitions = 4 * cores
        elif cpus:
            shuffle_partitions = 4 * int(cpus)
        else:
            shuffle_partitions = 128

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # min/max/count aggregates with no filter answer from parquet
        # footer stats (the replay's LSN bounds probe becomes metadata-only)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Ad-hoc conf overrides without touching call sites (bench/scaling
    # experiments): ETL_SPARK_CONF="k=v,k2=v2".
    for kv in filter(None, os.environ.get("ETL_SPARK_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
