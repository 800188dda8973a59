"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure a per-row-heavy operator starts from at least the session's
    default parallelism.

    A production-scale table arrives as thousands of file splits and this
    is a no-op. But a scan below the parallelism floor — tiny test scale
    factors, one small parquet file, the tail partition of a filtered
    read — would otherwise run the operator's entire hot loop (shingle
    explode, Arrow UDF batches, hash mixing) on ONE core: Spark only
    splits parquet at row-group boundaries, so a single-row-group file is
    a single partition no matter how many cores are idle. The repartition
    round-robins the (by construction small) input once; measured at
    sf0.1 it turns the 1-partition documents scan from a serial 3.5 s
    shingle pass into a parallel ~0.3 s one.
    """
    sc = df.sparkSession.sparkContext
    want = min_parts or sc.defaultParallelism
    # Gate on the optimizer's size estimate, NOT df.rdd.getNumPartitions():
    # the .rdd route forces full physical planning + DAG construction on
    # the driver for EVERY operator invocation just to read a number. The
    # stats estimate (file sizes for scans, row-count heuristics
    # otherwise) is computed during analysis anyway; under ~4 MB per task
    # slot the input is small enough that one round-robin pass costs
    # nothing, while a production-scale scan blows straight past the
    # threshold and stays untouched on its natural splits.
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()  # noqa: SLF001
        )
    except Exception:
        # stats unavailable: default to repartitioning, for the same
        # reason the primary path avoids .rdd — probing
        # df.rdd.getNumPartitions() would force full physical planning on
        # the driver just to read a number. Inputs without stats here are
        # non-scan shapes (local relations, fresh in-memory frames) that
        # are small by construction, so one round-robin pass is free; a
        # production-scale parquet scan always has file-size stats and
        # never reaches this branch.
        return df.repartition(want)
    return df.repartition(want) if size < want * 4 * 1024 * 1024 else df
