"""Temporal operators: as-of join and sessionization.

Both are staples of event-stream analytics the reference approximates
with per-row Python loops over polled windows (the Influx windowed
reads, netflow_to_dwh/main.py; the last-seen lookups,
host_available_info_from_hive_to_dwh/main.py:181-183). Spark has no
native ASOF JOIN or SESSION grouping in batch; these are the standard
scale-safe compositions.

As-of join — the union+window shape, NOT a range join:
    A naive ``l JOIN r ON l.k = r.k AND r.ord <= l.ord`` explodes to
    every (probe, earlier-ref) pair before aggregation — quadratic in
    events-per-key, fatal on hot keys at 100 TB. Instead both sides are
    unioned, tagged, and sorted once per key; ``last(ref_struct,
    ignorenulls)`` over an unbounded-preceding window picks each probe
    row's most recent reference in a SINGLE shuffle + per-key sort,
    linear in input size. Reference rows sort BEFORE probe rows at
    equal ordinates, so the match is inclusive (ref.ord <= probe.ord) —
    DuckDB/pandas ``merge_asof`` backward semantics.

Sessionization — gaps-and-islands:
    lag + cumulative-sum over one per-key window; exact microsecond
    arithmetic (unix_micros) so engines agree bit-for-bit. One shuffle
    on the key, one per-key sort shared by both window functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_order: str,
    right_order: str,
    values: dict[str, Column | str],
) -> DataFrame:
    """For each left row, attach ``values`` from the right row with the
    greatest ``right_order`` <= the left row's ``left_order`` within the
    same ``on`` key group (backward as-of; null-filled when no earlier
    right row exists).

    ``right_order`` should be unique per key group — at exact ties among
    right rows the winner is otherwise unspecified.
    """
    vals = {
        k: (F.col(v) if isinstance(v, str) else v) for k, v in values.items()
    }
    ref = F.struct(*[v.alias(k) for k, v in vals.items()])
    r = right.select(
        *on,
        F.col(right_order).alias("_ord"),
        ref.alias("_ref"),
        F.lit(0).alias("_side"),
    )
    lcols = left.columns
    l = left.select(*lcols, F.col(left_order).alias("_ord"), F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy("_ord", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("_m", F.last("_ref", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_m.{k}").alias(k) for k in vals]
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_secs: float,
    tiebreak: str | None = None,
) -> DataFrame:
    """Group each key's events into sessions separated by silence longer
    than ``gap_secs``; returns one row per session with
    ``session_id`` (1-based per key, in time order), ``session_start``,
    ``session_end``, ``n_events``.

    ``tiebreak`` orders events sharing a timestamp (pass a unique id
    column for determinism).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(*key_cols).orderBy(*order)
    # NTZ-sourced columns cast to instant first (identity when the
    # session TZ is UTC, which _prep pins)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(gap_secs * 1_000_000)
    new_session = (
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > F.lit(gap_us))
    ).cast("long")
    sid = F.sum(new_session).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.withColumn("_sid", sid)
        .groupBy(*key_cols, F.col("_sid").alias("session_id"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
