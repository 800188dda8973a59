"""Stateful streaming sessionization — applyInPandasWithState.

The unbounded counterpart of operators/temporal.py::sessionize: events
tail in as a file stream, per-key session state lives in the state
store, and a session row is emitted exactly once — either when a later
event proves the gap elapsed, or when the EVENT-TIME TIMEOUT fires
(watermark passed session_end + gap with no new event). This is the
custom-stateful-operator pattern the engine uses wherever windowed
aggregation can't express the semantics (SURVEY.md §2.9): sessions
have data-dependent, unaligned boundaries, so no fixed window works.

State is O(open sessions) — one (start, end, n) triple per active key —
and the event-time timeout guarantees idle keys are evicted as the
watermark advances, so the operator runs forever at 10^10-event scale.
Arrow batches cross the Python boundary (never per-row Python); the
per-key fold is a linear scan of the batch's sorted timestamps.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..cdc.schema import EVENT_SCHEMA


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    gap_secs: float,
    key_col: str = "repo",
    watermark: str = "30 seconds",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming sessions per ``key_col`` with inactivity gap
    ``gap_secs``. Returns a streaming DataFrame of finalized sessions
    (append semantics); attach a sink + trigger to run.

    Events later than the watermark may be folded into (or reopen) a
    session non-causally; the watermark bound is the documented
    late-data grace, same trade as the windowed-rates operator.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_secs * 1_000_000)
    gap_ms = int(gap_secs * 1_000)

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("end_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _emit(key: str, sessions: list[tuple[int, int, int]]):
        return pd.DataFrame(
            {
                key_col: [key] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def fold(key, pdfs: Iterator, state: GroupState):
        k = key[0]
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield _emit(k, [(s, e, n)])
            return
        parts = [pdf["ts"] for pdf in pdfs]
        ts = pd.concat(parts).sort_values()
        us = ts.astype("datetime64[us]").astype("int64")
        s = e = n = None
        if state.exists:
            s, e, n = state.get
        closed: list[tuple[int, int, int]] = []
        for t in us:
            t = int(t)
            if s is None:
                s, e, n = t, t, 1
            elif t - e > gap_us:
                closed.append((s, e, n))
                s, e, n = t, t, 1
            else:
                e, n = max(e, t), n + 1
        state.update((s, e, n))
        # evict when the watermark proves no event can extend the session
        state.setTimeoutTimestamp(
            max(e // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _emit(k, closed)

    src = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        src = src.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = src.parquet(events_dir)
    return (
        # null event-time guard: a data event with null ts would fold the
        # int64 NaT sentinel into session state (corrupt start/end)
        events.where((events.op != "S") & events.ts.isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
