"""Per-batch metrics + per-partition lineage (north_rule requirement).

Reference analog: the hand-kept counters inserted/updated/existed/
duplicated/selected (hive_to_dwh/load.py:14-44,
thehive_to_dwh/transform_load.py:40-43,282-291, vendors_to_dwh/
load.py:113-148). Here global counters ride on ``DataFrame.observe`` —
they are computed during the single write action, no second pass over
the data — and per-bucket lineage comes from a footer-stats count over
the files just written (metadata-only).

Invariant checked by tests (FIXTURES.md §6):
    events_seen == late_events + schema_events + data_events
    data_events == conflicts_resolved + winners
    winners     == inserted + updated + deleted + delete_noop
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class BatchMetrics:
    batch_id: int
    lsn_from: int                      # exclusive
    lsn_to: int                        # inclusive
    events_seen: int = 0
    late_events: int = 0               # lsn <= checkpoint (D5 grace semantics)
    quarantined: int = 0               # malformed live rows -> dead-letter sink
    duplicate_deliveries: int = 0      # same-lsn re-deliveries collapsed
    schema_events: int = 0
    data_events: int = 0
    conflicts_resolved: int = 0        # events superseded by a later lsn per key
    winners: int = 0
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    delete_noop: int = 0               # D for a key not in the table
    buckets_touched: int = 0
    full_rewrite: bool = False
    rows_out: int = 0                  # rows written this commit (touched buckets)
    files_rewritten: int = 0           # data files written this commit
    files_carried: int = 0             # cold files carried by reference (file-level CoW)
    rows_carried_ref: int = 0          # rows inside carried cold files (from their refs)
    bytes_written: int = 0             # bytes of data files written this commit
    manifest_bytes: int = 0            # commit METADATA bytes (new shards + pointer map)
    manifest_shards_carried: int = 0   # untouched buckets' shards carried as pointers
    wall_secs: float = 0.0
    phase_secs: dict = field(default_factory=dict)  # phase -> seconds (perf diag)
    lineage: dict = field(default_factory=dict)  # bucket -> {rows, dir}

    def to_dict(self) -> dict:
        return asdict(self)

    def events_per_sec(self) -> float:
        return self.events_seen / self.wall_secs if self.wall_secs > 0 else 0.0
