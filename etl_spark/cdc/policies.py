"""Column-level merge policies — K3 column-subset update.

Reference semantics implemented here:
- ``hive_to_dwh/load.py:25-26`` and
  ``host_available_info_from_hive_to_dwh/main.py:181-183``: when the key
  already exists, update only the ``last_seen``-style touch columns
  instead of replacing the whole row -> ``track_seen=True`` maintains
  ``first_seen`` (min event ts ever applied) and ``last_seen`` (max) as
  engine-managed table columns.
- Partial-update CDC (postgres logical replication's
  unchanged-TOAST-datum behavior): an update event carries NULL for wide
  columns it did not touch; the merge must keep the previous value ->
  ``coalesce_cols`` marks such columns. Winner resolution then uses, per
  key, the last NON-NULL value by lsn (within the batch) falling back to
  the target's current value (across batches).

Scale shape: every per-key policy reduction is a fixed-width aggregate
(max(long) pointer for coalesce, min/max(timestamp) for track_seen)
riding the existing slim HashAggregate — no wide buffers, no extra
shuffle of content. Values are fetched by narrow joins on the winner
pointers only (|keys| rows).

Determinism note: ``first_seen``/``last_seen`` fold min/max over every
data event applied to the key's CURRENT incarnation — a delete removes
the row and therefore the carried window, and a later re-insert restarts
it at the first event after the delete. This holds at every batch size:
across batches the delete physically drops the row; within a batch the
merge recomputes the window over only the events past the key's last
delete lsn (merge._apply_policies delete-barrier refinement), so replay
state is identical to sequential (batch-size-1) application.
"""

from __future__ import annotations

from dataclasses import dataclass

# event-row columns a coalesce policy may target directly; anything else
# is resolved through the dynamic `extra` map
BASE_EVENT_VALUE_COLS = ("commit", "lang", "content")

SEEN_COLS = (("first_seen", "timestamp"), ("last_seen", "timestamp"))


@dataclass(frozen=True)
class MergePolicies:
    """Per-column merge behavior for ``apply_batch``/``replay``.

    coalesce_cols: columns where NULL in an incoming update means "keep
        the previous value" (partial-update semantics).
    track_seen: maintain first_seen/last_seen timestamp columns.
    """

    coalesce_cols: tuple[str, ...] = ()
    track_seen: bool = False

    def __post_init__(self):
        banned = {"repo", "path", "content_sha256", "_last_lsn",
                  "first_seen", "last_seen"}
        bad = banned.intersection(self.coalesce_cols)
        if bad:
            raise ValueError(f"coalesce policy not allowed on: {sorted(bad)}")

    @property
    def active(self) -> bool:
        return bool(self.coalesce_cols) or self.track_seen


NO_POLICIES = MergePolicies()
