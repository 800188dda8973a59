"""Service discovery for JDBC-style sources (S3).

The reference resolves its HiveServer2 endpoint at runtime from
ZooKeeper's dynamic-discovery znodes before opening a connection
(reference: full_incidents/hive_to_dwh/extract.py:11-21 — list the
children of the ``hiveserver2`` path, each named
``serverUri=host:port;version=...;sequence=...``, and take the
endpoint of the last child iterated).

The engine keeps the same contract behind a minimal registry
interface so discovery composes with ``spark.read.format("jdbc")``
URL construction without coupling the engine to a live coordination
service: ``StaticRegistry`` (an in-memory/JSON mapping of path ->
child names, byte-compatible with the znode naming scheme) is the
hermetic implementation used in tests and this sandbox, and
``ZooKeeperRegistry`` adapts kazoo when it is installed (import-tried:
the library is not in this container, exactly like the reference's
other optional connector clients).

Selection is deterministic — highest ``sequence=`` wins (the most
recently registered live server) with the child name as tiebreak —
rather than the reference's "whichever child the dict yields last",
which is iteration-order dependent and non-reproducible.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


class DiscoveryError(RuntimeError):
    """No usable endpoint under the requested discovery path."""


@dataclass(frozen=True)
class Endpoint:
    host: str
    port: int

    @property
    def jdbc_hive_url(self) -> str:
        return f"jdbc:hive2://{self.host}:{self.port}/default"


class StaticRegistry:
    """path -> list of znode-style child names, from a dict or a JSON
    file. The hermetic stand-in for a coordination service."""

    def __init__(self, mapping: dict[str, list[str]] | str):
        if isinstance(mapping, str):
            with open(mapping) as f:
                mapping = json.load(f)
        self._mapping = dict(mapping)

    def get_children(self, path: str) -> list[str]:
        return list(self._mapping.get(path, []))


class ZooKeeperRegistry:
    """kazoo-backed registry for real deployments; the client library
    is optional exactly like the reference's connector clients."""

    def __init__(self, hosts: str, timeout: float = 5.0):
        try:
            from kazoo.client import KazooClient  # type: ignore
        except ImportError as e:  # pragma: no cover - kazoo not in sandbox
            raise ImportError(
                "ZooKeeperRegistry requires the 'kazoo' package; use "
                "StaticRegistry for file/dict-backed discovery"
            ) from e
        self._zk = KazooClient(hosts=hosts)  # pragma: no cover
        self._zk.start(timeout=timeout)  # pragma: no cover

    def get_children(self, path: str) -> list[str]:  # pragma: no cover
        return self._zk.get_children(path=path)


def _parse_server_uri(child: str) -> Endpoint | None:
    """``serverUri=host:port;version=...;sequence=...`` -> Endpoint
    (the znode naming scheme parsed at extract.py:19-21)."""
    fields = dict(
        kv.split("=", 1) for kv in child.split(";") if "=" in kv
    )
    uri = fields.get("serverUri", "")
    host, sep, port = uri.rpartition(":")
    if not sep or not port.isdigit():
        return None
    return Endpoint(host=host, port=int(port))


def _sequence(child: str) -> int:
    fields = dict(
        kv.split("=", 1) for kv in child.split(";") if "=" in kv
    )
    seq = fields.get("sequence", "")
    return int(seq) if seq.isdigit() else -1


def discover(registry, path: str = "hiveserver2") -> Endpoint:
    """Resolve one live endpoint under ``path``: highest sequence wins,
    child-name tiebreak; malformed children are skipped."""
    children = registry.get_children(path)
    candidates = [
        (c, ep) for c in sorted(children)
        if (ep := _parse_server_uri(c)) is not None
    ]
    if not candidates:
        raise DiscoveryError(
            f"no parseable serverUri children under {path!r} "
            f"(saw {len(children)})"
        )
    best, _ = max(
        enumerate(candidates), key=lambda ie: (_sequence(ie[1][0]), ie[0])
    )
    return candidates[best][1]


def apply_discovery(settings: dict, registry, path: str = "hiveserver2") -> dict:
    """The reference's settings mutation (extract.py:20-21) as a pure
    function: returns a copy of ``settings`` with host/port resolved."""
    ep = discover(registry, path)
    out = dict(settings)
    out["host"] = ep.host
    out["port"] = ep.port
    return out
