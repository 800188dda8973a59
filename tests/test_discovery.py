"""Service discovery (S3): znode-name parsing, deterministic selection,
settings resolution — hermetic via StaticRegistry (the ZooKeeper
adapter only changes where get_children() answers come from)."""

import json

import pytest

from etl_spark.sources.discovery import (
    DiscoveryError,
    Endpoint,
    StaticRegistry,
    apply_discovery,
    discover,
)

CHILDREN = [
    "serverUri=hs2-a.example:10000;version=3.1.3;sequence=0000000041",
    "serverUri=hs2-b.example:10001;version=3.1.3;sequence=0000000057",
    "serverUri=hs2-dead.example:10002;version=3.1.3;sequence=0000000012",
    "not-a-server-uri-at-all",
]


def test_highest_sequence_wins():
    reg = StaticRegistry({"hiveserver2": CHILDREN})
    ep = discover(reg)
    assert ep == Endpoint("hs2-b.example", 10001)
    assert ep.jdbc_hive_url == "jdbc:hive2://hs2-b.example:10001/default"


def test_selection_is_order_independent():
    a = discover(StaticRegistry({"hiveserver2": CHILDREN}))
    b = discover(StaticRegistry({"hiveserver2": CHILDREN[::-1]}))
    assert a == b


def test_malformed_only_raises():
    reg = StaticRegistry({"hiveserver2": ["junk", "serverUri=noport"]})
    with pytest.raises(DiscoveryError):
        discover(reg)


def test_empty_path_raises():
    with pytest.raises(DiscoveryError):
        discover(StaticRegistry({}), path="hiveserver2")


def test_apply_discovery_returns_resolved_copy():
    reg = StaticRegistry({"hiveserver2": CHILDREN[:1]})
    settings = {"user": "etl", "host": "placeholder", "port": 0}
    out = apply_discovery(settings, reg)
    assert out == {"user": "etl", "host": "hs2-a.example", "port": 10000}
    assert settings["host"] == "placeholder"  # input untouched


def test_json_file_registry(tmp_path):
    p = tmp_path / "registry.json"
    p.write_text(json.dumps({"hiveserver2": CHILDREN[:2]}))
    ep = discover(StaticRegistry(str(p)))
    assert ep.host == "hs2-b.example"


def test_ipv6_and_no_sequence():
    reg = StaticRegistry({
        "hiveserver2": ["serverUri=[::1]:10000;version=3"],
    })
    assert discover(reg) == Endpoint("[::1]", 10000)
