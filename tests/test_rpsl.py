"""RPSL flat-file source (S9/S10): paragraph parsing semantics vs the
reference's line-loop parser (geoinfo/geoinfo.py:80-159), gzip scan
parallelism, and the fetch/ungzip transport step."""

import glob
import gzip
import os

from etl_spark.sources.rpsl import (
    fetch,
    read_ripe_organisations,
    read_ripe_routes,
    read_rpsl,
    ungzip,
)

FIXTURE = """\
organisation: ORG-A1
org-name: Acme Corp
remarks: noise line that must not leak
source: RIPE

organisation: ORG-B2
remarks: record without org-name -> ''

org-name: orphan name, no organisation key -> dropped
remarks: missing required attr

organisation: ORG-C3
org-name: First Name
org-name: Second Name



organisation: ORG-D4\t
org-name:   spaced value\t
"""

ROUTES = """\
route: 10.0.0.0/8
org: ORG-A1
descr: v4 block

route6: 2001:db8::/32
org: ORG-B2

route: 192.168.0.0/16

descr: no route key at all -> dropped
"""


def test_rpsl_organisation_semantics(spark, tmp_path):
    p = tmp_path / "orgs.rpsl"
    p.write_text(FIXTURE)
    rows = {
        r["org_id"]: r["org_name"]
        for r in read_ripe_organisations(spark, str(p)).collect()
    }
    assert rows == {
        "ORG-A1": "Acme Corp",
        "ORG-B2": "",            # missing attribute -> '' (geoinfo.py:101)
        "ORG-C3": "First Name",  # repeated attr: first occurrence wins
        "ORG-D4": "spaced value",  # trailing/leading whitespace stripped
    }


def test_rpsl_routes_coalesce_and_required(spark, tmp_path):
    p = tmp_path / "routes.rpsl"
    p.write_text(ROUTES)
    rows = {
        r["network"]: r["org_id"]
        for r in read_ripe_routes(spark, str(p)).collect()
    }
    assert rows == {
        "10.0.0.0/8": "ORG-A1",
        "2001:db8::/32": "ORG-B2",  # route6 coalesced into network
        "192.168.0.0/16": "",       # route present, org missing -> ''
    }


def test_rpsl_gz_directory_scan(spark, tmp_path):
    """A directory of .gz shards reads in one distributed scan — the
    scale shape for the split RIPE dumps (one file per task)."""
    d = tmp_path / "dump"
    d.mkdir()
    for i in range(3):
        with gzip.open(d / f"part{i}.rpsl.gz", "wt") as f:
            for j in range(4):
                f.write(f"organisation: ORG-{i}-{j}\norg-name: n{i}{j}\n\n")
    df = read_ripe_organisations(spark, str(d))
    assert df.count() == 12
    assert df.rdd.getNumPartitions() >= 3  # per-file parallelism
    got = {r["org_id"] for r in df.collect()}
    assert got == {f"ORG-{i}-{j}" for i in range(3) for j in range(4)}


def test_fetch_and_ungzip_roundtrip(tmp_path):
    src = tmp_path / "ripe.db.organisation.gz"
    payload = FIXTURE.encode()
    with gzip.open(src, "wb") as f:
        f.write(payload)
    got = fetch(f"file://{src}", str(tmp_path / "dl"))
    assert os.path.basename(got) == "ripe.db.organisation.gz"
    plain = ungzip(got, str(tmp_path / "dl" / "ripe.db.organisation"))
    assert open(plain, "rb").read() == payload


def test_rpsl_no_python_in_plan(spark, tmp_path):
    """Attribute extraction is pure codegen — no Python eval nodes."""
    p = tmp_path / "orgs.rpsl"
    p.write_text(FIXTURE)
    plan = read_ripe_organisations(spark, str(p))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rpsl_generic_keys(spark, tmp_path):
    p = tmp_path / "x.rpsl"
    p.write_text("a: 1\nb: 2\n\na: 3\n\nb: only-b\n")
    df = read_rpsl(spark, str(p), keys={"a": "a", "b": "b"})
    got = sorted((r["a"], r["b"]) for r in df.collect())
    assert got == [("", "only-b"), ("1", "2"), ("3", "")]


# --- property: render -> parse round trip over adversarial values ---------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# values that survive a line-oriented format: no newlines; leading/
# trailing whitespace is stripped by parser AND renderer contract, so
# normalize in the strategy (RPSL itself has no quoting mechanism)
_value = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=1, max_size=40,
).map(lambda s: s.strip()).filter(lambda s: s != "")

_records = st.lists(
    st.tuples(_value, st.one_of(st.none(), _value)),
    min_size=1, max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(recs=_records)
def test_rpsl_roundtrip_property(spark, tmp_path_factory, recs):
    """Any renderable (org_id, optional org-name) set survives the
    render -> distributed-parse round trip exactly: ids keyed by index
    (values may repeat), missing attribute -> ''."""
    d = tmp_path_factory.mktemp("rpsl_prop")
    p = d / "dump.rpsl"
    blocks = []
    for i, (vid, name) in enumerate(recs):
        lines = [f"organisation: ID{i} {vid}"]
        if name is not None:
            lines.append(f"org-name: {name}")
        blocks.append("\n".join(lines))
    p.write_text("\n\n".join(blocks) + "\n", encoding="utf-8")
    got = {
        r["org_id"]: r["org_name"]
        for r in read_ripe_organisations(spark, str(p)).collect()
    }
    want = {f"ID{i} {vid}": (name if name is not None else "")
            for i, (vid, name) in enumerate(recs)}
    assert got == want
