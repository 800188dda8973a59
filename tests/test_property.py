"""Property-based replay equivalence (hypothesis).

The generator-driven suite (test_replay.py) explores the statistical
shape the bench uses; this suite explores ADVERSARIAL structures the
generator never emits — delete-then-reinsert of the same key inside one
batch, duplicate deliveries of a delete winner, all-delete logs, keys
that churn every event — against an in-test reducer written
independently of the engine's own oracle (etl_spark/cdc/gen.py
oracle_reduce), so a bug shared between engine and packaged oracle
cannot hide.

Each hypothesis example is one full replay (batch count capped so an
example stays ~1 s); examples are deliberately tiny — the point is
structural coverage, not volume.
"""

import datetime
import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_spark.cdc.lake import SnapshotTable
from etl_spark.cdc.runner import replay
from etl_spark.cdc.schema import EVENT_SCHEMA
from etl_spark.functions.udfs import LANG_CANON

KEYS = [(f"r{i}", f"src/f{j}.py") for i in range(3) for j in range(2)]
LANGS = ["Python", "C++", "golang", "rs", None]
TS0 = datetime.datetime(2024, 1, 1)


def _mini_reduce(events):
    """Independent reducer: dict state, lsn order, dup-lsn idempotent.
    Mirrors the MERGE contract: I/U overwrite the whole row, D deletes;
    content_sha256 = sha256(content); lang normalized via the canon map."""
    state = {}
    seen = set()
    for e in sorted(events, key=lambda e: e["lsn"]):
        if e["lsn"] in seen:
            continue
        seen.add(e["lsn"])
        key = (e["repo"], e["path"])
        if e["op"] == "D":
            state.pop(key, None)
        else:
            lang = e["lang"].lower() if e["lang"] is not None else None
            content = e["content"]
            state[key] = {
                "commit": e["commit"],
                "lang": LANG_CANON.get(lang, lang),
                "content": content,
                "content_sha256": None if content is None else
                    hashlib.sha256(content.encode("utf-8")).hexdigest(),
                "_last_lsn": e["lsn"],
            }
    return state


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    events = []
    for i in range(n):
        k = draw(st.integers(0, len(KEYS) - 1))
        op = draw(st.sampled_from("IUD"))
        repo, path = KEYS[k]
        content = (
            None if op == "D"
            else draw(st.text(alphabet="abcXYZ0 \n", max_size=12))
        )
        events.append({
            "lsn": i + 1,
            "op": op,
            "repo": repo,
            "path": path,
            "commit": f"c{i:04x}",
            "lang": draw(st.sampled_from(LANGS)) if op != "D" else None,
            "content": content,
            "ts": TS0 + datetime.timedelta(seconds=i),
            "extra": None,
            "schema_change": None,
        })
    # duplicate deliveries: redeliver a random subset verbatim
    for idx in draw(st.lists(st.integers(0, n - 1), max_size=4)):
        events.append(dict(events[idx]))
    batch_size = draw(st.integers(1, n))
    return events, batch_size


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(log=event_logs())
def test_replay_matches_independent_reducer(spark, tmp_path_factory, log):
    events, batch_size = log
    n_real = max(e["lsn"] for e in events)
    # cap the batch count so one example stays ~1 s
    batch_size = max(batch_size, math.ceil(n_real / 4))
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    want = _mini_reduce(events)

    tmp = tmp_path_factory.mktemp("prop_lake")
    table = SnapshotTable(spark, str(tmp / "lake"), n_buckets=4)
    replay(spark, df, table, batch_size=batch_size)

    got = {(r["repo"], r["path"]): r.asDict() for r in table.read().collect()}
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        for c in ("commit", "lang", "content", "content_sha256", "_last_lsn"):
            assert g[c] == w[c], f"{key}.{c}: engine={g[c]!r} oracle={w[c]!r}"
