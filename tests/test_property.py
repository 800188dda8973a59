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


# --------------------------------------------------------------------------
# schema evolution under random interleavings + batch boundaries
# --------------------------------------------------------------------------

@st.composite
def evolving_logs(draw):
    """I/U/D data events interleaved with S control events (add column,
    rename, widen long->string), extra-map payloads only ever using the
    column names live at that lsn, plus duplicate deliveries of both
    data AND control events."""
    events = []
    live_cols: dict[str, str] = {}  # current name -> ddl type
    n_added = 0
    n = draw(st.integers(min_value=4, max_value=26))
    for i in range(n):
        lsn = i + 1
        kind = draw(st.sampled_from(
            ["data"] * 5 + ["add", "rename", "widen"]))
        if kind == "add" and n_added < 4:
            name = f"c{n_added}"
            ddl = draw(st.sampled_from(["string", "long"]))
            live_cols[name] = ddl
            n_added += 1
            events.append(_s_event(lsn, "add", name, None, ddl))
            continue
        if kind == "rename" and live_cols:
            old = draw(st.sampled_from(sorted(live_cols)))
            new = old + "r"
            if new not in live_cols:
                live_cols[new] = live_cols.pop(old)
                events.append(_s_event(lsn, "rename", old, new, None))
                continue
        if kind == "widen":
            longs = [c for c, t in live_cols.items() if t == "long"]
            if longs:
                col = draw(st.sampled_from(longs))
                live_cols[col] = "string"
                events.append(_s_event(lsn, "widen", col, None, "string"))
                continue
        # data event (also the fallback when add/rename/widen is not legal)
        k = draw(st.integers(0, len(KEYS) - 1))
        op = draw(st.sampled_from("IUD"))
        repo, path = KEYS[k]
        extra = None
        if op != "D" and live_cols:
            extra = {
                c: (draw(st.text(alphabet="xyz", max_size=3))
                    if live_cols[c] == "string"
                    else str(draw(st.integers(0, 99))))
                for c in sorted(live_cols)
                if draw(st.booleans())
            } or None
        events.append({
            "lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": f"c{i:04x}", "lang": "python" if op != "D" else None,
            "content": None if op == "D" else f"v{i}",
            "ts": TS0 + datetime.timedelta(seconds=i),
            "extra": extra, "schema_change": None,
        })
    for idx in draw(st.lists(st.integers(0, len(events) - 1), max_size=3)):
        events.append(dict(events[idx]))  # redeliver data AND control events
    batch_size = draw(st.integers(1, n))
    return events, batch_size


def _s_event(lsn, kind, column, new_name, new_type):
    return {
        "lsn": lsn, "op": "S", "repo": None, "path": None, "commit": None,
        "lang": None, "content": None,
        "ts": TS0 + datetime.timedelta(seconds=lsn),
        "extra": None,
        "schema_change": {"kind": kind, "column": column,
                          "new_name": new_name, "new_type": new_type},
    }


def _mini_reduce_evolving(events):
    """Independent reducer with dynamic columns: add (null backfill),
    rename (re-home stored values), widen long->string (restringify)."""
    state: dict = {}
    dyn: list[list] = []  # [name, ddl]
    seen = set()
    for e in sorted(events, key=lambda e: e["lsn"]):
        if e["lsn"] in seen:
            continue
        seen.add(e["lsn"])
        if e["op"] == "S":
            sc = e["schema_change"]
            if sc["kind"] == "add":
                dyn.append([sc["column"], sc["new_type"]])
            elif sc["kind"] == "rename":
                for c in dyn:
                    if c[0] == sc["column"]:
                        c[0] = sc["new_name"]
                for row in state.values():
                    if sc["column"] in row["x"]:
                        row["x"][sc["new_name"]] = row["x"].pop(sc["column"])
            elif sc["kind"] == "widen":
                for c in dyn:
                    if c[0] == sc["column"]:
                        c[1] = sc["new_type"]
            continue
        key = (e["repo"], e["path"])
        if e["op"] == "D":
            state.pop(key, None)
            continue
        state[key] = {
            "commit": e["commit"],
            "content": e["content"],
            "content_sha256": hashlib.sha256(e["content"].encode()).hexdigest(),
            "_last_lsn": e["lsn"],
            "x": dict(e["extra"] or {}),
        }
    final = [(c[0], c[1]) for c in dyn]
    out = {}
    for key, row in state.items():
        r = {k: v for k, v in row.items() if k != "x"}
        for name, ddl in final:
            v = row["x"].get(name)
            r[name] = (int(v) if ddl == "long" and v is not None else v)
        out[key] = r
    return out, final


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(log=evolving_logs())
def test_schema_evolution_replay_matches_reducer(spark, tmp_path_factory, log):
    events, batch_size = log
    n_real = max(e["lsn"] for e in events)
    batch_size = max(batch_size, math.ceil(n_real / 4))
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    want, final_dyn = _mini_reduce_evolving(events)

    tmp = tmp_path_factory.mktemp("prop_evo")
    table = SnapshotTable(spark, str(tmp / "lake"), n_buckets=4)
    replay(spark, df, table, batch_size=batch_size)

    assert table.dyn_schema() == [tuple(c) for c in final_dyn]
    got = {(r["repo"], r["path"]): r.asDict() for r in table.read().collect()}
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        for c, v in w.items():
            assert g[c] == v, f"{key}.{c}: engine={g[c]!r} oracle={v!r}"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(log=event_logs(), policy=st.sampled_from(
    [None, ("every", 1), ("every", 2), ("chain", 1), ("chain", 2)]))
def test_delta_replay_matches_reducer_any_compaction(
    spark, tmp_path_factory, log, policy
):
    """Merge-on-read replay under RANDOM logs (dup deliveries included)
    and RANDOM compaction policies is indistinguishable from the
    independent sequential reducer — the mode's whole contract, explored
    beyond the hand-picked cases in test_delta."""
    events, batch_size = log
    n_real = max(e["lsn"] for e in events)
    batch_size = max(batch_size, math.ceil(n_real / 4))
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    want = _mini_reduce(events)

    tmp = tmp_path_factory.mktemp("prop_delta")
    table = SnapshotTable(spark, str(tmp / "lake"), n_buckets=4)
    kw = {}
    if policy is not None:
        kw = ({"compact_every": policy[1]} if policy[0] == "every"
              else {"compact_chain_len": policy[1]})
    replay(spark, df, table, batch_size=batch_size, write_mode="delta", **kw)

    got = {(r["repo"], r["path"]): r.asDict() for r in table.read().collect()}
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        for c in ("commit", "lang", "content", "content_sha256", "_last_lsn"):
            assert g[c] == w[c], f"{key}.{c}: engine={g[c]!r} oracle={w[c]!r}"
