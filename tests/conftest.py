import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl_spark-tests", master="local[8]", shuffle_partitions=8)
    yield s


def assert_table_matches_oracle(table_rows: list, oracle_state: dict, dyn_cols: list):
    """Row-set equality between the materialized table and the oracle
    reducer state, including the content_sha256 invariant and dynamic
    (schema-evolved) columns."""
    got = {(r["repo"], r["path"]): r.asDict() for r in table_rows}
    assert len(got) == len(table_rows), "duplicate (repo,path) keys in table"
    assert set(got) == set(oracle_state), (
        f"key sets differ: extra={list(set(got) - set(oracle_state))[:3]} "
        f"missing={list(set(oracle_state) - set(got))[:3]}"
    )
    base_cols = ["commit", "lang", "content", "content_sha256", "_last_lsn"]
    for key, want in oracle_state.items():
        have = got[key]
        for c in base_cols + [n for n, _ in dyn_cols]:
            assert have[c] == want.get(c), (
                f"mismatch at {key}.{c}: engine={have[c]!r} oracle={want.get(c)!r}"
            )
