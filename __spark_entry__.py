"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship — the full CDC engine (dedup -> CoW MERGE ->
snapshot commit) replaying the sf0.001 events stream.
queries()/oracle_sql(): one entry per operator family from SURVEY.md §2
plus the training-data operators; oracles are exact DuckDB mirrors
(floats rounded to 6 dp on both sides; ties broken by id columns).
LSH/simhash queries are deliberately rows-only (xxhash64/md5 hash-family
internals, not SQL-expressible at reasonable effort) — their quality is
asserted in tests/test_operators.py instead (e.g. LSH recall vs brute
force). The rolling-hash fingerprint IS fully oracle-checked: its
Karp-Rabin arithmetic is replicated in pure DuckDB SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_spark.queries import q_cdc_replay_snapshot

    return q_cdc_replay_snapshot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_spark.queries import QUERIES

    return dict(QUERIES)


_EN = "['the','a','of','and','to','in','is','it','that','for']"

_WS_TOKENS = "list_filter(string_split_regex(trim({c}), '\\s+'), x -> x <> '')"
_STOP_HITS = (
    "len(list_filter(list_filter(string_split_regex(trim(lower({c})), '\\s+'),"
    " x -> x <> ''), x -> list_contains({words}, x)))"
)


def _stop(c: str, words: str) -> str:
    return _STOP_HITS.format(c=c, words=words)


_LANGS_SQL = {
    "en": _EN,
    "es": "['el','la','de','y','que','en','un','una','por','con']",
    "de": "['der','die','das','und','zu','ist','ein','nicht','mit','auf']",
    "fr": "['le','la','de','et','que','en','un','une','pour','dans']",
}


def oracle_sql() -> dict[str, str]:
    h = {k: _stop("text", v) for k, v in _LANGS_SQL.items()}
    out = _oracle_sql_literal(h)
    # the change feed is write-mode-invariant by contract: the feed read
    # through uncompacted merge-on-read chains must satisfy the exact
    # same classification SQL as the CoW feed
    out["changelog_feed_delta"] = out["changelog_feed"]
    return out


def _oracle_sql_literal(h) -> dict[str, str]:
    return {
        "window_dedup": """
            SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                   round(value, 6) AS last_value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "cdc_merge_upsert": """
            SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                   round(value, 6) AS last_value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_replay_snapshot": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT repo, path, commit, content, sha256(content) AS content_sha256,
                   lsn AS last_lsn
            FROM last WHERE rn = 1 AND op <> 'D'
        """,
        # the merge-on-read write path must be VALUE-identical to CoW:
        # same last-writer-wins oracle, but the Spark side reads through
        # uncompacted delta chains (lake._read_merged reconstruction)
        "cdc_replay_delta": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT repo, path, commit, content, sha256(content) AS content_sha256,
                   lsn AS last_lsn
            FROM last WHERE rn = 1 AND op <> 'D'
        """,
        "time_travel_incremental": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT repo, path, commit, sha256(content) AS content_sha256,
                   lsn AS last_lsn
            FROM last WHERE rn = 1 AND op <> 'D' AND lsn >= 8000
        """,
        "predicate_delete": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT repo, path, commit, sha256(content) AS content_sha256,
                   lsn AS last_lsn
            FROM last WHERE rn = 1 AND op <> 'D' AND lsn > 5000
        """,
        # rollback restores snapshot v2 = the state after the first two
        # 4000-event batches: recompute last-writer-wins over ONLY that
        # log prefix (a key updated later but also present early must
        # reappear with its EARLY row — filtering full-log winners would
        # lose it)
        "rollback_restore": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events
              WHERE event_id < 8000),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT repo, path, commit, sha256(content) AS content_sha256,
                   lsn AS last_lsn
            FROM last WHERE rn = 1 AND op <> 'D'
        """,
        "changelog_feed": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CAST(floor(event_id / 4000) AS BIGINT) AS batch,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            w AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path, batch ORDER BY lsn DESC) AS rn
              FROM log),
            winners AS (
              SELECT repo, path, batch, op, lsn, sha256(content) AS sha
              FROM w WHERE rn = 1),
            seq AS (
              SELECT *, lag(op) OVER k AS prev_op, lag(lsn) OVER k AS prev_lsn,
                     lag(sha) OVER k AS prev_sha
              FROM winners WINDOW k AS (PARTITION BY repo, path ORDER BY lsn))
            SELECT repo, path,
                   CASE WHEN op = 'D' THEN 'delete'
                        WHEN prev_op IS NULL OR prev_op = 'D' THEN 'insert'
                        ELSE 'update' END AS change_type,
                   CAST(batch + 1 AS INT) AS commit_version,
                   CASE WHEN op = 'D' THEN prev_sha ELSE sha END AS content_sha256,
                   CASE WHEN op = 'D' THEN prev_lsn ELSE lsn END AS last_lsn
            FROM seq
            WHERE NOT (op = 'D' AND (prev_op IS NULL OR prev_op = 'D'))
        """,
        "mirror_sync": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT repo, path, commit, sha256(content) AS content_sha256
            FROM last WHERE rn = 1 AND op <> 'D'
        """,
        "scd2_history": """
            WITH log AS (
              SELECT event_id AS lsn,
                     CAST(floor(event_id / 4000) AS BIGINT) AS batch,
                     CASE WHEN event_type = 'error' THEN 'D'
                          WHEN event_type = 'signup' THEN 'I' ELSE 'U' END AS op,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'error' THEN props END AS content
              FROM events),
            w AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path, batch ORDER BY lsn DESC) AS rn
              FROM log),
            winners AS (
              SELECT repo, path, op, lsn, commit, content FROM w WHERE rn = 1),
            seq AS (
              SELECT *, lead(lsn) OVER (
                PARTITION BY repo, path ORDER BY lsn) AS nxt
              FROM winners)
            SELECT repo, path, commit, sha256(content) AS content_sha256,
                   lsn AS valid_from, nxt AS valid_to,
                   (nxt IS NULL) AS is_current
            FROM seq WHERE op <> 'D'
        """,
        "touch_first_last_seen": """
            WITH log AS (
              SELECT event_id AS lsn,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     ts
              FROM events),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log),
            seen AS (
              SELECT repo, path, min(ts) AS first_seen, max(ts) AS last_seen
              FROM log GROUP BY repo, path)
            SELECT l.repo, l.path, l.commit, s.first_seen, s.last_seen,
                   l.lsn AS last_lsn
            FROM last l JOIN seen s USING (repo, path) WHERE l.rn = 1
        """,
        "asof_join": """
            SELECT c.event_id, c.user_id, p.event_id AS purchase_event_id,
                   round(p.value, 6) AS last_purchase_value
            FROM (SELECT event_id, user_id FROM events
                  WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT event_id, user_id, value FROM events
                            WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.event_id >= p.event_id
        """,
        "sessionize": """
            WITH t AS (
              SELECT user_id, ts, event_id, epoch_us(ts) AS us,
                     lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS pus
              FROM events),
            s AS (
              SELECT *, sum(CASE WHEN pus IS NULL OR us - pus > 43200000000
                                 THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM t)
            SELECT user_id, CAST(sid AS BIGINT) AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "coalesce_content_merge": """
            WITH log AS (
              SELECT event_id AS lsn,
                     'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     md5(CAST(event_id AS VARCHAR)) AS commit,
                     CASE WHEN event_type <> 'view' THEN props END AS content
              FROM events),
            cv AS (
              SELECT DISTINCT repo, path,
                     last_value(content IGNORE NULLS) OVER (
                       PARTITION BY repo, path ORDER BY lsn
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                       AS content
              FROM log),
            last AS (
              SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY lsn DESC) AS rn
              FROM log)
            SELECT l.repo, l.path, l.commit, c.content,
                   sha256(c.content) AS content_sha256, l.lsn AS last_lsn
            FROM last l JOIN cv c USING (repo, path) WHERE l.rn = 1
        """,
        "cidr_longest_match": """
            WITH ips AS (
              SELECT event_id,
                     167772160 + (user_id % 8) * 65536
                       + ((user_id * 7) % 250) * 256 + (event_id % 250) AS ipl
              FROM events),
            nets AS (
              SELECT * FROM (VALUES
                ('10.0.0.0/8', 167772160, 8), ('10.3.0.0/16', 167968768, 16),
                ('10.3.9.0/24', 167971072, 24), ('10.100.0.0/14', 174325760, 14),
                ('10.5.0.0/22', 168099840, 22), ('11.0.0.0/8', 184549376, 8)
              ) AS t(cidr, netl, plen)),
            cand AS (
              SELECT i.event_id, n.cidr, n.plen
              FROM ips i JOIN nets n
                ON (i.ipl >> (32 - n.plen)) = (n.netl >> (32 - n.plen))),
            best AS (SELECT event_id, max(plen) AS plen FROM cand GROUP BY 1),
            m AS (
              SELECT c.event_id, min(c.cidr) AS cidr
              FROM cand c JOIN best b USING (event_id, plen) GROUP BY 1)
            SELECT cidr, count(*) AS n_rows FROM m GROUP BY cidr
        """,
        # IPv6 longest-prefix match in native 128-bit HUGEINT arithmetic:
        # the probe address is recomputed numerically from the same
        # user_id/event_id derivation the Spark query uses to BUILD the
        # compressed string form, so a hash match proves the engine's
        # '::'-expanding string parser + two-long prefix masking agree
        # with exact 128-bit integer containment for every event row.
        "cidr6_longest_match": """
            WITH ips AS (
              SELECT event_id,
                     CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096
                     + CAST(3512 AS HUGEINT) * 79228162514264337593543950336
                     + CAST(user_id % 16 AS HUGEINT) * 1208925819614629174706176
                     + CAST((user_id * 7) % 65536 AS HUGEINT) * 65536
                     + CAST(event_id % 65536 AS HUGEINT) AS ipv
              FROM events),
            nets AS (
              SELECT * FROM (VALUES
                ('0000:0000:0000:0000:0000:0000:0000:0000/0',
                 CAST(0 AS HUGEINT), 0),
                ('2001:0000:0000:0000:0000:0000:0000:0000/16',
                 CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096, 16),
                ('2001:0db8:0000:0000:0000:0000:0000:0000/32',
                 CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096
                 + CAST(3512 AS HUGEINT) * 79228162514264337593543950336, 32),
                ('2001:0db8:0005:0000:0000:0000:0000:0000/48',
                 CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096
                 + CAST(3512 AS HUGEINT) * 79228162514264337593543950336
                 + CAST(5 AS HUGEINT) * 1208925819614629174706176, 48),
                ('2001:0db8:0005:0000:0000:0000:0000:0000/64',
                 CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096
                 + CAST(3512 AS HUGEINT) * 79228162514264337593543950336
                 + CAST(5 AS HUGEINT) * 1208925819614629174706176, 64),
                ('2001:0db8:000c:0000:0000:0000:0000:0000/46',
                 CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096
                 + CAST(3512 AS HUGEINT) * 79228162514264337593543950336
                 + CAST(12 AS HUGEINT) * 1208925819614629174706176, 46),
                ('2001:0db9:0000:0000:0000:0000:0000:0000/32',
                 CAST(8193 AS HUGEINT) * 5192296858534827628530496329220096
                 + CAST(3513 AS HUGEINT) * 79228162514264337593543950336, 32)
              ) AS t(cidr, netv, plen)),
            cand AS (
              SELECT i.event_id, n.cidr, n.plen
              FROM ips i JOIN nets n
                ON (i.ipv >> (128 - n.plen)) = (n.netv >> (128 - n.plen))),
            best AS (SELECT event_id, max(plen) AS plen FROM cand GROUP BY 1),
            m AS (
              SELECT c.event_id, min(c.cidr) AS cidr
              FROM cand c JOIN best b USING (event_id, plen) GROUP BY 1)
            SELECT cidr, count(*) AS n_rows FROM m GROUP BY cidr
        """,
        "csv_roundtrip": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   min(doc_id) AS min_doc_id,
                   CAST(sum(length(text)) AS BIGINT) AS total_text_chars,
                   min(sha256(text)) AS min_text_sha
            FROM documents GROUP BY lang
        """,
        "merge_into_snapshot": """
            WITH sp AS (SELECT CAST(floor(max(event_id) / 2) AS BIGINT) AS s
                        FROM events),
            r1 AS (
              SELECT user_id, event_id, props,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY event_id DESC) AS rn
              FROM events WHERE event_id <= (SELECT s FROM sp)),
            s1 AS (SELECT user_id, event_id, props FROM r1 WHERE rn = 1),
            r2 AS (
              SELECT user_id, event_id, props, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY event_id DESC) AS rn
              FROM events WHERE event_id > (SELECT s FROM sp)),
            s2 AS (SELECT user_id, event_id, props, event_type
                   FROM r2 WHERE rn = 1),
            fin AS (
              SELECT coalesce(s2.user_id, s1.user_id) AS user_id,
                     CASE WHEN s2.user_id IS NOT NULL
                          THEN s2.event_id ELSE s1.event_id END AS event_id,
                     CASE WHEN s2.user_id IS NOT NULL
                          THEN s2.props ELSE s1.props END AS props,
                     s2.event_type AS e2
              FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id)
            SELECT 'u' || CAST(user_id % 50 AS VARCHAR) AS repo,
                   'p' || CAST(user_id AS VARCHAR) AS path,
                   md5(CAST(event_id AS VARCHAR)) AS commit,
                   sha256(props) AS content_sha256
            FROM fin WHERE e2 IS DISTINCT FROM 'error'
        """,
        "rpsl_roundtrip": """
            SELECT 'ORG-' || CAST(c_custkey AS VARCHAR) AS org_id,
                   CASE WHEN c_custkey % 10 = 0 THEN '' ELSE c_name END
                       AS org_name
            FROM customer
        """,
        "scalar_conversions": """
            SELECT event_id,
                   epoch_ms(CAST(floor(epoch(ts)) * 1000
                            + CAST(floor(value * 100) AS BIGINT) % 1000 AS BIGINT))
                       AS ts_ms,
                   strftime(ts, '%Y-%m-%d %H:00') AS hour_str,
                   CASE WHEN props <> '' THEN props END AS props_norm,
                   CAST(coalesce(value, 0.0) AS DOUBLE) AS value_filled
            FROM events WHERE event_id < 2000
        """,
        "group_max": """
            SELECT user_id, event_type, max(ts) AS max_ts, count(*) AS n,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY user_id, event_type
        """,
        "union_distinct": """
            SELECT DISTINCT user_id, event_type FROM (
              SELECT user_id, event_type FROM events WHERE event_type = 'purchase' AND value > 5
              UNION ALL
              SELECT user_id, event_type FROM events WHERE event_type = 'click' AND value > 5)
        """,
        "insert_if_absent": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)
        """,
        "coalesce_merge": """
            SELECT DISTINCT user_id,
              round(last_value(v IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
                AS last_nonnull_value,
              max(ts) OVER (PARTITION BY user_id) AS last_ts
            FROM (SELECT user_id, event_id, ts,
                         CASE WHEN event_type <> 'view' THEN value END AS v
                  FROM events)
        """,
        "late_filter": """
            SELECT event_type,
                   CAST(sum(CASE WHEN event_id <= 5000 THEN 1 ELSE 0 END) AS BIGINT)
                       AS late_events,
                   count(*) AS total
            FROM events GROUP BY event_type
        """,
        "identity_hash": "SELECT doc_id, sha256(text) AS text_sha256 FROM documents",
        "fourway_left_join": """
            SELECT r_name, count(o_orderkey) AS n_orders,
                   round(sum(o_totalprice), 4) AS revenue
            FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
            LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r_name
        """,
        "dim_join_lang_norm": """
            SELECT dim.lang_full, count(*) AS n_docs
            FROM documents d
            LEFT JOIN (VALUES ('en','english'),('es','spanish'),('de','german'),
                              ('fr','french'),('zh','chinese')) AS dim(lang, lang_full)
              ON d.lang = dim.lang
            GROUP BY dim.lang_full
        """,
        "scalar_subquery_lookup": """
            SELECT o_orderkey, round(o_totalprice, 4) AS total,
                   (SELECT c_name FROM customer c WHERE c.c_custkey = o.o_custkey) AS cust_name
            FROM orders o WHERE o_totalprice > 400000
        """,
        "array_membership_join": """
            SELECT term, count(*) AS n_docs
            FROM documents, (VALUES ('spark'),('merge'),('join'),('window'),('hash')) AS t(term)
            WHERE list_contains(string_split(text, ' '), term)
            GROUP BY term
        """,
        "filtered_scan": """
            SELECT event_id, user_id, round(value, 6) AS value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01 01:00:00'
              AND ts < TIMESTAMP '2024-01-01 03:00:00'
              AND event_type = 'click' AND props IS NOT NULL
        """,
        "validation_quarantine": """
            SELECT CASE WHEN text IS NULL OR length(text) = 0 THEN 'empty'
                        WHEN n_chars < 60 THEN 'too_short'
                        WHEN lang NOT IN ('en','es','de','fr','zh') THEN 'bad_lang'
                        ELSE 'ok' END AS reason,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "topk_per_group": """
            SELECT o_orderpriority, rk, o_orderkey, round(o_totalprice, 4) AS total
            FROM (SELECT *, row_number() OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
                  FROM orders)
            WHERE rk <= 3
        """,
        "windowed_derivative": """
            WITH agg AS (
              SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, event_type,
                     round(avg(value), 6) AS avg_value
              FROM events GROUP BY 1, 2)
            SELECT win_start, event_type, avg_value,
                   CASE WHEN lag(avg_value) OVER w IS NOT NULL
                        THEN round(greatest(avg_value - lag(avg_value) OVER w, 0.0), 6)
                   END AS nn_derivative
            FROM agg WINDOW w AS (PARTITION BY event_type ORDER BY win_start)
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "ngram_jaccard": f"""
            WITH words AS (
              SELECT doc_id, {_WS_TOKENS.format(c='lower(text)')} AS w FROM documents),
            sh AS (
              SELECT doc_id,
                list_distinct(CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
                  ELSE [array_to_string(w, ' ')] END) AS g
              FROM words),
            ex0 AS (SELECT doc_id, unnest(g) AS s FROM sh),
            ex AS (
              SELECT * FROM ex0
              WHERE s IN (SELECT s FROM ex0 GROUP BY s HAVING count(*) <= 100)),
            nsh AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     na.n_sh AS na, nb.n_sh AS nb, count(*) AS inter
              FROM ex a
              JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              JOIN nsh na ON na.doc_id = a.doc_id
              JOIN nsh nb ON nb.doc_id = b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b,
                   round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
            FROM pairs
            WHERE round(CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE), 6) >= 0.12
        """,
        "token_stats": f"""
            SELECT doc_id,
                   len({_WS_TOKENS.format(c='text')}) AS n_tokens,
                   len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS n_bpe_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH t AS (
              SELECT doc_id,
                CAST(len({_WS_TOKENS.format(c='text')}) AS DOUBLE) AS n_tok,
                CAST(length(text) AS DOUBLE) AS n_chars,
                CAST(len(regexp_extract_all(text, '([^A-Za-z0-9\\s])', 1)) AS DOUBLE) AS n_punct,
                CAST({h['en']} AS DOUBLE) AS stop
              FROM documents)
            SELECT doc_id,
              round(0.4 * least(1.0, n_tok / 100.0)
                  + 0.3 * (1.0 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END))
                  + 0.3 * least(1.0, 5.0 * (CASE WHEN n_tok > 0 THEN stop / n_tok ELSE 0.0 END)), 6) AS quality
            FROM t
        """,
        "lang_id": f"""
            WITH t AS (
              SELECT doc_id, {h['en']} AS h_en, {h['es']} AS h_es,
                     {h['de']} AS h_de, {h['fr']} AS h_fr
              FROM documents)
            SELECT doc_id,
              CASE WHEN h_en >= greatest(h_es, h_de, h_fr, 1) THEN 'en'
                   WHEN h_es >= greatest(h_de, h_fr, 1) THEN 'es'
                   WHEN h_de >= greatest(h_fr, 1) THEN 'de'
                   WHEN h_fr >= 1 THEN 'fr'
                   ELSE 'und' END AS lang_guess
            FROM t
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "ann_brute_topk": """
            WITH p AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
            scored AS (
              SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])), 6) AS cos
              FROM p, embeddings c WHERE c.vec_id <> p.vec_id)
            SELECT probe_id, neighbor_id, cos FROM scored
            QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) <= 5
        """,
        "embedding_neardup_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
        """,
        # Recompute every header-derived field of the synthesized media
        # from the deterministic generation rule (multimodal.py
        # synthesize_media): even doc_id -> 24-bit BMP with dims
        # ((n%31)+1, (n%19)+1) and 4-byte-padded rows; odd -> PCM16 mono
        # WAV at 8 kHz with one sample per utf-8 byte (>=1). The Spark
        # side derives the same values by PARSING the actual bytes — a
        # hash mismatch means the codec pair disagrees somewhere.
        "multimodal_features": """
            WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n
                       FROM documents)
            SELECT doc_id AS media_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
                   CAST(CASE WHEN doc_id % 2 = 0
                        THEN 54 + ((3 * ((n % 31) + 1) + 3) // 4) * 4
                                  * ((n % 19) + 1)
                        ELSE 44 + 2 * greatest(n, 1) END AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN doc_id % 2 = 0
                        THEN (n % 31) + 1 ELSE -1 END AS INT) AS width,
                   CAST(CASE WHEN doc_id % 2 = 0
                        THEN (n % 19) + 1 ELSE -1 END AS INT) AS height,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT)
                       AS channels,
                   CAST(CASE WHEN doc_id % 2 = 1
                        THEN 8000 ELSE -1 END AS INT) AS sample_rate,
                   CASE WHEN doc_id % 2 = 1
                        THEN CAST(greatest(n, 1) AS DOUBLE) / 8
                        ELSE CAST(-1 AS DOUBLE) END AS duration_ms
            FROM d
        """,
        # Karp-Rabin winnowing fingerprint replicated in pure SQL: utf-8
        # bytes via hex(encode(text)), window-8 polynomial hashes mod
        # 2^61-1 in HUGEINT, min over windows — byte-equal to the
        # pandas-UDF path (257^7 < 2^61-1, so per-term products need no
        # intermediate reduction and int128 never overflows).
        "rolling_fingerprint": """
            WITH hx AS (
              SELECT doc_id, text, upper(hex(encode(text))) AS h
              FROM documents),
            byt AS (
              SELECT doc_id, text,
                     [16*(strpos('0123456789ABCDEF', h[2*i-1])-1)
                        + (strpos('0123456789ABCDEF', h[2*i])-1)
                      FOR i IN range(1, CAST(len(h)/2 AS BIGINT) + 1)] AS b
              FROM hx)
            SELECT doc_id,
              CASE
                WHEN text IS NULL THEN NULL
                WHEN len(b) = 0 THEN 0
                WHEN len(b) < 8 THEN CAST(list_reduce(
                    [CAST(x AS HUGEINT) FOR x IN b],
                    (acc, x) -> (acc * 257 + x) % 2305843009213693951) AS BIGINT)
                ELSE CAST(list_min(
                    [(CAST(b[i] AS HUGEINT) * 74051159531521793
                      + CAST(b[i+1] AS HUGEINT) * 288136807515649
                      + CAST(b[i+2] AS HUGEINT) * 1121154893057
                      + CAST(b[i+3] AS HUGEINT) * 4362470401
                      + CAST(b[i+4] AS HUGEINT) * 16974593
                      + CAST(b[i+5] AS HUGEINT) * 66049
                      + CAST(b[i+6] AS HUGEINT) * 257
                      + CAST(b[i+7] AS HUGEINT)) % 2305843009213693951
                     FOR i IN range(1, len(b) - 6)]) AS BIGINT)
              END AS rfp
            FROM byt
        """,
        # minhash_lsh / simhash / ann_lsh_topk / ann_ivf_topk /
        # embedding_neardup: rows-only (hash-family internals not
        # reasonably SQL-expressible); verified in tests/test_operators.py.
    }
