"""Deterministic, distributed CDC-log generator + single-threaded oracle.

The generator is pure Spark expressions over ``spark.range`` — no Python in
the hot path, so a 10^8-event log generates at JVM speed and the SAME
(seed, knobs) always yields the SAME log regardless of parallelism. The
oracle reducer is the intentionally-naive single-threaded reference the
engine must byte-match (FIXTURES.md §4) — it mirrors the reference repo's
identity-hash upsert semantics (thehive_to_dwh/transform_load.py:196-204,
replication_otrs_to_dwh/postgresql/upload.py:35-308): per-key
last-writer-wins in lsn order, I/U overwrite, D delete.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import EVENT_SCHEMA

RAW_LANGS = [
    "Python", "python", "py3", "C", "c", "Rust", "rust", "Go", "golang",
    "Markdown", "markdown", "JAVA", "java", "C++", "cpp", "Shell", "sh",
]


@dataclass(frozen=True)
class SchemaEvent:
    """A schema-evolution control event injected at a fixed lsn."""

    lsn: int
    kind: str                 # add | rename | widen
    column: str
    new_name: str | None = None
    new_type: str | None = None


@dataclass(frozen=True)
class GenConfig:
    n_events: int = 10_000
    n_keys: int = 500
    n_repos: int = 20
    hot_frac: float = 0.30     # fraction of events hitting the single hot repo
    hot_keys: int = 25         # keys living in the hot repo
    seed: int = 42
    dup_rate: float = 0.0      # duplicate-delivery fraction (same lsn twice)
    p_insert: float = 0.50
    p_update: float = 0.40     # remainder is delete
    max_content_reps: int = 60  # content = sha-chunk repeated 1..N times (~64B..~4KB)
    schema_events: tuple[SchemaEvent, ...] = field(default_factory=tuple)
    # dynamic columns carry values in `extra` once added; prob a data event
    # after the add carries a value for the column:
    extra_value_rate: float = 0.6
    # --- skewed / sparse-update workload knobs (all off by default; the
    # legacy hot_frac/hot_keys single-hot-repo path is untouched when so)
    # zipf_s > 0: repo popularity follows a Zipf(s) law over n_repos
    # (rank-1 repo hottest), keys spread uniformly WITHIN each repo —
    # the hot-repo long-tail shape real VCS traffic has, which stresses
    # bucket salting and skew-adaptive compaction:
    zipf_s: float = 0.0
    # update_focus_keys > 0: U/D events target ONLY the first N keys of
    # the keyspace (the hot working set), while inserts still spread over
    # all n_keys — the sparse-update regime where file-level CoW should
    # rewrite O(working set) files, not O(table):
    update_focus_keys: int = 0
    # base lsn offset: generated lsns are base_lsn+1 .. base_lsn+n_events
    # (continue a log after a pre-materialized base load):
    base_lsn: int = 0
    # key index offset: keys draw from [key_offset, key_offset+n_keys)
    # instead of [0, n_keys) — lets a follow-up log target a keyspace
    # DISJOINT from a pre-materialized base (append-only ingest: every
    # event a genuinely new key, no upsert collisions). The derived
    # paths still interleave lexicographically with the base's
    # (file_<k>.txt string order), which is what makes this the
    # adversarial workload for range-pruned CoW:
    key_offset: int = 0


def _u(col, seed: int, tag: str):
    """Deterministic uniform [0,1) derived from a column + tag."""
    h = F.xxhash64(F.lit(seed), F.lit(tag), col)
    return (F.pmod(h, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def generate_events(spark: SparkSession, cfg: GenConfig) -> DataFrame:
    """Emit the ordered change log as a DataFrame with EVENT_SCHEMA columns.

    Entirely JVM-side (range + hash expressions): deterministic under any
    partitioning, embarrassingly parallel, no Python serialization.
    """
    if cfg.key_offset and (cfg.zipf_s > 0 or cfg.hot_frac > 0):
        # key_offset assumes a zero-based key index: zipf's rank->repo
        # map (repo = key / keys_per_repo) would silently yield repo
        # ranks >= n_repos, and the legacy hot-repo threshold
        # (key < hot_keys) would silently never match — wrong repo
        # distributions with no error. Offset logs are the append-only
        # fixture; generate them with hot_frac=0 and zipf_s=0.
        raise ValueError(
            "key_offset requires hot_frac=0 and zipf_s=0 (uniform keys); "
            f"got hot_frac={cfg.hot_frac}, zipf_s={cfg.zipf_s}"
        )
    df = spark.range(
        cfg.base_lsn + 1, cfg.base_lsn + cfg.n_events + 1
    ).withColumnRenamed("id", "lsn")
    lsn = F.col("lsn")

    # --- op mix (chosen before the key so update_focus_keys can remap)
    r_op = _u(lsn, cfg.seed, "op")
    op = (
        F.when(r_op < cfg.p_insert, F.lit("I"))
        .when(r_op < cfg.p_insert + cfg.p_update, F.lit("U"))
        .otherwise(F.lit("D"))
    )

    if cfg.zipf_s > 0:
        # Zipf(s) repo popularity via inverse-CDF lookup: the CDF over
        # n_repos is a Python-computed literal array; per row, the repo
        # rank = how many CDF entries fall below u (an O(n_repos)
        # F.aggregate over the literal array — pure JVM codegen, no
        # Python in the hot path). Keys spread uniformly WITHIN a repo,
        # so hot repos get proportionally more events per key too.
        w = [1.0 / (r + 1) ** cfg.zipf_s for r in range(cfg.n_repos)]
        tot = sum(w)
        acc, cdf = 0.0, []
        for x in w:
            acc += x
            cdf.append(acc / tot)
        u = _u(lsn, cfg.seed, "zr")
        rank = F.aggregate(
            F.array(*[F.lit(c) for c in cdf[:-1]]),  # last entry = 1.0
            F.lit(0),
            lambda a, c: a + F.when(u >= c, 1).otherwise(0),
        ).cast("long")
        keys_per_repo = max(cfg.n_keys // cfg.n_repos, 1)
        key_idx = rank * keys_per_repo + F.pmod(
            F.xxhash64(F.lit(cfg.seed), F.lit("zk"), lsn), F.lit(keys_per_repo)
        )
        repo_of = (F.col("_k") / keys_per_repo).cast("long")
    else:
        # legacy single-hot-repo skew (FIXTURES.md §1: ~30% one repo)
        is_hot = _u(lsn, cfg.seed, "hot") < cfg.hot_frac
        hot_key = F.pmod(F.xxhash64(F.lit(cfg.seed), F.lit("hk"), lsn), F.lit(cfg.hot_keys))
        cold_span = max(cfg.n_keys - cfg.hot_keys, 1)
        cold_key = cfg.hot_keys + F.pmod(
            F.xxhash64(F.lit(cfg.seed), F.lit("ck"), lsn), F.lit(cold_span)
        )
        key_idx = F.when(is_hot, hot_key).otherwise(cold_key).cast("long")
        repo_of = F.when(F.col("_k") < cfg.hot_keys, F.lit(0)).otherwise(
            1 + F.pmod(
                F.xxhash64(F.lit(cfg.seed), F.lit("r"), F.col("_k")),
                F.lit(max(cfg.n_repos - 1, 1)),
            )
        )

    if cfg.update_focus_keys > 0:
        # sparse-update regime: U/D target only the hot working set (the
        # first N keys); inserts keep spreading over the full keyspace
        focus = F.pmod(
            F.xxhash64(F.lit(cfg.seed), F.lit("uf"), lsn),
            F.lit(cfg.update_focus_keys),
        ).cast("long")
        key_idx = F.when(op != "I", focus).otherwise(key_idx)

    if cfg.key_offset:
        # shift the whole keyspace: meant for legacy mode with
        # hot_frac=0 (zipf's rank->repo map and the hot-repo threshold
        # both assume a zero-based key index)
        key_idx = key_idx + F.lit(cfg.key_offset)

    # key -> (repo, path), derived from the key index alone so the same
    # key always lands in the same file whatever event produced it
    df = df.withColumn("_k", key_idx)
    repo_idx = repo_of
    repo = F.concat(F.lit("org"), (repo_idx % 7).cast("string"), F.lit("/repo"), repo_idx.cast("string"))
    key_idx = F.col("_k")
    depth = F.pmod(F.xxhash64(F.lit(cfg.seed), F.lit("d"), key_idx), F.lit(4))
    path = F.concat(
        F.lit("src/"),
        F.when(depth > 0, F.concat(F.lit("pkg"), (key_idx % 13).cast("string"), F.lit("/"))).otherwise(F.lit("")),
        F.when(depth > 1, F.concat(F.lit("mod"), (key_idx % 5).cast("string"), F.lit("/"))).otherwise(F.lit("")),
        F.lit("file_"), key_idx.cast("string"), F.lit(".txt"),
    )

    # --- payload
    commit = F.substring(F.sha2(F.concat(F.lit(f"c{cfg.seed}"), lsn.cast("string")), 256), 1, 40)
    lang_arr = F.array(*[F.lit(s) for s in RAW_LANGS])
    lang = F.element_at(lang_arr, (F.pmod(F.xxhash64(F.lit(cfg.seed), F.lit("lg"), key_idx), F.lit(len(RAW_LANGS))) + 1).cast("int"))
    chunk = F.sha2(F.concat_ws("|", repo, path, commit), 256)  # 64 chars
    n_rep = (
        1 + F.pmod(F.xxhash64(F.lit(cfg.seed), F.lit("len"), lsn), F.lit(cfg.max_content_reps))
    ).cast("int")
    content = F.when(op == "D", F.lit(None).cast("string")).otherwise(F.repeat(chunk, n_rep))

    ts = F.timestamp_seconds(
        F.lit(1_700_000_000)
        + lsn * 2
        + F.pmod(F.xxhash64(F.lit(cfg.seed), F.lit("j"), lsn), F.lit(7))
        - 3
    )

    df = df.select(
        lsn,
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        ts.alias("ts"),
    )

    # --- dynamic `extra` values for columns added by schema events
    extra_entries = []
    for se in cfg.schema_events:
        if se.kind != "add":
            continue
        # the column's name at event time follows later renames; data events
        # between add and rename carry the original name, after carry new one
        renames = sorted(
            [r for r in cfg.schema_events if r.kind == "rename"], key=lambda r: r.lsn
        )
        name_col = F.lit(se.column)
        applicable = F.lit(True) & (F.col("lsn") > se.lsn)
        for r in renames:
            name_col = F.when(
                (F.col("lsn") > r.lsn) & (name_col == r.column), F.lit(r.new_name)
            ).otherwise(name_col)
        carries = applicable & (_u(F.col("lsn"), cfg.seed, f"x_{se.column}") < cfg.extra_value_rate)
        val = F.pmod(F.xxhash64(F.lit(cfg.seed), F.lit(f"xv_{se.column}"), F.col("lsn")), F.lit(100_000)).cast("string")
        extra_entries.append((name_col, F.when(carries & (F.col("op") != "D"), val)))
    if extra_entries:
        m = F.map_filter(
            F.map_from_arrays(
                F.array(*[k for k, _ in extra_entries]),
                F.array(*[v for _, v in extra_entries]),
            ),
            lambda _, v: v.isNotNull(),
        )
        df = df.withColumn("extra", m)
    else:
        df = df.withColumn("extra", F.lit(None).cast("map<string,string>"))

    # --- schema-change control rows replace the data row at their lsn
    if cfg.schema_events:
        kind = F.lit(None).cast("string")
        column = F.lit(None).cast("string")
        new_name = F.lit(None).cast("string")
        new_type = F.lit(None).cast("string")
        is_schema = F.lit(False)
        for se in cfg.schema_events:
            hit = F.col("lsn") == se.lsn
            is_schema = is_schema | hit
            kind = F.when(hit, F.lit(se.kind)).otherwise(kind)
            column = F.when(hit, F.lit(se.column)).otherwise(column)
            new_name = F.when(hit, F.lit(se.new_name)).otherwise(new_name)
            new_type = F.when(hit, F.lit(se.new_type)).otherwise(new_type)
        sc = F.when(is_schema, F.struct(kind.alias("kind"), column.alias("column"),
                                        new_name.alias("new_name"), new_type.alias("new_type")))
        df = (
            df.withColumn("schema_change", sc)
            .withColumn("op", F.when(is_schema, F.lit("S")).otherwise(F.col("op")))
            .withColumn("content", F.when(is_schema, F.lit(None).cast("string")).otherwise(F.col("content")))
            .withColumn("extra", F.when(is_schema, F.lit(None).cast("map<string,string>")).otherwise(F.col("extra")))
        )
    else:
        df = df.withColumn("schema_change", F.lit(None).cast(EVENT_SCHEMA["schema_change"].dataType))

    # --- duplicate deliveries (same lsn appears twice) for idempotency tests
    if cfg.dup_rate > 0:
        dups = df.where(_u(F.col("lsn"), cfg.seed, "dup") < cfg.dup_rate)
        df = df.unionAll(dups)

    return df.select([f.name for f in EVENT_SCHEMA.fields])


def write_events(spark: SparkSession, cfg: GenConfig, out_dir: str, n_files: int = 32) -> str:
    """Materialize the log to parquet, ordered-by-lsn within files."""
    (
        generate_events(spark, cfg)
        .repartitionByRange(n_files, "lsn")
        .sortWithinPartitions("lsn")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


# --------------------------------------------------------------------------
# Oracle: single-threaded reducer (the spec the distributed engine matches).
# --------------------------------------------------------------------------

def oracle_reduce(rows: list) -> tuple[dict, list[tuple[str, str]]]:
    """Replay collected event rows in lsn order; return (state, final_schema).

    state: {(repo, path): {col: value}} including content_sha256 and
    _last_lsn. final_schema: ordered [(dynamic_col_name, ddl_type)].
    Mirrors reference upsert semantics: I/U overwrite the whole row, D
    deletes; schema events add/rename/widen dynamic columns. Duplicate
    deliveries of the same lsn are idempotent no-ops.
    """
    from etl_spark.functions.udfs import LANG_CANON

    state: dict = {}
    dyn_cols: list[list] = []  # [name, ddl_type]
    seen_lsn: set[int] = set()
    for r in sorted(rows, key=lambda r: r["lsn"]):
        if r["lsn"] in seen_lsn:
            continue
        seen_lsn.add(r["lsn"])
        if r["op"] == "S":
            sc = r["schema_change"]
            if sc["kind"] == "add":
                dyn_cols.append([sc["column"], sc["new_type"] or "string"])
            elif sc["kind"] == "rename":
                for c in dyn_cols:
                    if c[0] == sc["column"]:
                        c[0] = sc["new_name"]
                for v in state.values():
                    if sc["column"] in v:
                        v[sc["new_name"]] = v.pop(sc["column"])
            elif sc["kind"] == "widen":
                for c in dyn_cols:
                    if c[0] == sc["column"]:
                        c[1] = sc["new_type"]
            continue
        key = (r["repo"], r["path"])
        if r["op"] == "D":
            state.pop(key, None)
            continue
        raw_lang = r["lang"]
        lang = LANG_CANON.get(raw_lang.lower(), raw_lang.lower()) if raw_lang else None
        row = {
            "repo": r["repo"],
            "path": r["path"],
            "commit": r["commit"],
            "lang": lang,
            "content": r["content"],
            "content_sha256": hashlib.sha256(r["content"].encode()).hexdigest()
            if r["content"] is not None
            else None,
            "_last_lsn": r["lsn"],
        }
        extra = r["extra"] or {}
        # a data event's extra keys are event-time names; renames AFTER the
        # event's lsn re-home the value (engine does the same remap)
        for k, v in extra.items():
            row[k] = v
        state[key] = row
    # normalize dynamic values to final names/types
    final_schema = [(c[0], c[1]) for c in dyn_cols]
    for v in state.values():
        for name, ddl in final_schema:
            val = v.get(name)
            if val is None:
                v[name] = None
            elif ddl in ("int", "integer", "bigint", "long"):
                v[name] = int(val)
            elif ddl == "double":
                v[name] = float(val)
            else:
                v[name] = str(val)
    return state, final_schema
