"""Driver-harness queries: one per operator family from SURVEY.md §2,
plus the training-data operators. Each function takes (spark, sf_dir) and
returns a DataFrame whose column names/values match the DuckDB oracle SQL
in __spark_entry__.py exactly (order-insensitive).

Determinism rules shared with the oracles:
- floats rounded to 6 dp after every aggregate/derived step;
- ties broken by an id column;
- session TZ pinned to UTC (driver may hand us any session).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .cdc.dedup import dedup_last_writer_slim
from .operators import dedup_text, similarity, textstats
from .operators.multimodal import extract_features, synthesize_media
from .sources.readers import table


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# --------------------------------------------------------------------------
# CDC / ingest operator families (on the `events` change-stream table)
# --------------------------------------------------------------------------

def q_window_dedup(spark, sf_dir) -> DataFrame:
    """D2: per-key max-LSN dedup window (SURVEY.md §2.6)."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    last = dedup_last_writer_slim(ev, ["user_id"], "event_id")
    return last.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 6).alias("last_value"),
    )


def q_cdc_merge_upsert(spark, sf_dir) -> DataFrame:
    """K1 upsert semantics as a query: final state per key after replaying
    the stream; 'error' acts as the delete op."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    last = dedup_last_writer_slim(ev, ["user_id"], "event_id")
    return last.where(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
        F.round("value", 6).alias("last_value"),
    )


def q_cdc_replay_snapshot(spark, sf_dir) -> DataFrame:
    """Flagship: the FULL engine (dedup -> CoW MERGE -> snapshot commit)
    replaying `events` mapped to a repo CDC log; returns the materialized
    table. Oracle: last-writer-wins SQL over the same mapping."""
    import tempfile

    _prep(spark)
    from .cdc.lake import SnapshotTable
    from .cdc.runner import replay
    from .cdc.schema import EVENT_SCHEMA

    ev = table(spark, sf_dir, "events")
    log = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
        F.concat(F.lit("u"), (F.col("user_id") % 50).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("user_id").cast("string")).alias("path"),
        F.md5(F.col("event_id").cast("string")).alias("commit"),
        F.lit("Python").alias("lang"),
        F.when(F.col("event_type") != "error", F.col("props")).alias("content"),
        F.col("ts"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(None).cast(EVENT_SCHEMA["schema_change"].dataType).alias("schema_change"),
    )
    # Session-scoped table dir: outlives this call so the returned scan
    # stays LAZY (no driver-side collect — at 100x the snapshot would OOM
    # the driver). Cleaned up at interpreter exit.
    import atexit

    root = tempfile.mkdtemp(prefix="etl_spark_replay_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    t = SnapshotTable(spark, root, n_buckets=8)
    replay(spark, log, t, batch_size=4000)
    return t.read().select(
        "repo", "path", "commit", "content", "content_sha256",
        F.col("_last_lsn").alias("last_lsn"),
    )


def q_group_max(spark, sf_dir) -> DataFrame:
    """A1/S2: hash aggregate with max/count/sum (hive group-by scan)."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max("ts").alias("max_ts"),
        F.count("*").alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def q_union_distinct(spark, sf_dir) -> DataFrame:
    """A7/S1: UNION-dedup across scan branches."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    a = ev.where((F.col("event_type") == "purchase") & (F.col("value") > 5)).select(
        "user_id", "event_type"
    )
    b = ev.where((F.col("event_type") == "click") & (F.col("value") > 5)).select(
        "user_id", "event_type"
    )
    return a.union(b).distinct()


def q_insert_if_absent(spark, sf_dir) -> DataFrame:
    """K2/P8: left-anti 'insert only when missing' keyset — customers with
    no event activity (broadcast anti-join)."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    return cust.select("c_custkey").join(
        F.broadcast(ev.select("user_id").distinct()),
        cust.c_custkey == F.col("user_id"),
        "left_anti",
    )


def q_coalesce_merge(spark, sf_dir) -> DataFrame:
    """D2/F6 resolve_doubles: last NON-NULL value per field per key
    (host_available_info_from_hive_to_dwh/main.py:88-103 semantics)."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "view", F.col("value"))
    # max_by with a single-value buffer (null ordering keys are ignored by
    # the max, so null v rows never win): HashAggregate with map-side
    # partial combine. The earlier collect_list+sort_array buffered a hot
    # key's ENTIRE history in one aggregation buffer — an executor OOM at
    # 100x scale.
    picked = ev.groupBy("user_id").agg(
        F.max_by(v, F.when(v.isNotNull(), F.col("event_id"))).alias("last_v"),
        F.max("ts").alias("last_ts"),
    )
    return picked.select(
        "user_id",
        F.round(F.col("last_v"), 6).alias("last_nonnull_value"),
        "last_ts",
    )


def q_late_filter(spark, sf_dir) -> DataFrame:
    """D5: watermark accounting — late vs applied per type."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("event_id") <= 5000, 1).otherwise(0)).alias("late_events"),
        F.count("*").alias("total"),
    )


def q_identity_hash(spark, sf_dir) -> DataFrame:
    """F1/D1: per-row identity hash (sha256) — the engine invariant."""
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha256"))


# --------------------------------------------------------------------------
# joins / scans / projections
# --------------------------------------------------------------------------

def q_fourway_left_join(spark, sf_dir) -> DataFrame:
    """J1/S5: 4-way left-outer dimension join + rollup."""
    _prep(spark)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey, "left")
        .join(r, n.n_regionkey == r.r_regionkey, "left")
    )
    return j.groupBy("r_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )


def q_dim_join_lang_norm(spark, sf_dir) -> DataFrame:
    """J3/F12: broadcast dimension join for canonicalization."""
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    dim = spark.createDataFrame(
        [("en", "english"), ("es", "spanish"), ("de", "german"),
         ("fr", "french"), ("zh", "chinese")],
        "lang string, lang_full string",
    )
    return (
        docs.join(F.broadcast(dim), "lang", "left")
        .groupBy("lang_full")
        .agg(F.count("*").alias("n_docs"))
    )


def q_scalar_subquery_lookup(spark, sf_dir) -> DataFrame:
    """J5: correlated scalar-subquery FK lookup — Catalyst decorrelates
    it to a join (the reference executes it per row; upload.py:281-282)."""
    _prep(spark)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice, 4) AS total,
               (SELECT c_name FROM customer c WHERE c.c_custkey = o.o_custkey) AS cust_name
        FROM orders o
        WHERE o_totalprice > 400000
        """
    )


def q_array_membership_join(spark, sf_dir) -> DataFrame:
    """J9: array-membership join (tags ∋ level_name, insert.py:217-225)."""
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    terms = spark.createDataFrame(
        [("spark",), ("merge",), ("join",), ("window",), ("hash",)], "term string"
    )
    words = F.split(F.col("text"), " ")
    return (
        docs.withColumn("words", words)
        .join(F.broadcast(terms), F.array_contains(F.col("words"), F.col("term")))
        .groupBy("term")
        .agg(F.count("*").alias("n_docs"))
    )


def q_filtered_scan(spark, sf_dir) -> DataFrame:
    """P2+P4+P5: time-window + equality + not-null predicates, projected —
    all pushed into the parquet scan (asserted in tests/test_plans)."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= "2024-01-01 01:00:00")
        & (F.col("ts") < "2024-01-01 03:00:00")
        & (F.col("event_type") == "click")
        & (F.col("props").isNotNull())
    ).select("event_id", "user_id", F.round("value", 6).alias("value"))


def q_validation_quarantine(spark, sf_dir) -> DataFrame:
    """P6: row validation with reject reasons -> quarantine counts."""
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    reason = (
        F.when(F.col("text").isNull() | (F.length("text") == 0), "empty")
        .when(F.col("n_chars") < 60, "too_short")
        .when(~F.col("lang").isin("en", "es", "de", "fr", "zh"), "bad_lang")
        .otherwise("ok")
    )
    return docs.groupBy(reason.alias("reason")).agg(F.count("*").alias("n"))


def q_topk_per_group(spark, sf_dir) -> DataFrame:
    """§2.8: top-k per group via ranking window."""
    _prep(spark)
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_orderpriority",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("total"),
        )
    )


def q_windowed_derivative(spark, sf_dir) -> DataFrame:
    """S7/A5: 10-minute windowed mean + non-negative derivative
    (influxdb_to_dwh/extract.py:38-40 semantics)."""
    _prep(spark)
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "10 minutes").alias("win"), "event_type"
    ).agg(F.round(F.avg("value"), 6).alias("avg_value"))
    agg = agg.select(F.col("win.start").alias("win_start"), "event_type", "avg_value")
    w = W.partitionBy("event_type").orderBy("win_start")
    prev = F.lag("avg_value").over(w)
    return agg.withColumn(
        "nn_derivative",
        F.when(prev.isNotNull(), F.round(F.greatest(F.col("avg_value") - prev, F.lit(0.0)), 6)),
    )


# --------------------------------------------------------------------------
# training-data operators
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir) -> DataFrame:
    _prep(spark)
    return dedup_text.exact_dedup(table(spark, sf_dir, "documents"))


def q_ngram_jaccard(spark, sf_dir) -> DataFrame:
    _prep(spark)
    return dedup_text.ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=0.12, n=2, max_df=100
    )


def q_minhash_lsh(spark, sf_dir) -> DataFrame:
    _prep(spark)
    return dedup_text.minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), threshold=0.5, n_hashes=32, bands=16, shingle_n=2
    )


def q_simhash(spark, sf_dir) -> DataFrame:
    _prep(spark)
    return dedup_text.simhash_pairs(table(spark, sf_dir, "documents"), max_hamming=16)


def q_token_stats(spark, sf_dir) -> DataFrame:
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        textstats.token_count(c).alias("n_tokens"),
        textstats.bpe_token_count(c).alias("n_bpe_tokens"),
    )


def q_quality_score(spark, sf_dir) -> DataFrame:
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.quality_score(F.col("text")).alias("quality"))


def q_lang_id(spark, sf_dir) -> DataFrame:
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", textstats.lang_id(F.col("text")).alias("lang_guess"))


def q_fingerprint(spark, sf_dir) -> DataFrame:
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.fingerprint_md5(F.col("text")).alias("fingerprint")
    )


def q_rolling_fingerprint(spark, sf_dir) -> DataFrame:
    """Rolling-hash winnowing fingerprint (pandas UDF; rows-only oracle)."""
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.rolling_fingerprint(F.col("text")).alias("rfp")
    )


def q_ann_brute_topk(spark, sf_dir) -> DataFrame:
    _prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, probes, k=5)


def q_ann_lsh_topk(spark, sf_dir) -> DataFrame:
    """LSH-bucketed ANN (scale path; recall vs brute force tested in
    tests/test_operators.py — rows-only oracle here)."""
    _prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 10)
    return similarity.lsh_topk(emb, probes, k=5)


def q_embedding_neardup(spark, sf_dir) -> DataFrame:
    _prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    return similarity.embedding_neardup_pairs(emb, threshold=0.3, n_planes=6, n_tables=8)


def q_multimodal_features(spark, sf_dir) -> DataFrame:
    """Multimodal plumbing: binary payload -> mapInPandas feature extract.
    (decode stubbed deterministically — see operators/multimodal.py)."""
    _prep(spark)
    docs = table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return extract_features(media).select(
        "media_id", "n_bytes", "sha256", "width", "height"
    )


QUERIES = {
    "window_dedup": q_window_dedup,
    "cdc_merge_upsert": q_cdc_merge_upsert,
    "cdc_replay_snapshot": q_cdc_replay_snapshot,
    "group_max": q_group_max,
    "union_distinct": q_union_distinct,
    "insert_if_absent": q_insert_if_absent,
    "coalesce_merge": q_coalesce_merge,
    "late_filter": q_late_filter,
    "identity_hash": q_identity_hash,
    "fourway_left_join": q_fourway_left_join,
    "dim_join_lang_norm": q_dim_join_lang_norm,
    "scalar_subquery_lookup": q_scalar_subquery_lookup,
    "array_membership_join": q_array_membership_join,
    "filtered_scan": q_filtered_scan,
    "validation_quarantine": q_validation_quarantine,
    "topk_per_group": q_topk_per_group,
    "windowed_derivative": q_windowed_derivative,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "token_stats": q_token_stats,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "rolling_fingerprint": q_rolling_fingerprint,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_neardup": q_embedding_neardup,
    "multimodal_features": q_multimodal_features,
}
