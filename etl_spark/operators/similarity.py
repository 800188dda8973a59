"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. Probes are broadcast
  (tiny), the corpus streams through one whole-stage-codegen'd
  projection — no shuffle until the final per-probe top-k aggregation.
- LSH-bucketed ANN (random hyperplanes): the scale path. Each vector
  maps to a small number of buckets; probe compares only within its
  buckets. Deterministic planes derived from a seeded hash.
- Embedding near-dup: cosine >= t pairs via the same LSH buckets.

Float determinism: cosine is computed with a sequential left-fold
(`aggregate`) and rounded to 6 dp so Spark and the DuckDB oracle agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import fan_out


def _dot(a, b):
    # cast each element BEFORE multiplying: float*float rounds to float
    # first, while the oracle (CAST(... AS DOUBLE[])) multiplies doubles
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _topk_per_probe(scored: DataFrame, k: int) -> DataFrame:
    """Bounded two-phase top-k per probe (cos desc, neighbor_id asc).

    An unbounded ``collect_list`` per probe buffers O(|candidates|) rows
    in ONE aggregation buffer — for brute force that is the whole corpus
    per probe, an executor OOM at scale. Instead:

    1. local phase: group by (probe, spark_partition_id) — each buffer
       holds only one input partition's candidates for one probe, bounded
       by spark.sql.files.maxPartitionBytes, then sliced to k;
    2. merge phase: group by probe over the <=k-element partial arrays —
       buffer bounded by n_partitions x k (and flatten+sort+slice is
       O(P k log Pk) driver-free work per probe).

    Ties are deterministic: sort key is (cos desc, neighbor_id asc) via
    the (cos, -neighbor_id) struct ordering.
    """
    item = F.struct(
        F.col("cos"), (-F.col("neighbor_id")).alias("ni"), F.col("neighbor_id")
    )
    local = scored.groupBy("probe_id", F.spark_partition_id().alias("_pid")).agg(
        F.slice(F.sort_array(F.collect_list(item), asc=False), 1, k).alias("part")
    )
    merged = local.groupBy("probe_id").agg(
        F.slice(
            F.array_sort(
                F.flatten(F.collect_list("part")),
                lambda a, b: F.when(a["cos"] > b["cos"], -1)
                .when(a["cos"] < b["cos"], 1)
                .when(a["ni"] > b["ni"], -1)
                .when(a["ni"] < b["ni"], 1)
                .otherwise(0),
            ),
            1,
            k,
        ).alias("top")
    )
    return merged.select("probe_id", F.explode("top").alias("t")).select(
        "probe_id",
        F.col("t.neighbor_id").alias("neighbor_id"),
        F.col("t.cos").alias("cos"),
    )


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (excluding itself).

    Plan: broadcast(probes) cross-join corpus -> one projection computes
    cosine -> per-probe top-k via max_by-style aggregation (no global
    sort). Returns (probe_id, neighbor_id, cos) ordered deterministically.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_col(F.col("pv"), F.col("cv")).alias("cos"),
        )
    )
    return _topk_per_probe(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """Random-hyperplane LSH: sign pattern of n_planes projections -> one
    integer bucket. numpy matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (M @ planes.T) > 0  # (batch, n_planes)
        return pd.Series((signs @ powers).astype(np.int64))

    return bucket


def lsh_multitable_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """Multi-table hyperplane LSH: n_tables independent sign-hash tables.

    Returns array<long> of one bucket id per table (table index encoded in
    the high bits, so ids never collide across tables). A single table's
    recall decays as (1 - theta/pi)^n_planes; the union of L tables lifts
    it to 1-(1-p)^L — the standard recall/cost dial for ANN at scale.
    One numpy einsum per Arrow batch computes all tables at once.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_planes, dim).astype(np.float64)
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    offsets = (np.arange(n_tables).astype(np.int64) + 1) << np.int64(n_planes + 1)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = np.einsum("tpd,nd->ntp", planes, M) > 0  # (batch, tables, planes)
        ids = signs @ powers + offsets  # (batch, tables)
        return pd.Series(list(ids))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share any of the probe's n_tables
    LSH buckets (multi-table hyperplane LSH).

    At 100 TB the bucket equi-join replaces the cross join: cost is
    O(sum of bucket sizes probed) with an n_tables fan-out knob, and
    buckets are hash-partitioned so the shuffle is uniform. Candidate
    pairs are deduped BEFORE the cosine projection so each pair's
    O(dim) work is paid once. Recall is tested vs brute force."""
    b = lsh_multitable_udf(dim, n_planes, n_tables, seed)
    # the bucket join and the pair dedup run SLIM (two long ids): the
    # wide vector column never crosses the bucket-join shuffle (it used
    # to ride along x n_tables) and the dedup plans as a HashAggregate
    # over fixed-width keys — carrying vectors through dropDuplicates
    # would plan first(array) as a SortAggregate (per-partition sort of
    # every candidate pair)
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(b(F.col(vec_col))).alias("bucket"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.explode(b(F.col(vec_col))).alias("bucket"),
    )
    pairs = (
        F.broadcast(p)
        .join(c, "bucket")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id")
        .dropDuplicates()
    )
    # vectors attach once per deduped pair: probes re-broadcast (same
    # small side), corpus via one equi-join on the id
    scored = (
        pairs.join(
            F.broadcast(
                probes.select(
                    F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
                )
            ),
            "probe_id",
        )
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            ),
            "neighbor_id",
        )
        .select(
            "probe_id",
            "neighbor_id",
            cosine_col(F.col("pv"), F.col("cv")).alias("cos"),
        )
    )
    return _topk_per_probe(scored, k)


def _ivf_centroids(df: DataFrame, n_centroids: int, dim: int,
                   id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic centroid pick: the n_centroids vectors with the
    smallest xxhash64(id) — a seeded uniform sample that is stable across
    partitionings and cluster sizes (no kmeans iterations: for IVF
    routing, sampled centroids cost one tiny job and keep the operator
    deterministic; quality is tested as recall vs brute force)."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("_h", F.xxhash64("id"))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    M = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """array<vec> -> array of the nprobe nearest centroid ids (cosine),
    one numpy matmul per Arrow batch."""
    C = centroids  # (n_centroids, dim), L2-normalized

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T  # (batch, n_centroids)
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return assign


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is routed to its
    single nearest centroid's posting list; each probe searches only its
    ``nprobe`` nearest lists.

    The 100 TB shape: posting lists are hash-partitioned by centroid id,
    the probe-side join is a broadcast equi-join on centroid id, and the
    per-pair cosine + bounded top-k reuse the same partition-bounded
    machinery as the other ANN paths. recall/cost dial = nprobe /
    n_centroids (IVF-Flat; quality tested vs brute force)."""
    cents = _ivf_centroids(corpus, n_centroids, dim, id_col, vec_col)
    route1 = _ivf_assign_udf(cents, 1)
    routeN = _ivf_assign_udf(cents, nprobe)
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.element_at(route1(F.col(vec_col)), 1).alias("cluster"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        F.explode(routeN(F.col(vec_col))).alias("cluster"),
    )
    scored = (
        F.broadcast(p)
        .join(c, "cluster")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            cosine_col(F.col("pv"), F.col("cv")).alias("cos"),
        )
    )
    return _topk_per_probe(scored, k)


def embedding_neardup_exact(
    df: DataFrame,
    threshold: float = 0.95,
    n_blocks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT near-duplicate pairs (cosine >= threshold) — the
    verification baseline for the LSH path, and the fallback when
    recall must be 1.0.

    All-pairs is inherently O(n^2); what scale design controls is the
    SHAPE of that quadratic work. A naive ``a JOIN b ON a.id < b.id``
    has no equi-key, so Spark plans a broadcast-nested-loop with one
    side replicated everywhere. Instead: hash every vector into one of
    ``n_blocks`` blocks and enumerate the B(B+1)/2 block *cells*; each
    cell is an equi-join of two block slices, so the quadratic work is
    sliced into uniformly-sized, independently-scheduled tasks (the
    classic block-grid / "triangle" partitioning of all-pairs joins).
    n_blocks tunes task granularity: cells ~ (n/B)^2 comparisons.
    """
    spark = df.sparkSession
    v = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    cells = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    a = v.select(F.col("id").alias("ida"), F.col("v").alias("va"),
                 F.col("blk").alias("bi"))
    b = v.select(F.col("id").alias("idb"), F.col("v").alias("vb"),
                 F.col("blk").alias("bj"))
    pairs = (
        F.broadcast(cells)
        .join(a, "bi")
        .join(b, "bj")
        .where(
            (F.col("bi") < F.col("bj"))
            | ((F.col("bi") == F.col("bj")) & (F.col("ida") < F.col("idb")))
        )
    )
    return pairs.select(
        F.least("ida", "idb").alias("id_a"),
        F.greatest("ida", "idb").alias("id_b"),
        cosine_col(F.col("va"), F.col("vb")).alias("cos"),
    ).where(F.col("cos") >= threshold)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vectors: cosine >= threshold, candidates from
    multi-table LSH buckets (high threshold -> high per-table collision
    probability, so few tables suffice). Pairs dedup before the cosine."""
    b = lsh_multitable_udf(dim, n_planes, n_tables, seed)
    # slim self-join + slim pair dedup (two long ids -> HashAggregate);
    # the vectors attach AFTER dedup via two id equi-joins, so they
    # neither ride the bucket-join shuffle x n_tables nor force the
    # dedup into a SortAggregate over array buffers
    v = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.explode(b(F.col(vec_col))).alias("bucket"),
    )
    x, y = v.alias("x"), v.alias("y")
    pairs = (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates()
    )
    vec = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    return (
        pairs.join(vec.withColumnRenamed("_vid", "id_a"), "id_a")
        .withColumnRenamed("_v", "va")
        .join(vec.withColumnRenamed("_vid", "id_b"), "id_b")
        .withColumnRenamed("_v", "vb")
        .select("id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
