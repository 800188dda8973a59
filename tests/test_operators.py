"""Operator-quality tests for the non-SQL-expressible operators (the
rows-only entries of __spark_entry__.py) plus the dual-path UDF proofs.

- MinHash+LSH: recall of planted near-duplicates, est_jaccard accuracy
  vs exact n-gram Jaccard.
- SimHash: identical texts collide at hamming 0; light perturbations
  stay within the band threshold; unrelated texts don't pair.
- ANN LSH: recall@k vs the exact brute-force top-k on the driver-
  provided embeddings table.
- rolling_fingerprint: deterministic, equal for equal texts, robust to
  a prefix shift (locality property of winnowing).
- Arrow-vs-JVM dual path: pandas-UDF sha256/lang-norm == JVM-native
  expressions, and a full replay with use_arrow_udfs=True byte-matches
  the default replay.
- Multimodal plumbing: mapInPandas feature extraction and frame
  sampling produce exact byte counts / hashes / offsets.
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_spark.operators import dedup_text, similarity
from etl_spark.operators.multimodal import extract_features, frame_sample, synthesize_media
from etl_spark.operators.textstats import rolling_fingerprint

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# text near-dup
# --------------------------------------------------------------------------

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the rain falls softly on the old roof"
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """60 distinct docs + 3 planted near-dup pairs + 1 exact dup pair."""
    rows = []
    for i in range(60):
        rows.append((i, f"document number {i} " + " ".join(f"tok{i}_{j}" for j in range(30))))
    rows.append((100, BASE))
    rows.append((101, BASE.replace("lazy", "sleepy")))            # near-dup of 100
    rows.append((102, BASE + " extra trailing words here"))       # near-dup of 100
    rows.append((103, BASE))                                      # exact dup of 100
    rows.append((104, "completely different content about spark merge join window hash"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_finds_planted_pairs(planted_docs):
    pairs = dedup_text.minhash_lsh_pairs(
        planted_docs, threshold=0.5, n_hashes=32, bands=16, shingle_n=2
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (100, 103) in got, "exact dup must collide in every band"
    assert (100, 101) in got or (100, 102) in got, "planted near-dups missed"
    # no cross-pairs between unrelated synthetic docs
    assert not any(a < 60 and b < 60 for a, b in got)


def test_minhash_estimate_tracks_exact_jaccard(planted_docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup_text.ngram_jaccard_pairs(planted_docs, threshold=0.0, n=2).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup_text.minhash_lsh_pairs(
            planted_docs, threshold=0.0, n_hashes=64, bands=32, shingle_n=2
        ).collect()
    }
    common = set(exact) & set(est)
    assert (100, 103) in common
    for k in common:
        assert abs(est[k] - exact[k]) < 0.25, f"estimate off at {k}: {est[k]} vs {exact[k]}"
    assert est[(100, 103)] == 1.0


def test_minhash_signature_paths_agree(planted_docs):
    """The explode+groupBy engine path == the single-expression path."""
    via_agg = {
        r["id"]: r["sig"]
        for r in dedup_text.minhash_signatures(planted_docs, n_hashes=8, shingle_n=2).collect()
    }
    via_expr = {
        r["doc_id"]: r["sig"]
        for r in planted_docs.select(
            "doc_id",
            dedup_text.minhash_signature(
                dedup_text.word_shingles(F.col("text"), 2), 8
            ).alias("sig"),
        ).collect()
    }
    assert via_agg == via_expr


_P1, _P2, _P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P4, _P5, _M64 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5, (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 (the algorithm behind Spark's xxhash64), signed."""
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _M64, (seed + _P2) & _M64, seed, (seed - _P1) & _M64]
        while i + 32 <= n:
            for j in range(4):
                k = int.from_bytes(data[i:i + 8], "little")
                v[j] = (_rotl((v[j] + k * _P2) & _M64, 31) * _P1) & _M64
                i += 8
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M64
        for j in range(4):
            k = (_rotl((v[j] * _P2) & _M64, 31) * _P1) & _M64
            h = ((h ^ k) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _ref_simhash(text):
    """Independent sign-sum SimHash over the pure-Python XXH64."""
    import re as _re

    if text is None:
        return None
    toks = [t for t in _re.split(r"\s+", text.strip().lower()) if t]
    if not toks:
        return 0
    v = [0] * 64
    for t in toks:
        h = _xxh64(t.encode("utf-8")) & _M64
        for i in range(64):
            v[i] += 1 if (h >> i) & 1 else -1
    sig = 0
    for i in range(64):
        if v[i] > 0:
            sig |= 1 << i
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_signatures_match_independent_reference(spark):
    """The JVM codegen path (explode + xxhash64 + 64 sign-sums) equals a
    from-scratch Python XXH64 + sign-sum reference — including empty,
    whitespace-only, null, and long texts. Also pins that Spark's
    xxhash64 IS XXH64 seed 42 (guards the reference itself)."""
    toks = ["hello", "a", "0123456789abcdef0123456789abcdef_long_token_over_32_bytes"]
    jvm = spark.createDataFrame([(t,) for t in toks], "t string").select(
        F.xxhash64("t").alias("h")).collect()
    assert [r["h"] for r in jvm] == [_xxh64(t.encode()) for t in toks]

    texts = [BASE, BASE + " tail", "", "   ", None, "one", "repeat repeat repeat",
             "mixed 123 ! tokens\twith\ttabs\nand newlines"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["id"]: r["sig"] for r in dedup_text.simhash_signatures(df).collect()}
    want = {i: _ref_simhash(t) for i, t in enumerate(texts)}
    assert got == want


def test_simhash_bands_and_hamming(spark, planted_docs):
    pairs = dedup_text.simhash_pairs(planted_docs, max_hamming=16)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((100, 103)) == 0, "identical texts must have hamming 0"
    near = [h for (a, b), h in got.items() if a == 100 and b in (101, 102)]
    assert near and all(h <= 16 for h in near)
    assert (100, 104) not in got


def test_simhash_hot_chunk_cap_bounds_candidates(spark):
    """A planted hot chunk value (many docs sharing one 16-bit chunk)
    must not produce m^2 candidate pairs when max_df caps the bucket:
    with 40 identical docs, uncapped banding yields 40*39/2 pairs;
    max_df=5 must drop the hot buckets entirely."""
    rows = [(i, "constant text shared by every doc") for i in range(40)]
    rows += [(100 + i, f"unique document {i} " + " ".join(f"w{i}_{j}" for j in range(10)))
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup_text.simhash_pairs(df, max_hamming=3, max_df=None)
    capped = dedup_text.simhash_pairs(df, max_hamming=3, max_df=5)
    assert uncapped.count() >= 40 * 39 // 2
    assert capped.count() == 0


# --------------------------------------------------------------------------
# ANN recall
# --------------------------------------------------------------------------

def test_ann_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 20)
    k = 10
    exact = similarity.brute_force_topk(emb, probes, k=k).collect()
    approx = similarity.lsh_topk(emb, probes, k=k, n_planes=4, n_tables=16).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in approx:
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(truth[p] & got.get(p, set())) / len(truth[p]) for p in truth
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.7, f"LSH recall@{k} too low: {mean_recall:.2f}"
    # approximate scores must be true cosines (subset correctness)
    exact_cos = {(r["probe_id"], r["neighbor_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["probe_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9


def test_embedding_neardup_symmetric_and_thresholded(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    pairs = similarity.embedding_neardup_pairs(emb, threshold=0.2, n_planes=4).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cos"] >= 0.2


def test_embedding_neardup_exact_is_ground_truth(spark):
    """The block-grid exact pairs are complete (superset of any LSH
    run's pairs at the same threshold) and planned as equi-joins, not a
    nested-loop/cartesian join."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    exact = similarity.embedding_neardup_exact(emb, threshold=0.2, n_blocks=4)
    plan = exact._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        exact._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    ex = {(r["id_a"], r["id_b"]): r["cos"] for r in exact.collect()}
    # every unordered pair appears at most once, ordered
    assert all(a < b for a, b in ex)
    lsh = similarity.embedding_neardup_pairs(emb, threshold=0.2, n_planes=4).collect()
    for r in lsh:
        key = (r["id_a"], r["id_b"])
        assert key in ex and abs(ex[key] - r["cos"]) < 1e-9


# --------------------------------------------------------------------------
# rolling fingerprint
# --------------------------------------------------------------------------

def test_rolling_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, "xy " + BASE), (4, "something else entirely")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2], "equal texts -> equal fingerprint"
    assert got[1] == got[3], "winnowing min-hash survives a prefix shift"
    assert got[1] != got[4]


# --------------------------------------------------------------------------
# Arrow-vs-JVM dual paths
# --------------------------------------------------------------------------

def test_udf_paths_equal(spark):
    from etl_spark.functions.udfs import lang_norm, lang_norm_expr, sha256_hex

    df = spark.createDataFrame(
        [("Python", "hello"), ("GOLANG", ""), ("weird-lang", "unicode ✓ text"), (None, None)],
        "lang string, content string",
    )
    rows = df.select(
        sha256_hex("content").alias("sha_py"),
        F.sha2(F.col("content"), 256).alias("sha_jvm"),
        lang_norm("lang").alias("ln_py"),
        lang_norm_expr(F.col("lang")).alias("ln_jvm"),
        "content",
    ).collect()
    for r in rows:
        assert r["sha_py"] == r["sha_jvm"]
        assert r["ln_py"] == r["ln_jvm"]
        if r["content"] is not None:
            assert r["sha_py"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_replay_arrow_path_matches_default(spark, tmp_path):
    from etl_spark.cdc.gen import GenConfig, generate_events
    from etl_spark.cdc.lake import SnapshotTable
    from etl_spark.cdc.runner import replay

    df = generate_events(spark, GenConfig(n_events=1200, n_keys=60, seed=23))
    states = []
    for arrow in (False, True):
        t = SnapshotTable(spark, str(tmp_path / f"lake_arrow{arrow}"), n_buckets=4)
        replay(spark, df, t, batch_size=500, use_arrow_udfs=arrow)
        states.append(
            sorted(map(tuple, t.read().select(
                "repo", "path", "commit", "lang", "content", "content_sha256", "_last_lsn"
            ).collect()))
        )
    assert states[0] == states[1]


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------

def test_bmp_decode_hand_built_fixture():
    """Decode a 2x3 24-bit BMP whose 54 header bytes + padded raster are
    written out literally here (not via encode_bmp) — proves the decoder
    reads the spec, not merely whatever our encoder happens to emit."""
    import struct

    from etl_spark.operators.multimodal import decode_bmp

    w, h = 2, 3
    row = b"\x10\x20\x30\x40\x50\x60\x00\x00"  # 2 px * 3B + 2B pad = 8
    payload = (
        b"BM" + struct.pack("<I", 54 + 8 * h) + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 8 * h, 0, 0, 0, 0)
        + row * h
    )
    got = decode_bmp(payload)
    assert got == {"width": 2, "height": 3, "bpp": 24, "data_offset": 54}
    # top-down variant (negative height) reports |height|
    td = bytearray(payload)
    td[22:26] = struct.pack("<i", -h)
    assert decode_bmp(bytes(td))["height"] == 3


def test_wav_decode_hand_built_fixture():
    """Decode a hand-packed PCM16 stereo WAV with an extra chunk BEFORE
    fmt/data (chunk-walk correctness), 4 samples at 44100 Hz."""
    import struct

    from etl_spark.operators.multimodal import decode_wav

    body = struct.pack("<8h", 0, 1000, -1000, 32767, -32768, 5, -5, 42)  # 4 frames x 2ch
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + len(junk) + len(fmt) + 8 + len(body))
        + b"WAVE" + junk + fmt + b"data" + struct.pack("<I", len(body)) + body
    )
    got = decode_wav(payload)
    assert got["channels"] == 2 and got["sample_rate"] == 44100
    assert got["bits"] == 16 and got["n_samples"] == 4
    assert abs(got["duration_ms"] - 4000.0 / 44100) < 1e-12


def test_codec_roundtrip_and_malformed():
    from etl_spark.operators.multimodal import (
        bmp_row_bytes, decode_bmp, decode_wav, encode_bmp, encode_wav)

    data = bytes(range(256)) * 3
    bmp = encode_bmp(data, 31, 19)
    assert decode_bmp(bmp) == {"width": 31, "height": 19, "bpp": 24,
                               "data_offset": 54}
    assert len(bmp) == 54 + bmp_row_bytes(31) * 19
    wav = encode_wav(data)
    got = decode_wav(wav)
    assert got["n_samples"] == len(data) and got["sample_rate"] == 8000
    assert len(wav) == 44 + 2 * len(data)
    # cross-sniff and malformed bytes decode to None, never raise
    assert decode_bmp(wav) is None and decode_wav(bmp) is None
    for junk in (b"", b"BM", b"RIFFxxxxWAVE", b"\x00" * 100, None):
        assert decode_bmp(junk) is None and decode_wav(junk) is None


def test_codec_adversarial_headers_quarantine():
    """Malformed-but-magic-valid payloads must decode to None (quarantine),
    never raise and never report metadata fabricated from size fields
    with no bytes behind them."""
    import struct

    from etl_spark.operators.multimodal import (bmp_row_bytes, decode_bmp,
                                                decode_wav, encode_bmp,
                                                encode_wav)

    # WAV declaring bits_per_sample=0: passes a bare `% 8` check, then
    # divides by zero in the sample count
    fmt0 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 0)
    data = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    wav0 = (b"RIFF" + struct.pack("<I", 4 + len(fmt0) + len(data))
            + b"WAVE" + fmt0 + data)
    assert decode_wav(wav0) is None

    # truncated WAV: data chunk declares 1,000,000 bytes, carries 4 —
    # must NOT report n_samples=500000 / duration 62.5s
    fmt16 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    trunc = (b"RIFF" + struct.pack("<I", 1000036) + b"WAVE" + fmt16
             + b"data" + struct.pack("<I", 1000000) + b"\x00" * 4)
    assert decode_wav(trunc) is None

    # truncated fmt chunk (declared 16, payload ends mid-struct)
    short_fmt = (b"RIFF" + struct.pack("<I", 20) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00")
    assert decode_wav(short_fmt) is None

    # 32-bit BMP: outside this codec's 24-bit BI_RGB scope — None, not
    # a fabricated channels=3 decode
    bmp32 = bytearray(encode_bmp(b"xyz", 2, 2))
    bmp32[28:30] = struct.pack("<H", 32)
    assert decode_bmp(bytes(bmp32)) is None

    # truncated BMP raster: header promises 31x19, payload holds 1 row
    whole = encode_bmp(bytes(range(64)), 31, 19)
    assert decode_bmp(whole[: 54 + bmp_row_bytes(31)]) is None
    # data_offset pointing past the buffer
    off = bytearray(encode_bmp(b"x", 2, 2))
    off[10:14] = struct.pack("<I", 10_000)
    assert decode_bmp(bytes(off)) is None


def test_multimodal_features_exact(spark):
    """End-to-end through Spark: synthesized REAL media bytes decode to
    header fields matching the generation rule; payload stats are exact."""
    from etl_spark.operators.multimodal import encode_bmp, encode_wav

    texts = [(2, "abc"), (4, ""), (6, "a longer payload body " * 10),
             (1, "pcm audio text"), (3, "")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["media_id"]: r for r in extract_features(synthesize_media(docs)).collect()}
    for i, text in texts:
        b = text.encode()
        if i % 2 == 0:
            w, h = (len(b) % 31) + 1, (len(b) % 19) + 1
            payload = encode_bmp(b, w, h)
            assert (got[i]["width"], got[i]["height"]) == (w, h)
            assert got[i]["channels"] == 3
            assert got[i]["sample_rate"] is None and got[i]["duration_ms"] is None
        else:
            payload = encode_wav(b)
            assert got[i]["channels"] == 1 and got[i]["sample_rate"] == 8000
            assert got[i]["duration_ms"] == 1000.0 * max(len(b), 1) / 8000
            assert got[i]["width"] is None and got[i]["height"] is None
        assert got[i]["n_bytes"] == len(payload)
        assert got[i]["sha256"] == hashlib.sha256(payload).hexdigest()
        assert len(got[i]["feature"]) == 16
        assert abs(sum(got[i]["feature"]) - 1.0) < 1e-5


def test_multimodal_malformed_payload_yields_nulls(spark):
    media = spark.createDataFrame(
        [(1, "image", "image/bmp", bytearray(b"not a bitmap at all"), {})],
        schema="media_id long, kind string, mime string, payload binary, "
               "meta map<string,string>",
    )
    r = extract_features(media).collect()[0]
    assert r["width"] is None and r["sample_rate"] is None
    assert r["n_bytes"] == 19  # stats still computed


def test_frame_sample_offsets(spark):
    from etl_spark.operators.multimodal import encode_wav

    docs = spark.createDataFrame([(7, "z" * 2500)], "doc_id long, text string")
    rows = frame_sample(synthesize_media(docs), every_n_bytes=1024).collect()
    payload = encode_wav(b"z" * 2500)  # odd id -> WAV, 44 + 5000 bytes
    want_offsets = list(range(0, len(payload), 1024))
    assert sorted(r["offset"] for r in rows) == want_offsets
    for r in rows:
        want = hashlib.sha256(payload[r["offset"]: r["offset"] + 1024]).hexdigest()
        assert r["chunk_sha256"] == want


# --------------------------------------------------------------------------
# CIDR longest-prefix join
# --------------------------------------------------------------------------

def test_cidr_longest_match_semantics(spark):
    from etl_spark.operators.cidr import cidr_longest_match

    ips = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "10.1.200.9"), (3, "192.168.1.1"), (4, "10.1.2.255")],
        "id long, ip string",
    )
    nets = spark.createDataFrame(
        [("10.0.0.0/8",), ("10.1.0.0/16",), ("10.1.2.0/24",), ("0.0.0.0/0",)],
        "cidr string",
    )
    got = {r["id"]: (r["cidr"], r["plen"]) for r in cidr_longest_match(ips, nets).collect()}
    assert got[1] == ("10.1.2.0/24", 24), "deepest covering prefix wins"
    assert got[2] == ("10.1.0.0/16", 16)
    assert got[3] == ("0.0.0.0/0", 0), "default route catches everything"
    assert got[4] == ("10.1.2.0/24", 24)


def test_cidr6_longest_match_semantics(spark):
    from etl_spark.operators.cidr import cidr6_longest_match

    ips = spark.createDataFrame(
        [(1, "2001:db8:5::1"), (2, "2001:db8:c:0:0:0:7:8"), (3, "2001:db9::1"),
         (4, "::1"), (5, "2001:0db8:0005:0000::ffff"), (6, "fe80::"),
         (7, "not-an-ip"), (8, "::ffff:1.2.3.4"), (9, "1:2:3:4:5:6:7:8:9")],
        "id long, ip string",
    )
    nets = spark.createDataFrame(
        [("2001::/16",), ("2001:db8::/32",), ("2001:db8:5::/48",),
         ("2001:db8:5:0::/64",), ("2001:db8:c::/46",), ("::/0",),
         ("2001:db8:5:ffff::/48",)],  # non-canonical dup of the /48
        "cidr string",
    )
    got = {r["id"]: (r["cidr"], r["plen"])
           for r in cidr6_longest_match(ips, nets).collect()}
    full5 = "2001:0db8:0005:0000:0000:0000:0000:0000"
    assert got[1] == (f"{full5}/64", 64), "deepest covering prefix wins"
    assert got[2] == ("2001:0db8:000c:0000:0000:0000:0000:0000/46", 46)
    assert got[3] == ("2001:0000:0000:0000:0000:0000:0000:0000/16", 16)
    assert got[4] == ("0000:0000:0000:0000:0000:0000:0000:0000/0", 0)
    assert got[5] == (f"{full5}/64", 64), "uncompressed spelling parses too"
    assert got[6][1] == 0, "default route catches everything parseable"
    # malformed / unsupported-embedded-v4 / 9-group probes drop, not match
    assert 7 not in got and 8 not in got and 9 not in got


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(data=st.data())
def test_ip6_parse_matches_ipaddress_on_fuzz(spark, data):
    """ip6_parse's (valid, hi, lo) vs Python ipaddress on fuzzed strings
    from the hex-and-colon alphabet (plus structured near-valid forms):
    validity verdicts must agree exactly (IPv4-embedded forms excepted —
    documented unsupported, must read invalid), and for every string both
    sides accept, the 128-bit value must be bit-identical."""
    import ipaddress

    alphabet = "0123456789abcdef:"
    raw = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=1, max_size=24),
        min_size=20, max_size=40))
    # structured near-valid forms: join 1-9 hextets, optionally compress
    hextet = st.text(alphabet="0123456789abcdef", min_size=1, max_size=4)
    structured = data.draw(st.lists(
        st.lists(hextet, min_size=1, max_size=9).map(":".join),
        min_size=10, max_size=20))
    cases = sorted(set(raw + structured + ["::"]))

    df = spark.createDataFrame([(s,) for s in cases], "s string")
    from etl_spark.operators.cidr import ip6_parse
    v, hi, lo = ip6_parse(F.col("s"))
    rows = df.select("s", v.alias("v"), hi.alias("h"), lo.alias("l")).collect()
    for r in rows:
        s = r["s"]
        try:
            ref = int(ipaddress.IPv6Address(s))
        except ValueError:
            ref = None
        assert bool(r["v"]) == (ref is not None), f"validity({s!r})"
        if ref is not None:
            got = ((r["h"] & 0xFFFFFFFFFFFFFFFF) << 64) | (r["l"] & 0xFFFFFFFFFFFFFFFF)
            assert got == ref, f"value({s!r}): {got:#x} != {ref:#x}"


def test_cidr_parsers_tolerate_dirty_feeds(spark):
    """One malformed line in a route/GeoLite feed must DROP, never abort
    the job (Spark 4 defaults ANSI mode, where a bare getItem/cast throws
    on the first dirty row) and never parse as valid=true — every
    validity verdict is cross-checked against Python's ipaddress."""
    import ipaddress

    from etl_spark.operators.cidr import (cidr6_longest_match,
                                          cidr_longest_match, ip6_parse)

    cases = ["1:2:3:4:5:6:7:8:", ":1::2", "1::2:", "1:2:3:4::5:6:7:8",
             "zzzz::1", "", "1:2", ":::", ":",
             "::", "::1", "1::", "2001:db8::7:8", "1:2:3:4:5:6:7:8"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    v, _, _ = ip6_parse(F.col("s"))
    got = {r["s"]: bool(r["v"]) for r in df.select("s", v.alias("v")).collect()}
    for s in cases:
        try:
            ipaddress.IPv6Address(s)
            expect = True
        except ValueError:
            expect = False
        assert got[s] == expect, f"validity({s!r}): got {got[s]}, want {expect}"
    # IPv4-embedded tail: valid per RFC but documented-unsupported here —
    # must report invalid (drop), never a silent wrong 128-bit value
    got_v4 = df.sparkSession.createDataFrame([("::ffff:1.2.3.4",)], "s string")
    vv, _, _ = ip6_parse(F.col("s"))
    assert got_v4.select(vv.alias("v")).collect()[0]["v"] is False

    # dirty NETWORK feeds: malformed rows drop; the rest still match.
    # '1.2.3.999/8' additionally pins octet-range enforcement: naive
    # octet arithmetic would carry 999 into the neighboring octet and
    # alias a different address instead of dropping.
    ips = spark.createDataFrame(
        [(1, "10.0.0.1"), (2, "2001:db8::1")], "id long, ip string")
    nets4 = spark.createDataFrame(
        [("10.0.0.0/8",), ("10.0.0.0",), ("10.0.0.0/xx",), ("abc",),
         ("1.2.3.999/8",), ("10.0.0.0/8/9",), ("10.0.0.0/33",)],
        "cidr string")
    got4 = {r["id"]: r["plen"] for r in cidr_longest_match(ips, nets4).collect()}
    assert got4 == {1: 8}
    nets6 = spark.createDataFrame(
        [("2001:db8::/32",), ("2001:db8::",), ("2001:db8::/xx",),
         (":1::2/16",), ("2001:db8::/129",)],
        "cidr string")
    got6 = {r["id"]: r["plen"] for r in cidr6_longest_match(ips, nets6).collect()}
    assert got6 == {2: 32}


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(data=st.data())
def test_cidr6_longest_match_property(spark, data):
    """Random 128-bit networks (compressed spellings via stdlib
    ipaddress, non-canonical host bits allowed) and random probes: the
    two-long fan-out equi-join must agree with stdlib containment."""
    import ipaddress

    from etl_spark.operators.cidr import cidr6_longest_match

    nets = data.draw(st.lists(
        st.tuples(st.integers(0, 2**128 - 1), st.integers(0, 128)),
        min_size=1, max_size=10))
    ips = data.draw(st.lists(st.integers(0, 2**128 - 1),
                             min_size=1, max_size=25))
    netobjs = [(ipaddress.IPv6Network((addr & (((1 << p) - 1) << (128 - p))
                                       if p else 0, p)), addr, p)
               for addr, p in nets]

    def ref(v):
        a = ipaddress.IPv6Address(v)
        best = None
        for n, _, _ in netobjs:
            if a in n and (best is None or n.prefixlen > best.prefixlen):
                best = n
        return best

    ips_df = spark.createDataFrame(
        [(i, str(ipaddress.IPv6Address(v))) for i, v in enumerate(ips)],
        "id int, ip string")
    # spell networks with their ORIGINAL (possibly non-canonical) address
    nets_df = spark.createDataFrame(
        [(f"{ipaddress.IPv6Address(addr)}/{p}",) for addr, p in nets],
        "cidr string")
    got = {r["id"]: (r["cidr"], r["plen"])
           for r in cidr6_longest_match(ips_df, nets_df).collect()}
    for i, v in enumerate(ips):
        want = ref(v)
        if want is None:
            assert i not in got
        else:
            assert got[i] == (
                f"{want.network_address.exploded}/{want.prefixlen}",
                want.prefixlen,
            ), (i, str(ipaddress.IPv6Address(v)))


def test_ann_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    probes = emb.where(F.col("vec_id") < 20)
    k = 10
    exact = similarity.brute_force_topk(emb, probes, k=k).collect()
    approx = similarity.ivf_topk(emb, probes, k=k, n_centroids=32, nprobe=8).collect()
    truth: dict = {}
    for r in exact:
        truth.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in approx:
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    recalls = [len(truth[p] & got.get(p, set())) / len(truth[p]) for p in truth]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"IVF recall@{k} too low: {mean_recall:.2f}"
    # scores must be true cosines (subset correctness)
    exact_cos = {(r["probe_id"], r["neighbor_id"]): r["cos"] for r in exact}
    for r in approx:
        key = (r["probe_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(data=st.data())
def test_cidr_longest_match_property(spark, data):
    """Random networks (possibly non-canonical, duplicated spellings)
    and random probe IPs: the fan-out equi-join must agree with a naive
    per-ip longest-prefix reference."""
    from etl_spark.operators.cidr import cidr_longest_match

    nets = data.draw(st.lists(
        st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 32)),
        min_size=1, max_size=12))
    ips = data.draw(st.lists(st.integers(0, 2**32 - 1),
                             min_size=1, max_size=40))

    def dq(v):
        return f"{(v >> 24) & 255}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"

    def canon(addr, plen):
        pfx = (addr >> (32 - plen)) if plen else 0
        return (pfx << (32 - plen)) if plen else 0

    # naive reference: longest plen whose canonical prefix covers the ip
    def ref(ip):
        best = None
        for addr, plen in nets:
            net = canon(addr, plen)
            covered = plen == 0 or (ip >> (32 - plen)) == (net >> (32 - plen))
            if covered and (best is None or plen > best[1]):
                best = (net, plen)
        return best

    ips_df = spark.createDataFrame(
        [(i, dq(v)) for i, v in enumerate(ips)], "id int, ip string")
    nets_df = spark.createDataFrame(
        [(f"{dq(a)}/{p}",) for a, p in nets], "cidr string")
    got = {r["id"]: (r["cidr"], r["plen"])
           for r in cidr_longest_match(ips_df, nets_df).collect()}
    for i, v in enumerate(ips):
        want = ref(v)
        if want is None:
            assert i not in got
        else:
            assert got[i] == (f"{dq(want[0])}/{want[1]}", want[1]), (i, dq(v))
