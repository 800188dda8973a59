"""Multimodal columns: image/audio as opaque binary columns with typed
metadata, decoded and feature-extracted via Arrow-batched ``mapInPandas``.

The decode step is REAL — two formats implemented from their public
byte-level specifications with stdlib struct + numpy (no Pillow/cv2
needed, none is in this container):

- **BMP** (Windows bitmap, 24-bit uncompressed BI_RGB): 14-byte file
  header + 40-byte BITMAPINFOHEADER, rows bottom-up, 4-byte aligned.
- **WAV** (RIFF little-endian, PCM): chunk walk over ``fmt `` / ``data``,
  supporting arbitrary chunk order and the odd-size pad byte.

Decoders sniff the magic bytes, so a mixed binary column routes itself;
malformed payloads decode to nulls (quarantine-style, never throwing on
data). At 100 TB the shape matters: binaries stay Arrow buffers end to
end (never Python row objects); ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` bound executor memory per batch.

Reference parity: the reference has no media path; this is part of the
training-data-pipeline surface (multimodal curation) the engine adds.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import fan_out

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, channels int, sample_rate int, "
    "duration_ms double, mean_byte double, feature array<float>"
)

_BMP_HEADER_LEN = 54   # 14 file header + 40 BITMAPINFOHEADER
_WAV_HEADER_LEN = 44   # RIFF + fmt(16) + data header, canonical layout
WAV_SAMPLE_RATE = 8000


# --------------------------------------------------------------------------
# codecs (pure stdlib/numpy, spec-driven)
# --------------------------------------------------------------------------

def bmp_row_bytes(width: int) -> int:
    """Stored bytes per BMP row: 3 bytes/pixel, rows padded to 4 bytes."""
    return ((3 * width + 3) // 4) * 4


def encode_bmp(data: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bit BI_RGB BMP with pixel bytes tiled from ``data``
    (deterministic; empty data tiles zeros)."""
    rb = bmp_row_bytes(width)
    img_size = rb * height
    src = np.frombuffer(data, dtype=np.uint8) if data else np.zeros(1, np.uint8)
    rows = np.zeros((height, rb), dtype=np.uint8)
    rows[:, : 3 * width] = np.resize(src, (height, 3 * width))
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER_LEN + img_size, 0, 0,
                         _BMP_HEADER_LEN)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> dict | None:
    """Parse a BMP header. Returns width/height/bpp/data_offset, or None
    when the bytes are not a decodable uncompressed BMP."""
    if payload is None or len(payload) < _BMP_HEADER_LEN or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    # bpp pinned to 24: this codec is scoped to 24-bit BI_RGB (module
    # docstring) — an 8/32-bit BMP must decode to None (null quarantine),
    # not be reported with fabricated 3-channel metadata
    if (hdr_size < 40 or planes != 1 or compression != 0 or bpp != 24
            or width <= 0 or height == 0):
        return None
    # top-down BMPs store negative height
    h = abs(height)
    # declared raster must actually fit the payload: a truncated upload
    # yields None, never metadata computed from bytes that are not there
    if data_off < 14 + hdr_size or data_off + bmp_row_bytes(width) * h > len(payload):
        return None
    return {"width": width, "height": h, "bpp": bpp, "data_offset": data_off}


def encode_wav(data: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Minimal PCM16 mono WAV: one sample per input byte, centered
    ((byte-128) << 8); empty data yields one zero sample."""
    src = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
           if data else np.zeros(1, dtype=np.int16))
    samples = ((src - 128) * 256).astype("<i2")
    body = samples.tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(body))
        + body
    )


def decode_wav(payload: bytes) -> dict | None:
    """Walk RIFF chunks; returns channels/sample_rate/bits/n_samples/
    duration_ms, or None when not a parseable PCM WAV."""
    if (payload is None or len(payload) < _WAV_HEADER_LEN
            or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE"):
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        # declared chunk bodies must actually fit the payload: a
        # truncated upload decodes to None, never to sample counts /
        # durations fabricated from a size field with no bytes behind it
        if pos + 8 + size > len(payload):
            return None
        if cid == b"fmt " and size >= 16:
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8)
            # bits must be a positive multiple of 8 (bits=0 passes a bare
            # `% 8` check and then divides by zero in the sample count)
            if audio_fmt != 1 or ch < 1 or bits % 8 or bits == 0 or rate < 1:
                return None
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_len = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        return None
    ch, rate, bits = fmt
    n_samples = data_len // (ch * bits // 8)
    return {"channels": ch, "sample_rate": rate, "bits": bits,
            "n_samples": n_samples,
            "duration_ms": 1000.0 * n_samples / rate}


# --------------------------------------------------------------------------
# operators
# --------------------------------------------------------------------------

def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract media batches via mapInPandas.

    Each Arrow batch arrives as a pandas DataFrame; bytes are numpy
    buffers, never Python-row-serialized. Decoders are sniffed from the
    payload magic (BMP / WAV); a payload neither decodes reads as nulls
    in the typed columns — the operator never fails on data. Output adds
    a fixed-width feature vector (16 bins of the payload byte histogram).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            n = len(pdf)
            n_bytes = np.zeros(n, dtype=np.int64)
            sha, feats = [], []
            mean = np.zeros(n, dtype=np.float64)
            width = np.full(n, None, dtype=object)
            height = np.full(n, None, dtype=object)
            channels = np.full(n, None, dtype=object)
            rate = np.full(n, None, dtype=object)
            dur = np.full(n, None, dtype=object)
            for i, p in enumerate(pdf["payload"]):
                b = bytes(p) if p is not None else b""
                n_bytes[i] = len(b)
                sha.append(hashlib.sha256(b).hexdigest())
                arr = np.frombuffer(b, dtype=np.uint8)
                mean[i] = float(arr.mean()) if arr.size else 0.0
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
                feats.append((hist / (hist.sum() or 1)).astype(np.float32))
                img = decode_bmp(b)
                if img is not None:
                    width[i], height[i] = img["width"], img["height"]
                    channels[i] = 3
                    continue
                aud = decode_wav(b)
                if aud is not None:
                    channels[i] = aud["channels"]
                    rate[i] = aud["sample_rate"]
                    dur[i] = aud["duration_ms"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha256": sha,
                    "width": width,
                    "height": height,
                    "channels": channels,
                    "sample_rate": rate,
                    "duration_ms": dur,
                    "mean_byte": mean,
                    "feature": feats,
                }
            )

    return fan_out(df).mapInPandas(op, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per sampled offset of each
    payload (UDTF-shaped: mapInPandas with row expansion)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, chunk_sha = [], [], []
            import hashlib

            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                for off in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(mid)
                    offs.append(off)
                    chunk_sha.append(hashlib.sha256(b[off : off + every_n_bytes]).hexdigest())
            yield pd.DataFrame({"media_id": ids, "offset": offs, "chunk_sha256": chunk_sha})

    return fan_out(df).mapInPandas(op, "media_id long, offset long, chunk_sha256 string")


# deterministic dimension rules for the synthetic corpus, shared with the
# DuckDB oracle (which recomputes them from octet_length(encode(text)))
def _bmp_dims(n: int) -> tuple[int, int]:
    return (n % 31) + 1, (n % 19) + 1


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a MEDIA_SCHEMA table from a text table: even ids become REAL
    BMP images (pixels tiled from the utf-8 bytes, dimensions a
    deterministic function of the byte length), odd ids become REAL WAV
    audio (one PCM16 sample per byte). On a real lake this operator is
    replaced by ``spark.read.format('binaryFile')`` or a parquet binary
    column; here it gives the decoders genuine bytes to parse."""

    @F.pandas_udf(T.BinaryType())
    def build(ids: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for i, t in zip(ids, texts):
            data = (t or "").encode("utf-8")
            if int(i) % 2 == 0:
                w, h = _bmp_dims(len(data))
                out.append(encode_bmp(data, w, h))
            else:
                out.append(encode_wav(data))
        return pd.Series(out)

    kind = F.when(F.col(id_col) % 2 == 0, "image").otherwise("audio")
    mime = F.when(F.col(id_col) % 2 == 0, "image/bmp").otherwise("audio/wav")
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        build(F.col(id_col), F.col(text_col)).alias("payload"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
