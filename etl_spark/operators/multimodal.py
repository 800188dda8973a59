"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery (schemas, batch iteration, partition sizing,
UDF signatures) is real and tested; the actual codec step is STUBBED
behind ``_decode_image_real`` (image/audio libs are not in this
container) with a deterministic fake so plumbing tests are stable.
At 100 TB the shape matters: binaries never pass through Python row
objects — they stay Arrow buffers; ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` bound executor memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .util import fan_out
from pyspark.sql import types as T

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
    "width int, height int, mean_byte double, feature array<float>"
)


def _decode_image_real(payload: bytes):
    """Real decode path — requires PIL/cv2, absent in this container."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; install on the cluster and "
        "swap _decode_fake for this function"
    )


def _decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoder: pretend dimensions derived
    from the byte length (keeps plumbing tests reproducible)."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract media batches via mapInPandas.

    Each Arrow batch arrives as a pandas DataFrame; bytes are numpy
    buffers, never Python-row-serialized. Output: fixed-width feature
    vector (16 bins of the byte histogram) + metadata.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes, sha, w, h, mean, feats = [], [], [], [], [], []
            for p in payloads:
                b = bytes(p) if p is not None else b""
                n_bytes.append(len(b))
                sha.append(hashlib.sha256(b).hexdigest())
                ww, hh = _decode_fake(b)
                w.append(ww)
                h.append(hh)
                arr = np.frombuffer(b, dtype=np.uint8)
                mean.append(float(arr.mean()) if arr.size else 0.0)
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
                tot = hist.sum() or 1
                feats.append((hist / tot).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha256": sha,
                    "width": w,
                    "height": h,
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


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a MEDIA_SCHEMA table from a text table (test fixture path:
    payload = utf-8 bytes). On a real lake this is `spark.read.format
    ('binaryFile')` or parquet with a binary column."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
