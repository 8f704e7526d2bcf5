"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless ``deterministic_fake=True``, which produces a seeded, shape-correct
fake so the Spark-side plumbing — schema, partitioning, ``mapInPandas``
batch shape, feature aggregation — is real and tested end to end.

At 100 TB the pattern matters more than the codec: binary payloads stay in
Arrow record batches (never row-at-a-time Python), decode is
``mapInPandas`` (per-batch, bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``), and features come back as
fixed-width array columns that downstream joins/ANN consume directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seeded by a crc32 of the payload (stable
    across processes/workers — unlike Python ``hash``, which depends on
    PYTHONHASHSEED), correct shape."""
    import zlib

    rng = np.random.RandomState(zlib.crc32(payload) & 0xFFFFFFFF)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image(payload: bytes, meta: dict, *, deterministic_fake: bool = False) -> np.ndarray:
    """binary → HxWx3 uint8. Real codecs are unavailable in this container."""
    if deterministic_fake:
        return _fake_pixels(payload, meta["width"], meta["height"])
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "pass deterministic_fake=True for the tested fake path")


def image_features(docs: DataFrame, *, bin_col: str = "payload",
                   meta_col: str = "meta", id_col: str = "doc_id",
                   target: int = 8, deterministic_fake: bool = False) -> DataFrame:
    """Decode → resize (mean-pool to target×target) → flatten to a float
    feature vector. One ``mapInPandas`` pass, Arrow batches in and out."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ])

    def run(iterator):
        for pdf in iterator:
            ids, feats = [], []
            for doc_id, payload, meta in zip(pdf[id_col], pdf[bin_col], pdf[meta_col]):
                px = decode_image(bytes(payload),
                                  {"width": int(meta["width"]), "height": int(meta["height"])},
                                  deterministic_fake=deterministic_fake)
                h, w, _ = px.shape
                bh, bw = max(h // target, 1), max(w // target, 1)
                pooled = px[: bh * target, : bw * target].reshape(
                    target, bh, target, bw, 3).mean(axis=(1, 3))
                feats.append(pooled.astype(np.float32).ravel().tolist())
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "features": feats})

    return docs.mapInPandas(run, schema=out_schema)


def frame_sample(docs: DataFrame, *, bin_col: str = "payload",
                 id_col: str = "doc_id", n_frames: int = 4,
                 frame_bytes: int = 64) -> DataFrame:
    """Video-style frame sampling stub: split the binary payload into
    ``n_frames`` evenly spaced windows (the partitioning/batching pattern of
    real frame extraction, with byte windows standing in for frames)."""
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def run(iterator):
        for pdf in iterator:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                if not b:
                    continue
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    start = min(i * step, max(len(b) - 1, 0))
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[start:start + frame_bytes])
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame": frames})

    return docs.mapInPandas(run, schema=out_schema)


def with_image_meta(docs: DataFrame, *, bin_col: str = "html",
                    id_col: str = "doc_id") -> DataFrame:
    """Attach typed metadata to an opaque binary column (here: derived
    deterministically from payload length — stands in for header parsing)."""
    ln = F.octet_length(F.col(bin_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(bin_col).cast("binary").alias("payload"),
        F.struct(
            (ln % 32 + 8).cast("int").alias("width"),
            (ln % 24 + 8).cast("int").alias("height"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )
