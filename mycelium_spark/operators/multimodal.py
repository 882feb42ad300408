"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batching
(mapInPandas), partition sizing, feature-vector shapes; the actual media
DECODE is stubbed: the container ships no image/audio libraries, so
``decode='real'`` raises NotImplementedError after the import-try, and
``decode='fake'`` (default) derives deterministic bytes-level features
(md5-seeded) with the exact shapes a real decoder would produce. Swapping
in PIL/torchaudio/pyav later only replaces `_decode_*` — the distributed
plan is unchanged.

Scale notes: blobs ride in parquet/Iceberg binary columns; feature
extraction is embarrassingly parallel (mapInPandas, no shuffle);
``spark.sql.files.maxPartitionBytes`` should be lowered (~64 MB) for blob
tables so a task's Arrow batches fit in worker memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("blob", BinaryType()),
        StructField("meta_format", StringType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)


def _try_real_decoder(kind: str):
    try:
        if kind == "image":
            import PIL.Image  # noqa: F401

            return "pil"
        if kind == "audio":
            import soundfile  # noqa: F401

            return "soundfile"
        if kind == "video":
            import av  # noqa: F401

            return "pyav"
    except ImportError:
        return None
    return None


def _fake_features(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic feature vector from blob bytes (md5-expanded)."""
    out = np.empty(dim, dtype=np.float32)
    h = blob or b""
    i = 0
    counter = 0
    while i < dim:
        d = hashlib.md5(h + counter.to_bytes(4, "little")).digest()
        vals = np.frombuffer(d, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
        take = min(dim - i, len(vals))
        out[i : i + take] = vals[:take] * 2.0 - 1.0
        i += take
        counter += 1
    return out


def extract_features(
    blobs: DataFrame, dim: int = 16, blob_col: str = "blob", id_col: str = "blob_id",
    decode: str = "fake",
) -> DataFrame:
    """blob → float feature vector via mapInPandas (Arrow batches).

    decode='real' dispatches to the media library for the row's kind and
    raises NotImplementedError when absent (this container); decode='fake'
    is the deterministic stub.
    """
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(FloatType())),
            StructField("feat_norm", FloatType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            norms = []
            for blob, kind in zip(pdf[blob_col], pdf.get("kind", [None] * len(pdf))):
                if decode == "real":
                    dec = _try_real_decoder(kind or "image")
                    if dec is None:
                        raise NotImplementedError(
                            f"no decoder available for kind={kind!r}; install the media "
                            "libs or use decode='fake'"
                        )
                    raise NotImplementedError("real decode path not wired in this build")
                v = _fake_features(bytes(blob) if blob is not None else b"", dim)
                feats.append(v.tolist())
                norms.append(float(np.linalg.norm(v)))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats, "feat_norm": norms})

    return blobs.mapInPandas(run, schema)


def frame_sample(
    blobs: DataFrame, n_frames: int = 4, frame_bytes: int = 64,
    blob_col: str = "blob", id_col: str = "blob_id",
) -> DataFrame:
    """Video frame sampling stub: emits n_frames evenly-spaced byte windows
    per blob as (blob_id, frame_idx, frame) — one output row per frame,
    the exact shape a real pyav sampler produces."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                n = max(len(b), 1)
                for f in range(n_frames):
                    start = (f * n) // n_frames
                    ids.append(bid)
                    idxs.append(f)
                    frames.append(b[start : start + frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return blobs.mapInPandas(run, schema)


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize is decode-dependent → explicit stub (import-try first)."""
    if _try_real_decoder("image") is None:
        raise NotImplementedError(
            "image resize requires PIL, which is not in this container; the "
            "distributed plan is extract_features-shaped (mapInPandas, no shuffle)"
        )
    raise NotImplementedError("real decode path not wired in this build")


def synth_blob_table(spark, n: int = 64) -> DataFrame:
    """Deterministic blob fixtures (bytes derived from md5 chains)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        seed = hashlib.md5(f"blob{i}".encode()).digest()
        blob = (seed * ((i % 7) + 1))[: 16 * ((i % 13) + 1)]
        rows.append(
            (
                i,
                kind,
                bytearray(blob),
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                (i % 16 + 1) * 8 if kind == "image" else None,
                (i % 9 + 1) * 8 if kind == "image" else None,
                (i % 30 + 1) * 1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, BLOB_SCHEMA)
