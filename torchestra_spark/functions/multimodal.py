"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, plus the Spark-side plumbing for decode /
feature-extract / resize / frame-sample stages.

The decode kernels themselves are STUBBED (image/audio codecs are not
available in this environment): ``decoder="fake"`` produces a
deterministic array derived from the payload bytes (so the distributed
plumbing — schema, partitioning, Arrow batch shape, UDF signature — is
real and testable), and ``decoder="real"`` raises NotImplementedError
at the point where PIL/ffmpeg would be invoked.

Schema convention:

    payload: binary                -- the encoded media bytes
    media: struct<kind string,     -- 'image' | 'audio' | 'video'
                  format string,   -- 'png', 'wav', ...
                  width int, height int,
                  sample_rate int, n_frames int>

All stages run through ``mapInPandas`` so each task decodes a whole
Arrow batch, amortizing per-batch setup; batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_STRUCT = (
    "kind string, format string, width int, height int, sample_rate int, n_frames int"
)


def attach_media_metadata(
    df: DataFrame,
    payload_col: str = "payload",
    kind: str = "image",
    fmt: str = "png",
    width: int = 0,
    height: int = 0,
    sample_rate: int = 0,
    n_frames: int = 0,
) -> DataFrame:
    return df.withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(sample_rate).alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ),
    )


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a codec: n float32 features derived
    from the payload bytes (stable across partitioning/retries)."""
    if payload is None or len(payload) == 0:
        return np.zeros(n, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    idx = np.arange(n)
    return (arr[idx % len(arr)].astype(np.float32) / 255.0) * (1.0 + (idx % 7) * 0.01)


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 64,
    decoder: str = "fake",
) -> DataFrame:
    """payload binary -> features array<float>[n_features].

    decoder='real' is the integration point for PIL / torchvision /
    ffmpeg — not available in this container, raises NotImplementedError.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)
    id_type = df.schema[id_col].dataType.simpleString()
    sel = df.select(F.col(id_col).alias("__id"), F.col(payload_col).alias("__p"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg; not available here"
                )
            feats = [_fake_decode(p, n_features) for p in pdf["__p"]]
            yield pd.DataFrame({"__id": pdf["__id"], "features": feats})

    out = sel.mapInPandas(decode, f"__id {id_type}, features array<float>")
    return out.withColumnRenamed("__id", id_col)


def resize_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing: emits (id, width, height, pixels array<float>)
    where the fake decoder produces width*height deterministic values
    (the real path would decode->resize->reencode)."""
    return decode_features(df, payload_col, id_col, n_features=width * height, decoder=decoder)


def frame_sample_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    frame_features: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame-sampling plumbing: (id, frame_idx, features).  The
    fake decoder fabricates ceil(len(payload)/every_n) frames; the real
    path would seek the container."""
    id_type = df.schema[id_col].dataType.simpleString()
    sel = df.select(F.col(id_col).alias("__id"), F.col(payload_col).alias("__p"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("real video decoding requires ffmpeg")
            ids, idxs, feats = [], [], []
            for i, p in zip(pdf["__id"], pdf["__p"]):
                n_frames = max(1, (0 if p is None else len(p)) // every_n)
                for fi in range(n_frames):
                    ids.append(i)
                    idxs.append(fi)
                    feats.append(_fake_decode((p or b"") + bytes([fi % 256]), frame_features))
            yield pd.DataFrame({"__id": ids, "frame_idx": idxs, "features": feats})

    out = sel.mapInPandas(sample, f"__id {id_type}, frame_idx int, features array<float>")
    return out.withColumnRenamed("__id", id_col)
