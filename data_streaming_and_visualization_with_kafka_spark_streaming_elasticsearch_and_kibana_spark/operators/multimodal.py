"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns + a typed metadata struct; all
transforms run as Arrow-batched `mapInPandas` so bytes never round-trip
through Python row objects one at a time.

The container has no image/audio libraries, so the actual codec step is
STUBBED: `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (seeded from the
bytes) produces (height, width, mean_luma) so the Spark-side plumbing —
schema, batching, partitioning — is fully exercised by tests.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: raw bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("bytes", T.LongType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, height int, width int, mean_luma double, content_sha string"
)


def attach_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Fill the metadata struct from the binary column itself."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(content_col)).cast("long").alias("bytes"),
            F.lit(None).cast("string").alias("source_uri"),
        ),
    )


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real image decoder: dimensions and
    luma derived from a sha256 of the bytes. Replaces PIL/-cv2 in this
    container; swap for a real decoder in production."""
    h = hashlib.sha256(content or b"").digest()
    height = 1 + h[0] % 64
    width = 1 + h[1] % 64
    mean_luma = h[2] / 255.0
    return height, width, mean_luma


def decode_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """binary → (height, width, mean_luma, sha) via Arrow-batched
    mapInPandas. `fake=False` requires a real imaging library.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "real image decode requires PIL/opencv — not in this container"
            )
        for pdf in it:
            feats = pdf["content"].map(lambda b: _fake_decode(bytes(b or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": feats.map(lambda t: t[0]).astype("int32"),
                    "width": feats.map(lambda t: t[1]).astype("int32"),
                    "mean_luma": feats.map(lambda t: t[2]),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(bytes(b or b"")).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(_batches, IMAGE_FEATURES_DDL)


def resize_plan(df: DataFrame, max_side: int = 32, fake: bool = True) -> DataFrame:
    """Image resize *plan*: aspect-preserving downscale to `max_side`.

    The real path would decode → resample → re-encode inside the Arrow
    batch; the stub derives source dims with the fake decoder and
    computes target dims with INTEGER arithmetic (h·max_side // max(h,w))
    so the result is bit-exact reproducible in any engine. Fully
    vectorized numpy inside mapInPandas."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "real image resize requires PIL/opencv — not in this container"
            )
        for pdf in it:
            dims = pdf["content"].map(lambda b: _fake_decode(bytes(b or b"")))
            h = dims.map(lambda t: t[0]).to_numpy(dtype="int64")
            w = dims.map(lambda t: t[1]).to_numpy(dtype="int64")
            longest = np.maximum(h, w)
            scaleable = longest > max_side
            out_h = np.where(scaleable, h * max_side // longest, h)
            out_w = np.where(scaleable, w * max_side // longest, w)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_height": h.astype("int32"),
                    "src_width": w.astype("int32"),
                    "height": np.maximum(out_h, 1).astype("int32"),
                    "width": np.maximum(out_w, 1).astype("int32"),
                }
            )

    return df.mapInPandas(
        _batches,
        "media_id long, src_height int, src_width int, height int, width int",
    )


def audio_chunk_plan(
    df: DataFrame, chunk_ms: int = 10_000, fake: bool = True
) -> DataFrame:
    """Audio chunking *plan*: split each clip into fixed-length windows
    (the standard pre-step for ASR/feature extraction at scale — each
    chunk becomes one unit of downstream work, so skewed clip lengths
    can't create straggler tasks).

    The real path would probe the container header for duration; the
    stub derives a fake duration from sha256 bytes (1000 +
    (b0·256 + b1) % 59000 ms) so chunk boundaries are bit-exact
    reproducible. Row explosion is vectorized repeat/arange — no
    per-row Python beyond the per-clip "decode"."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "real audio probing requires ffmpeg/librosa — not in this container"
            )
        for pdf in it:
            sha = pdf["content"].map(
                lambda b: hashlib.sha256(bytes(b or b"")).digest()
            )
            dur = sha.map(lambda d: 1000 + ((d[0] * 256 + d[1]) % 59000)).to_numpy(
                dtype="int64"
            )
            n_chunks = -(-dur // chunk_ms)  # ceil div
            total = int(n_chunks.sum())
            starts = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
            idx = np.arange(total) - starts
            start_ms = idx * chunk_ms
            dur_rep = np.repeat(dur, n_chunks)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n_chunks),
                    "chunk_idx": idx.astype("int32"),
                    "start_ms": start_ms.astype("int32"),
                    "end_ms": np.minimum(start_ms + chunk_ms, dur_rep).astype(
                        "int32"
                    ),
                }
            )

    return df.mapInPandas(
        _batches, "media_id long, chunk_idx int, start_ms int, end_ms int"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: at scale, video bytes explode to
    frames inside mapInPandas (one video per batch row, frames emitted
    as multiple rows). Stub derives a fake frame count from the byte
    length; the row explosion is fully vectorized (repeat + cumsum
    arithmetic — no per-row Python inside the Arrow batch)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["content"].str.len().fillna(0).astype("int64").to_numpy()
            n_frames = 1 + (lens % 5)
            total = int(n_frames.sum())
            # per-media frame counter: global arange minus each media's start
            starts = np.repeat(np.cumsum(n_frames) - n_frames, n_frames)
            frame_no = np.arange(total) - starts
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n_frames),
                    "frame_idx": (frame_no * every_n).astype("int32"),
                }
            )

    return df.mapInPandas(_batches, "media_id long, frame_idx int")
