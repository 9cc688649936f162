"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns + a typed metadata struct; all
transforms run as Arrow-batched `mapInPandas` so bytes never round-trip
through Python row objects one at a time.

Codec support is two-tier. `fake=True` (default in this container) uses
a deterministic stand-in decoder (seeded from the bytes) so the
Spark-side plumbing — schema, batching, partitioning — is exercised
without any imaging library. `fake=False` is REAL for the uncompressed
formats a pure-numpy decoder can handle: binary PPM (P6) / PGM (P5),
24-bpp uncompressed BMP, and PCM WAV headers for audio chunking —
decode, luma stats, and nearest-neighbor resize all run vectorized
inside the Arrow batch. Compressed formats (JPEG/PNG/MP3/…) still raise
NotImplementedError with a clear message: that genuinely needs
PIL/ffmpeg, which production clusters have and this container doesn't.
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


# ------------------------------------------------------ real decoders
def decode_image(content: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from the uncompressed formats numpy can parse
    without any imaging library: binary PPM (P6), binary PGM (P5, gray
    replicated to 3 channels), and 24-bpp uncompressed bottom-up or
    top-down BMP. Raises NotImplementedError for compressed formats
    (JPEG/PNG need a codec library) and ValueError for corrupt input."""
    if content[:2] in (b"P6", b"P5"):
        return _decode_pnm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    raise NotImplementedError(
        "unsupported image format (pure-numpy path decodes P6/P5/24-bpp "
        "BMP; compressed formats need PIL/opencv)"
    )


def _decode_pnm(content: bytes) -> np.ndarray:
    """Binary PPM/PGM: ascii header (magic, width, height, maxval, with
    `#` comments) then one whitespace byte and raw samples."""
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    channels = 3 if content[:2] == b"P6" else 1
    need = width * height * channels
    data = np.frombuffer(content, dtype=np.uint8, count=need, offset=pos)
    img = data.reshape(height, width, channels)
    return np.repeat(img, 3, axis=2) if channels == 1 else img


def _decode_bmp(content: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP: BGR rows padded to 4 bytes, bottom-up
    when the header height is positive."""
    data_off = int.from_bytes(content[10:14], "little")
    width = int.from_bytes(content[18:22], "little", signed=True)
    height = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bpp uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)
    img = rows[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if bottom_up else img


def wav_duration_ms(content: bytes) -> int:
    """Duration of a PCM WAV from its RIFF chunks — integer arithmetic
    only, so chunk boundaries are bit-exact reproducible."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE container")
    byte_rate = data_size = None
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        csize = int.from_bytes(content[pos + 4 : pos + 8], "little")
        if cid == b"fmt ":
            audio_format = int.from_bytes(content[pos + 8 : pos + 10], "little")
            if audio_format != 1:
                raise NotImplementedError("only PCM WAV supported")
            byte_rate = int.from_bytes(content[pos + 16 : pos + 20], "little")
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        raise ValueError("missing fmt/data chunk")
    return data_size * 1000 // byte_rate


def luma_mean(img: np.ndarray) -> float:
    """Rec.601 mean luma normalized to [0, 1]."""
    l = (
        0.299 * img[:, :, 0].astype(np.float64)
        + 0.587 * img[:, :, 1].astype(np.float64)
        + 0.114 * img[:, :, 2].astype(np.float64)
    )
    return float(l.mean() / 255.0)


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6) bytes — the inverse of
    `decode_image` for the resize path's re-encode step."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


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
    mapInPandas. `fake=False` REALLY decodes P6/P5/24-bpp BMP with the
    pure-numpy decoder (dims + Rec.601 mean luma); compressed formats
    raise with a clear message.
    """

    def _decode(b: bytes) -> tuple[int, int, float]:
        img = decode_image(b)
        return img.shape[0], img.shape[1], luma_mean(img)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _fake_decode if fake else _decode
        for pdf in it:
            feats = pdf["content"].map(lambda b: decoder(bytes(b or b"")))
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

    Target dims use INTEGER arithmetic (h·max_side // max(h,w)) so the
    result is bit-exact reproducible in any engine. `fake=False` reads
    REAL source dims via the pure-numpy decoder (see `resize_images`
    for the path that actually resamples pixels); the stub derives them
    from the fake decoder. Fully vectorized numpy inside mapInPandas."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def real_dims(b: bytes) -> tuple[int, int, float]:
            img = decode_image(b)
            return img.shape[0], img.shape[1], 0.0

        decoder = _fake_decode if fake else real_dims
        for pdf in it:
            dims = pdf["content"].map(lambda b: decoder(bytes(b or b"")))
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


def resize_images(df: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL aspect-preserving downscale: decode (pure numpy), nearest-
    neighbor resample (index arithmetic `floor(i·src/dst)` — no
    interpolation library), re-encode as binary PPM. Target dims use
    the same integer rule as `resize_plan`, so the two paths agree on
    shape; the emitted `content` is a decodable image. Runs per Arrow
    batch; per-image numpy fancy-indexing does the resample."""

    def _resize_one(b: bytes) -> tuple[int, int, bytes]:
        img = decode_image(b)
        h, w = img.shape[:2]
        longest = max(h, w)
        if longest > max_side:
            out_h = max(h * max_side // longest, 1)
            out_w = max(w * max_side // longest, 1)
            rows = np.arange(out_h) * h // out_h
            cols = np.arange(out_w) * w // out_w
            img = img[rows][:, cols]
        else:
            out_h, out_w = h, w
        return out_h, out_w, encode_ppm(img)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf["content"].map(lambda b: _resize_one(bytes(b or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "height": out.map(lambda t: t[0]).astype("int32"),
                    "width": out.map(lambda t: t[1]).astype("int32"),
                    "content": out.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(
        _batches, "media_id long, height int, width int, content binary"
    )


def audio_chunk_plan(
    df: DataFrame, chunk_ms: int = 10_000, fake: bool = True
) -> DataFrame:
    """Audio chunking *plan*: split each clip into fixed-length windows
    (the standard pre-step for ASR/feature extraction at scale — each
    chunk becomes one unit of downstream work, so skewed clip lengths
    can't create straggler tasks).

    `fake=False` probes REAL PCM WAV headers (`wav_duration_ms` —
    integer arithmetic over the RIFF chunks, no audio library); the stub
    derives a fake duration from sha256 bytes (1000 + (b0·256 + b1) %
    59000 ms). Either way chunk boundaries are bit-exact reproducible
    and the row explosion is vectorized repeat/arange — no per-row
    Python beyond the per-clip header probe."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_ms(b: bytes) -> int:
            d = hashlib.sha256(b).digest()
            return 1000 + ((d[0] * 256 + d[1]) % 59000)

        probe = fake_ms if fake else wav_duration_ms
        for pdf in it:
            dur = pdf["content"].map(lambda b: probe(bytes(b or b""))).to_numpy(
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
