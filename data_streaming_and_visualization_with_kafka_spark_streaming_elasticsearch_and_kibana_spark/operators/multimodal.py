"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns + a typed metadata struct; all
transforms run as Arrow-batched `mapInPandas` so bytes never round-trip
through Python row objects one at a time.

Codec support is two-tier. `fake=True` (default in this container) uses
a deterministic stand-in decoder (seeded from the bytes) so the
Spark-side plumbing — schema, batching, partitioning — is exercised
without any imaging library. `fake=False` is REAL for the uncompressed
formats a pure-stdlib decoder can handle: binary PPM (P6) / PGM (P5),
24-bpp uncompressed BMP, 8/16-bit PNG including Adam7 interlace
(stdlib `zlib` inflate + the five PNG filters in numpy — gray, RGB,
palette, gray+alpha, RGBA), and PCM WAV headers for audio chunking — decode,
luma stats, and nearest-neighbor resize all run vectorized inside the
Arrow batch. The formats that genuinely need a codec library
(JPEG/MP3/…, sub-byte PNG depths) still raise NotImplementedError with
a clear message: production clusters have PIL/ffmpeg, this container
doesn't.
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
    """(H, W, 3) uint8 from the formats a pure-stdlib decoder can
    parse: binary PPM (P6), binary PGM (P5, gray replicated to 3
    channels), 24-bpp uncompressed bottom-up or top-down BMP, and
    8/16-bit PNG — all five color types, Adam7 interlace included
    (alpha dropped, gray replicated, palette resolved, 16-bit reduced
    to the high byte). Raises NotImplementedError for formats that
    need a codec library (JPEG; sub-byte PNG depths) and ValueError
    for corrupt input."""
    if content[:2] in (b"P6", b"P5"):
        return _decode_pnm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:8] == PNG_SIGNATURE:
        return _decode_png(content)
    raise NotImplementedError(
        "unsupported image format (pure-stdlib path decodes P6/P5/24-bpp "
        "BMP/8-16-bit PNG; JPEG needs PIL/opencv)"
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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel for each PNG color type (palette is 1 index/px)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(content: bytes):
    """Yield (type, data) for each chunk; lengths are validated so a
    truncated file raises ValueError instead of reading garbage. CRCs
    are not verified — corruption surfaces as a zlib/shape error, and
    a luma-stat pipeline has no use for silent-skip semantics."""
    pos = 8
    while pos + 8 <= len(content):
        size = int.from_bytes(content[pos : pos + 4], "big")
        ctype = content[pos + 4 : pos + 8]
        if pos + 12 + size > len(content):
            raise ValueError("truncated PNG chunk")
        yield ctype, content[pos + 8 : pos + 8 + size]
        if ctype == b"IEND":
            return
        pos += 12 + size
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_defilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-scanline PNG filters (spec §9): each row carries a
    filter-type byte, then `stride` filtered bytes. None/Up/Sub are
    fully vectorized (Up is a uint8 add of the prior row; Sub is a
    cumulative sum per byte lane — addition mod 256 commutes with
    cumsum). Average and Paeth depend on the left AND upper neighbor,
    so they are inherently sequential in x — those rows fall back to a
    per-byte loop. Real corpora are encoded almost entirely with
    Up/Sub/None by libpng's heuristic; at cluster scale the hot decode
    path would be a C codec anyway (see module docstring)."""
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel data is {len(raw)} bytes, expected "
            f"{height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else zero_row
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: cumsum per lane, mod 256
            for k in range(bpp):
                out[y, k::bpp] = np.cumsum(
                    line[k::bpp], dtype=np.uint64
                ).astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


#: Adam7 interlace passes: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _decode_png(content: bytes) -> np.ndarray:
    """8/16-bit PNG → (H, W, 3) uint8 RGB, pure stdlib: chunk walk,
    zlib inflate of the concatenated IDAT stream, the five scanline
    filters in numpy (per Adam7 pass when interlaced — each pass is an
    independently filtered sub-image scattered back by strided
    assignment), then color-type normalization (gray replicated,
    palette resolved via PLTE fancy-indexing, alpha DROPPED —
    stats/resize consume straight RGB; compositing is a policy choice
    left to the caller). 16-bit samples reduce to their high byte (the
    standard 16→8 approximation; sub-1/256 precision has no consumer in
    this pipeline). Bit depths 1/2/4 raise NotImplementedError."""
    import zlib

    header = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            header = data
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if header is None or len(header) != 13:
        raise ValueError("PNG missing IHDR")
    width = int.from_bytes(header[0:4], "big")
    height = int.from_bytes(header[4:8], "big")
    depth, color_type, _comp, _filt, interlace = header[8:13]
    if depth not in (8, 16):
        raise NotImplementedError(
            f"only 8-bit/16-bit PNG supported (depth={depth})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    if width <= 0 or height <= 0:
        raise ValueError("bad PNG dimensions")
    channels = _PNG_CHANNELS[color_type]
    nbytes = depth // 8
    bpp = channels * nbytes
    raw = zlib.decompress(bytes(idat))

    def to8(grid2d: np.ndarray, h: int, w: int) -> np.ndarray:
        """(h, w*channels*nbytes) defiltered bytes → (h, w, channels)
        uint8 (16-bit big-endian samples keep their high byte)."""
        if nbytes == 2:
            grid2d = grid2d.reshape(h, w * channels, 2)[:, :, 0]
        return grid2d.reshape(h, w, channels)

    if interlace == 0:
        grid = to8(
            _png_defilter(raw, height, width * bpp, bpp), height, width
        )
    else:
        grid = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            sub = _png_defilter(raw[pos : pos + need], ph, stride, bpp)
            pos += need
            grid[y0::dy, x0::dx] = to8(sub, ph, pw)
        if pos != len(raw):
            raise ValueError(
                f"Adam7 pixel data is {len(raw)} bytes, expected {pos}"
            )
    if color_type == 2:  # RGB
        return grid
    if color_type == 6:  # RGBA → drop alpha
        return np.ascontiguousarray(grid[:, :, :3])
    if color_type == 0:  # gray
        return np.repeat(grid, 3, axis=2)
    if color_type == 4:  # gray+alpha
        return np.repeat(grid[:, :, :1], 3, axis=2)
    if palette is None:
        raise ValueError("palette PNG missing PLTE")
    idx = grid[:, :, 0]
    if idx.size and int(idx.max()) >= len(palette):
        # keep the documented corrupt-input contract: ValueError, not a
        # numpy IndexError from unchecked fancy-indexing
        raise ValueError(
            f"palette index {int(idx.max())} out of range "
            f"(PLTE has {len(palette)} entries)"
        )
    return palette[idx]  # indexed


def encode_png(
    img: np.ndarray,
    color_type: int = 2,
    filters: list[int] | None = None,
) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes, pure stdlib — the test/fixture
    twin of `_decode_png` (and a usable sink encoding: PNG is the
    lossless interchange format PPM is not). `filters` picks the
    per-scanline filter type (cycled row-by-row; default all-None);
    forward filtering is vectorized int16 arithmetic mod 256. Color
    types: 0 gray (H,W or (H,W,1)), 2 RGB, 6 RGBA."""
    import struct
    import zlib

    if color_type not in (0, 2, 6):
        raise NotImplementedError(
            f"encode_png writes gray/RGB/RGBA (got color type {color_type})"
        )
    want = {0: 1, 2: 3, 6: 4}[color_type]
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] != want:
        raise ValueError(
            f"color type {color_type} needs {want} channels, "
            f"got {img.shape[2]}"
        )
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    rows = img.reshape(h, w * c).astype(np.int16)
    zero = np.zeros(w * c, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        ftype = filters[y % len(filters)] if filters else 0
        cur = rows[y]
        prev = rows[y - 1] if y else zero
        left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int16), prev[:-c]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + chunk(b"IEND", b"")
    )


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
