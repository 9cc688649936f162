"""Property-based codec round-trips (SURVEY §5.4: decode(encode(row)) ==
row for random rows). Examples are batched into one DataFrame per case
so hypothesis doesn't pay a Spark job per generated string."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.functions import (
    codecs,
)

# printable-ish unicode, excluding the delimited test's separator
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.integers(-(2**62), 2**62), TEXT), min_size=1, max_size=8))
def test_json_roundtrip_property(spark, rows):
    ddl = "id BIGINT, s STRING"
    df = spark.createDataFrame(rows, ddl)
    back = (
        df.select(codecs.json_encode(["id", "s"]).alias("v"))
        .select(codecs.json_decode("v", ddl).alias("d"))
        .select("d.*")
    )
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**31), 2**31),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters="\x00|\r\n",
                ),
                min_size=1,
                max_size=30,
            ),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_delimited_roundtrip_property(spark, rows):
    ddl = "id BIGINT, s STRING, x DOUBLE"
    df = spark.createDataFrame(rows, ddl)
    back = (
        df.select(codecs.delimited_encode(["id", "s", "x"], sep="|").alias("v"))
        .select(codecs.delimited_decode("v", ddl, sep="|").alias("d"))
        .select("d.*")
    )
    assert sorted(back.collect(), key=str) == sorted(df.collect(), key=str)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), blacklist_characters="\x00"
            ),
            min_size=1,
            max_size=600,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_doc_chunks_cover_and_stitch_back_property(spark, texts):
    """Chunking invariants for arbitrary text (q_doc_chunks geometry,
    size=200/stride=150): chunk starts tile the doc with 50-char
    overlap, and chunk0 + every later chunk's last (size−stride) slice
    reconstructs the original text exactly — no position lost, none
    duplicated beyond the declared overlap."""
    size, stride = 200, 150
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # same expression pipeline as q_doc_chunks, applied to this frame
    from pyspark.sql import functions as F

    n = F.length("text")
    idx = F.sequence(
        F.lit(0),
        F.ceil(F.greatest(n - size, F.lit(0)) / float(stride)).cast("int"),
    )
    chunk = F.col("text").substr(
        (F.col("chunk_idx") * stride + 1).cast("int"), F.lit(size)
    )
    rows = (
        df.select("doc_id", F.explode(idx).alias("chunk_idx"), "text")
        .select("doc_id", "chunk_idx", chunk.alias("chunk"))
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk
    for i, t in enumerate(texts):
        chunks = [by_doc[i][j] for j in sorted(by_doc[i])]
        stitched = chunks[0] + "".join(c[size - stride:] for c in chunks[1:])
        assert stitched == t, (len(t), [len(c) for c in chunks])


# ---------------------------------------------------------- PNG codec
# pure-python roundtrips — no Spark session, so hypothesis can afford
# real example counts here
import numpy as np

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    multimodal,
)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    color_type=st.sampled_from([0, 2, 6]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=7),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, color_type, filters, seed):
    """decode(encode(img)) == normalize(img) for arbitrary dims, color
    types, per-row filter sequences, and pixel content — the SURVEY
    §5.4 law applied to the image codec (gray replicates, alpha
    drops)."""
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, channels), dtype=np.uint8
    )
    got = multimodal.decode_image(
        multimodal.encode_png(img, color_type, filters)
    )
    want = (
        img
        if color_type == 2
        else (
            img[:, :, :3]
            if color_type == 6
            else np.repeat(img, 3, axis=2)
        )
    )
    assert got.shape == want.shape and (got == want).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_property(h, w, seed):
    """Interlaced decode reproduces the plane for arbitrary dims —
    exercises every empty/partial-pass edge shape; the interlaced
    stream is built from the spec's strides, independent of the
    decoder's scatter."""
    import struct
    import zlib

    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    raw = bytearray()
    for x0, y0, dx, dy in [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw.extend(row.astype(np.uint8).tobytes())

    def chunk(t, d):
        body = t + d
        return (
            struct.pack(">I", len(d))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    png = (
        multimodal.PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = multimodal.decode_image(png)
    assert got.shape == img.shape and (got == img).all()


# ------------------------------------------------- image codec properties
# No Spark involved: the JPEG/PNG codecs are pure numpy, so hypothesis
# can afford real example counts.
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (  # noqa: E402
    multimodal,
)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
    st.integers(1, 40),
    st.integers(1, 40),
)
def test_jpeg_entropy_layer_bit_exact_property(seed, sampling, bw, bh):
    """For ANY quantized coefficient blocks and sampling mode, the
    entropy layer (Huffman + stuffing + DC prediction) is lossless:
    decode(encode(coeffs)) == coeffs exactly."""
    import numpy as np

    rng = np.random.RandomState(seed)
    sh, sv = sampling
    # luma grid must tile the MCU grid implied by the sampling factors
    mcus_x, mcus_y = bw, bh
    y = np.clip(
        rng.randint(-1023, 1024, (mcus_y * sv, mcus_x * sh, 8, 8)),
        -1023,
        1023,
    ).astype(np.int32)
    cb = rng.randint(-300, 300, (mcus_y, mcus_x, 8, 8)).astype(np.int32)
    cr = rng.randint(-300, 300, (mcus_y, mcus_x, 8, 8)).astype(np.int32)
    qt = np.ones((8, 8), np.int64)
    fix = multimodal.encode_jpeg_from_coeffs(
        [y, cb, cr],
        [qt],
        mcus_x * sh * 8,
        mcus_y * sv * 8,
        [(sh, sv), (1, 1), (1, 1)],
        restart_interval=rng.choice([0, 1, 3]),
    )
    p = multimodal._parse_jpeg(fix)
    for got, want in zip(p["coeffs"], [y, cb, cr]):
        assert (got == want).all()


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(3, 33),
    st.integers(3, 25),
)
def test_jpeg_q100_roundtrip_error_bound_property(seed, w, h):
    """Quality-100 (all-ones tables) roundtrip error is bounded by
    FDCT/quantizer rounding for ANY image and dimensions (incl. the
    pad-and-crop path for non-multiple-of-8 sizes)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    dec = multimodal.decode_image(multimodal.encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


@settings(max_examples=15, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.sampled_from([1, 2, 4]),
    st.integers(1, 30),
    st.integers(1, 12),
)
def test_png_sub_byte_roundtrip_property(seed, depth, w, h):
    """Hand-packed sub-byte gray PNGs decode to exactly the source
    samples times the left-bit-replication factor, for any dims
    (pad-bit handling) and depth."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 1 << depth, (h, w))
    rows = bytearray()
    for yy in range(h):
        bits = []
        for v in img[yy]:
            bits.extend(
                [(int(v) >> (depth - 1 - i)) & 1 for i in range(depth)]
            )
        while len(bits) % 8:
            bits.append(0)
        rows += b"\x00" + np.packbits(np.array(bits, np.uint8)).tobytes()

    def chunk(t, d):
        body = t + d
        return (
            struct.pack(">I", len(d))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    png = (
        multimodal.PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    got = multimodal.decode_image(png)
    assert (got[:, :, 0] == img * (255 // ((1 << depth) - 1))).all()


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(0, 3))
def test_image_decoders_never_raise_unclassified_errors(payload, magic_i):
    """Fuzz gate: arbitrary bytes behind each format magic must decode
    or raise the CONTRACTED error types (ValueError /
    NotImplementedError / zlib.error wrapped as data corruption) —
    never IndexError/KeyError/struct.error escaping into an Arrow
    worker. (The r6 review found exactly such an IndexError on JPEGs
    truncated at a fill byte.)"""
    import zlib

    magic = [
        b"\xff\xd8",  # JPEG SOI
        multimodal.PNG_SIGNATURE,
        b"P6\n",
        b"BM",
    ][magic_i]
    try:
        multimodal.decode_image(magic + payload)
    except (ValueError, NotImplementedError, zlib.error):
        pass  # classified rejection is the contract
    except OverflowError:
        pass  # absurd header dims -> numpy size overflow, acceptable


WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "zeta", "eta"])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(WORD, min_size=1, max_size=12), min_size=1, max_size=6
    )
)
def test_passage_dedup_differential_property(spark, docs_words):
    """Differential property: dedup.passage_dedup over random small-pool
    corpora equals a pure-Python replay of the same election — global
    first (doc_id, pos) keeps each distinct passage, reconstruction
    preserves order, counts agree."""
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
        dedup,
    )

    W = 3
    docs = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    # pure-Python oracle
    expected = {}
    seen: set[str] = set()
    for i, ws in enumerate(docs_words):
        chunks = [
            " ".join(ws[p : p + W]) for p in range(0, len(ws), W)
        ] or [""]
        kept = []
        dups = 0
        for c in chunks:
            if c in seen:
                dups += 1
            else:
                seen.add(c)
                kept.append(c)
        expected[i] = (len(chunks), dups, " ".join(kept))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_passages, r.n_dup_passages, r.kept_text)
        for r in dedup.passage_dedup(
            df, text_col="text", id_col="doc_id", window_words=W
        ).collect()
    }
    assert got == expected
