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
