"""Multimodal plumbing tests: Arrow-batched feature extraction over
binary columns, vectorized frame explosion, metadata attach."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    multimodal,
)


def _media(spark, blobs):
    rows = [(i, "image", b) for i, b in enumerate(blobs)]
    return spark.createDataFrame(
        rows, "media_id LONG, kind STRING, content BINARY"
    )


def test_decode_image_features_deterministic(spark):
    blobs = [b"fake-image-bytes", b"", b"another blob"]
    out = {
        r.media_id: r
        for r in multimodal.decode_image_features(_media(spark, blobs)).collect()
    }
    for i, blob in enumerate(blobs):
        h = hashlib.sha256(blob).digest()
        assert out[i].height == 1 + h[0] % 64
        assert out[i].width == 1 + h[1] % 64
        assert out[i].mean_luma == pytest.approx(h[2] / 255.0)
        assert out[i].content_sha == hashlib.sha256(blob).hexdigest()


def test_decode_image_features_schema(spark):
    out = multimodal.decode_image_features(_media(spark, [b"x"]))
    assert dict(out.dtypes) == {
        "media_id": "bigint",
        "height": "int",
        "width": "int",
        "mean_luma": "double",
        "content_sha": "string",
    }


def test_real_decoder_path_raises(spark):
    df = multimodal.decode_image_features(_media(spark, [b"x"]), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|PIL|opencv"):
        df.collect()


def test_frame_sample_explosion_counts(spark):
    blobs = [b"", b"abc", b"abcdefg"]  # len % 5 = 0, 3, 2 → frames 1, 4, 3
    out = multimodal.frame_sample_plan(_media(spark, blobs), every_n=10)
    by_media = {}
    for r in out.collect():
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert sorted(by_media[0]) == [0]
    assert sorted(by_media[1]) == [0, 10, 20, 30]
    assert sorted(by_media[2]) == [0, 10, 20]


def test_resize_plan_aspect_preserving_integer_dims(spark):
    blobs = [b"x", b"yy", b"zzz"]
    out = {r.media_id: r for r in multimodal.resize_plan(
        _media(spark, blobs), max_side=16
    ).collect()}
    for i, blob in enumerate(blobs):
        h = hashlib.sha256(blob).digest()
        sh, sw = 1 + h[0] % 64, 1 + h[1] % 64
        r = out[i]
        assert (r.src_height, r.src_width) == (sh, sw)
        if max(sh, sw) > 16:
            assert max(r.height, r.width) == 16
            assert r.height == max(sh * 16 // max(sh, sw), 1)
            assert r.width == max(sw * 16 // max(sh, sw), 1)
        else:
            assert (r.height, r.width) == (sh, sw)


def test_attach_meta_byte_lengths(spark):
    df = multimodal.attach_meta(_media(spark, [b"12345", None]))
    got = {r.media_id: r.meta["bytes"] for r in df.collect()}
    assert got == {0: 5, 1: None}


def test_audio_chunk_plan_covers_duration_exactly(spark):
    blobs = [b"clip-a", b"clip-b", b"clip-c"]
    out = multimodal.audio_chunk_plan(_media(spark, blobs), chunk_ms=10_000)
    by_media = {}
    for r in out.collect():
        by_media.setdefault(r.media_id, []).append(r)
    for i, blob in enumerate(blobs):
        d = hashlib.sha256(blob).digest()
        dur = 1000 + ((d[0] * 256 + d[1]) % 59000)
        chunks = sorted(by_media[i], key=lambda r: r.chunk_idx)
        assert len(chunks) == -(-dur // 10_000)
        assert [c.start_ms for c in chunks] == [j * 10_000 for j in range(len(chunks))]
        assert chunks[-1].end_ms == dur  # last chunk clipped to duration
        for c in chunks[:-1]:
            assert c.end_ms - c.start_ms == 10_000
