"""Perceptual image hash (dHash) + pigeonhole near-dup pairs: the
invariance/sensitivity properties the operator exists for, and the
losslessness of the 4-chunk candidate join vs brute force."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (  # noqa: E501
    multimodal,
)


def _pgm(px: bytes) -> bytes:
    assert len(px) == 72
    return b"P5\n9 8\n255\n" + px


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, content binary")


def _ref_dhash_chunks(px: bytes) -> list[int]:
    """Independent reference: dHash bits straight from the pixel bytes
    (no decoder, no numpy broadcasting tricks)."""
    g = [list(px[r * 9 : r * 9 + 9]) for r in range(8)]
    chunks = [0, 0, 0, 0]
    for r in range(8):
        for c in range(8):
            if g[r][c] < g[r][c + 1]:
                bi = r * 8 + c
                chunks[bi // 16] |= 1 << (bi % 16)
    return chunks


def _rand_px(seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    return bytes(rng.randint(0, 192, 72, dtype=np.uint8).tolist())


def test_dhash_matches_reference_and_decoder_path(spark):
    rows = [(i, _pgm(_rand_px(i))) for i in range(20)]
    got = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in multimodal.image_dhash_chunks(_media(spark, rows)).collect()
    }
    for i in range(20):
        assert got[i] == _ref_dhash_chunks(_rand_px(i)), i


def test_dhash_brightness_shift_invariance(spark):
    # uniform +40 (clamp-free: inputs < 192) leaves every comparison,
    # hence the hash, unchanged — the property that makes dHash a
    # near-dup detector rather than a checksum
    px = _rand_px(7)
    shifted = bytes(x + 40 for x in px)
    got = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in multimodal.image_dhash_chunks(
            _media(spark, [(1, _pgm(px)), (2, _pgm(shifted))])
        ).collect()
    }
    assert got[1] == got[2]


def test_single_pixel_edit_flips_at_most_its_comparisons(spark):
    # pixel (0,0) participates in exactly one comparison → hamming ≤ 1
    px = bytearray(_rand_px(11))
    edited = bytearray(px)
    edited[0] = 255
    sigs = multimodal.image_dhash_chunks(
        _media(spark, [(1, _pgm(bytes(px))), (2, _pgm(bytes(edited)))])
    )
    pairs = multimodal.dhash_near_dup_pairs(sigs).collect()
    assert len(pairs) == 1
    assert pairs[0]["hamming"] <= 1


def _structured_px(flips: int) -> bytes:
    """9×8 image built from DISJOINT comparison pairs: every row is
    [10,200, 10,200, 10,200, 10,200, 10] — the four even comparisons
    (c=0,2,4,6) read one (10,200) pair each, the odd/last comparisons
    sit between pairs and stay 0 when a pair's NEIGHBORS are unswapped
    (200 vs 10 or equal values — strict <; two ADJACENT swaps would
    flip the between-comparison too, which is why each planted flip
    lives in its OWN ROW). Swapping the first pair of row j flips
    exactly bit (j, 0); `flips` swaps plant exact hamming `flips`."""
    px = bytearray([10, 200] * 4 + [10]) * 8
    for j in range(flips):
        px[9 * j], px[9 * j + 1] = 200, 10
    return bytes(px)


def test_pigeonhole_is_lossless_vs_brute_force(spark):
    # every hamming-≤3 pair must survive the chunk-equality candidate
    # join; plant exact distances 0..4 (4 must be excluded by the
    # verify, 0..3 included) plus random noise images
    rows = [(d, _pgm(_structured_px(d))) for d in range(5)]
    rows.append((100, _pgm(_structured_px(0))))  # distance-0 twin
    for i in range(10, 30):
        rows.append((i, _pgm(_rand_px(i))))
    sigs = multimodal.image_dhash_chunks(_media(spark, rows)).persist()
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.dhash_near_dup_pairs(sigs, max_hamming=3).collect()
    }
    # brute force over collected sigs
    all_sigs = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in sigs.collect()
    }
    want = {}
    ids = sorted(all_sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(
                bin(x ^ y).count("1")
                for x, y in zip(all_sigs[a], all_sigs[b])
            )
            if h <= 3:
                want[(a, b)] = h
    sigs.unpersist()
    assert got == want
    assert want, "fixture must plant at least one close pair"


def test_dhash_rejects_wrong_grid_and_deep_hamming(spark):
    import pytest

    bad = _media(spark, [(1, b"P5\n4 4\n255\n" + bytes(16))])
    with pytest.raises(Exception, match="9x8|resize"):
        multimodal.image_dhash_chunks(bad).collect()
    sigs = spark.createDataFrame(
        [(1, 0, 0, 0, 0)], "media_id long, c0 int, c1 int, c2 int, c3 int"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.dhash_near_dup_pairs(sigs, max_hamming=4)


def _ref_audio_chunks(samples: list[int]) -> list[int]:
    """Independent reference: contour bits straight from sample ints."""
    e = [
        samples[2 * f] ** 2 + samples[2 * f + 1] ** 2 for f in range(65)
    ]
    chunks = [0, 0, 0, 0]
    for f in range(64):
        if e[f] < e[f + 1]:
            chunks[f // 16] |= 1 << (f % 16)
    return chunks


def _wav_rows(spark, rows):
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators.multimodal import (  # noqa: E501
        encode_wav,
    )

    return _media(
        spark,
        [(i, encode_wav(np.asarray(s, dtype=np.int16))) for i, s in rows],
    )


def _rand_samples(seed: int) -> list[int]:
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 256, 130) - 128).tolist()


def test_audio_contour_matches_reference(spark):
    rows = [(i, _rand_samples(i)) for i in range(10)]
    got = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in multimodal.audio_energy_chunks(
            _wav_rows(spark, rows)
        ).collect()
    }
    for i, s in rows:
        assert got[i] == _ref_audio_chunks(s), i


def test_audio_contour_gain_invariance_and_spike(spark):
    s = _rand_samples(5)
    gained = [x * 7 for x in s]  # any uniform gain, not just 2
    spiked = list(s)
    spiked[0] = 16000
    sigs = multimodal.audio_energy_chunks(
        _wav_rows(spark, [(1, s), (2, gained), (3, spiked)])
    ).persist()
    got = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in sigs.collect()
    }
    assert got[1] == got[2]  # gain never moves a comparison
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.dhash_near_dup_pairs(sigs).collect()
    }
    sigs.unpersist()
    assert pairs[(1, 2)] == 0
    # sample 0 perturbs frame 0 only → at most bit 0 flips
    assert pairs[(1, 3)] <= 1


def test_audio_contour_rejects_short_clips(spark):
    import pytest

    short = _wav_rows(spark, [(1, [0] * 64)])
    with pytest.raises(Exception, match="129|130|samples"):
        multimodal.audio_energy_chunks(short).collect()


def test_video_container_roundtrip_and_errors():
    import pytest

    frames = [_pgm(_rand_px(i)) for i in range(3)]
    blob = multimodal.encode_video_frames(frames)
    assert multimodal.decode_video_frames(blob) == frames
    assert multimodal.decode_video_frames(
        multimodal.encode_video_frames([])
    ) == []
    with pytest.raises(NotImplementedError, match="VID0"):
        multimodal.decode_video_frames(b"RIFF....")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_video_frames(blob[:-5])


def test_video_frame_dhash_matches_image_path(spark):
    frames = [_pgm(_rand_px(i)) for i in range(3)]
    vid = _media(
        spark, [(7, multimodal.encode_video_frames(frames))]
    )
    got = {
        r["frame_idx"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in multimodal.video_frame_dhash(vid).collect()
    }
    want = {
        i: _ref_dhash_chunks(_rand_px(i)) for i in range(3)
    }
    assert got == want


def test_video_shared_frames_set_semantics(spark):
    f = [_pgm(_rand_px(100 + i)) for i in range(4)]
    bright = _pgm(bytes(x + 30 for x in _rand_px(100)))  # dHash == f[0]
    vids = [
        (1, multimodal.encode_video_frames([f[0], f[1], f[2]])),
        # re-cut: shares f[1], f[2] → 2
        (2, multimodal.encode_video_frames([f[1], f[2], f[3]])),
        # one perceptual frame looped 3× → shares ONE signature with 1
        (3, multimodal.encode_video_frames([bright, bright, bright])),
    ]
    frames = multimodal.video_frame_dhash(_media(spark, vids))
    got = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in multimodal.video_near_dup_pairs(
            frames, min_shared=1
        ).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1}
    # min_shared=2 drops the single-frame overlap
    got2 = {
        (r["id_a"], r["id_b"]): r["shared_frames"]
        for r in multimodal.video_near_dup_pairs(
            frames, min_shared=2
        ).collect()
    }
    assert got2 == {(1, 2): 2}


def test_video_frame_dhash_stride_skips_decode(spark):
    """stride=s keeps exactly the frame_idx % s == 0 rows, and a frame
    that would CRASH the image decoder is never touched when it falls
    outside the stride — the structural proof that unsampled frames
    skip the decode, not just the output."""
    frames = [_pgm(_rand_px(i)) for i in range(4)]
    frames[1] = b"\xff\xd8garbage-not-an-image"  # would raise in decode
    frames[3] = b"also-not-an-image"
    vid = _media(spark, [(5, multimodal.encode_video_frames(frames))])
    got = {
        r["frame_idx"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in multimodal.video_frame_dhash(vid, stride=2).collect()
    }
    assert got == {
        0: _ref_dhash_chunks(_rand_px(0)),
        2: _ref_dhash_chunks(_rand_px(2)),
    }


def test_video_sampled_index_retention_and_alignment_failure(spark):
    """The r12-verdict task-5 retention pin, on planted re-cuts: 10
    originals of 8 frames each, each with a one-frame-shifted re-cut
    (drop frame 0, append a new tail). The FULL path finds all 10
    pairs (7 shared frames). The sampled path (stride-2 INDEX, full
    PROBE) retains 10/10 in both orientations — any shared run ≥
    stride contains a sampled index frame. The naive both-sides-strided
    join retains 0/10: an odd frame shift never aligns with an even
    stride (why video_sampled_near_dup_pairs is asymmetric by
    design)."""
    vids = []
    for d in range(10):
        fr = [_pgm(_rand_px(1000 + d * 16 + i)) for i in range(8)]
        tail = _pgm(_rand_px(1000 + d * 16 + 15))
        vids.append((d, multimodal.encode_video_frames(fr)))
        vids.append((100 + d, multimodal.encode_video_frames(fr[1:] + [tail])))
    media = _media(spark, vids)
    full = multimodal.video_frame_dhash(media)
    strided = multimodal.video_frame_dhash(media, stride=2)

    full_pairs = {
        (r["id_a"], r["id_b"])
        for r in multimodal.video_near_dup_pairs(full, min_shared=2).collect()
    }
    assert full_pairs == {(d, 100 + d) for d in range(10)}

    sampled = multimodal.video_sampled_near_dup_pairs(
        full, strided, min_shared=2
    ).collect()
    oriented = {(r["probe_id"], r["index_id"]): r["shared_sampled"] for r in sampled}
    for d in range(10):
        # probe=re-cut vs strided original index: sampled originals are
        # frames {0,2,4,6}; the re-cut contains {2,4,6} of them → 3
        assert oriented[(100 + d, d)] == 3
        # probe=original vs strided re-cut index: sampled re-cut frames
        # are sources {1,3,5,7}, all present in the original → 4
        assert oriented[(d, 100 + d)] == 4
    # retention: every full-path pair survives sampling (as either
    # orientation)
    found = {(min(a, b), max(a, b)) for a, b in oriented}
    assert full_pairs <= found

    # the alignment failure: striding BOTH sides finds nothing — the
    # one-frame shift never lands on the stride-2 grid
    naive = multimodal.video_sampled_near_dup_pairs(
        strided, strided, min_shared=1
    ).collect()
    assert naive == []


def test_mih_index_search_is_lossless_and_bounded(spark, tmp_path):
    # radius-3 losslessness vs brute force over a corpus with planted
    # exact distances 0..4 (reusing the disjoint-pair images), plus the
    # pigeonhole-bound rejection and the ranked output contract
    import pytest

    rows = [(d, _pgm(_structured_px(d))) for d in range(5)]
    for i in range(10, 40):
        rows.append((i, _pgm(_rand_px(i))))
    sigs = multimodal.image_dhash_chunks(_media(spark, rows)).persist()
    path = str(tmp_path / "mih")
    multimodal.build_mih_index(sigs, path, cb_bits=4)
    all_sigs = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in sigs.collect()
    }
    sigs.unpersist()
    q = all_sigs[0]
    got = [
        (r["media_id"], r["hamming"])
        for r in multimodal.mih_topk_from_index(
            spark, path, q, k=10, max_hamming=3, cb_bits=4
        ).collect()
    ]
    want = sorted(
        (
            (mid, sum(bin(x ^ y).count("1") for x, y in zip(s, q)))
            for mid, s in all_sigs.items()
        ),
        key=lambda t: (t[1], t[0]),
    )
    want = [(m, h) for m, h in want if h <= 3][:10]
    assert got == want
    # the planted ladder: distances 0..3 in order, 4 excluded
    assert [(m, h) for m, h in got if m < 5] == [
        (0, 0), (1, 1), (2, 2), (3, 3)
    ]
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.mih_topk_from_index(spark, path, q, max_hamming=4)
    with pytest.raises(ValueError, match="4 chunk"):
        multimodal.mih_topk_from_index(spark, path, [1, 2, 3])


def test_mih_bulk_topk_matches_per_query_path(spark, tmp_path):
    """mih_bulk_topk (one job, every query joined against the four
    chunk tables) must return exactly what per-query
    mih_topk_from_index returns for each query — and exclude_self
    drops only the query's own row."""
    rows = [(d, _pgm(_structured_px(d))) for d in range(5)]
    for i in range(10, 40):
        rows.append((i, _pgm(_rand_px(i))))
    sigs = multimodal.image_dhash_chunks(_media(spark, rows)).persist()
    path = str(tmp_path / "mih_bulk")
    multimodal.build_mih_index(sigs, path, cb_bits=4)
    all_sigs = {
        r["media_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in sigs.collect()
    }
    queries = sigs.select(
        multimodal.F.col("media_id").alias("query_id"),
        "c0", "c1", "c2", "c3",
    )
    bulk = multimodal.mih_bulk_topk(
        spark, path, queries, k=10, max_hamming=3, cb_bits=4
    ).collect()
    sigs.unpersist()
    got = {}
    for r in bulk:
        got.setdefault(r["query_id"], []).append((r["hamming"], r["media_id"]))
    for qid, qsig in all_sigs.items():
        want = [
            (r["hamming"], r["media_id"])
            for r in multimodal.mih_topk_from_index(
                spark, path, qsig, k=10, max_hamming=3, cb_bits=4
            ).collect()
        ]
        assert sorted(got.get(qid, [])) == sorted(want), qid
    # exclude_self: identical minus the (q, q, 0) rows
    bulk_ns = multimodal.mih_bulk_topk(
        spark, path, queries, k=10, max_hamming=3, cb_bits=4,
        exclude_self=True,
    ).collect()
    assert all(r["query_id"] != r["media_id"] for r in bulk_ns)
