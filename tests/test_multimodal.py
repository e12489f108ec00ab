"""Tests for the multimodal mapInPandas plumbing (decode stubbed with the
deterministic fake; Spark-side schema/batching/1-to-N shapes are real)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_engineering_nd_spark.operators.multimodal import (
    decode_image,
    image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=bytes(b"\x01\x02\x03" * 100),
            mime="image/png", width=None, height=None, duration_ms=None),
        Row(media_id=2, kind="image", payload=bytes(b"\xff\x00" * 50),
            mime="image/jpeg", width=None, height=None, duration_ms=None),
        Row(media_id=3, kind="video", payload=bytes(b"\x09" * 64),
            mime="video/mp4", width=None, height=None, duration_ms=3500),
        Row(media_id=4, kind="audio", payload=bytes(b"\x05" * 10),
            mime="audio/wav", width=None, height=None, duration_ms=2000),
    ]
    return spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )


def test_poly_checksum_matches_sequential_horner():
    """The vectorized checksum must be bit-identical to the reference
    per-byte Horner loop it replaced."""
    import random

    from data_engineering_nd_spark.operators.multimodal import poly_checksum

    rng = random.Random(42)
    cases = [b"", b"\x00", b"abc", bytes(range(256)),
             bytes(rng.randrange(256) for _ in range(10_000))]
    for data in cases:
        c = 0
        for b in data:
            c = (c * 131 + b) % 1_000_000_007
        assert poly_checksum(data) == c, f"mismatch on {len(data)}-byte case"


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes")


def test_image_features_schema_and_determinism(spark, media):
    out = image_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,n_bytes:bigint,checksum:bigint,"
        "decoded_width:int,decoded_height:int,mean_intensity:double>"
    )
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2}  # only images
    assert rows[1].n_bytes == 300
    again = {r.media_id: r for r in image_features(media).collect()}
    assert {k: v.checksum for k, v in rows.items()} == {
        k: v.checksum for k, v in again.items()
    }
    # fake decode contract: plausible bounded dimensions
    assert 1 <= rows[1].decoded_width <= 64
    assert 0.0 <= rows[1].mean_intensity <= 1.0


def test_frame_sampling_one_to_many(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    assert {r.media_id for r in frames} == {3}  # only video
    assert [r.frame_index for r in sorted(frames, key=lambda r: r.frame_index)] == [0, 1, 2]
    assert len({r.frame_checksum for r in frames}) == 3


def test_empty_partition_batches(spark, media):
    # mapInPandas must handle empty input batches (e.g. partitions with no
    # image rows after the filter)
    out = image_features(media.repartition(8))
    assert out.count() == 2


def test_registered_multimodal_queries(spark):
    from data_engineering_nd_spark.operators.multimodal import (
        multimodal_frame_samples_query,
        multimodal_image_features_query,
        synthetic_media,
    )

    sf = "/root/testdata/sf0.001"
    media = synthetic_media(spark, sf)
    kinds = dict(media.groupBy("kind").count().collect())
    assert set(kinds) == {"image", "video", "audio"}
    feats = multimodal_image_features_query(spark, sf)
    row = feats.orderBy("media_id").first()
    assert row.n_bytes > 0 and 0.0 <= row.mean_intensity <= 1.0
    frames = multimodal_frame_samples_query(spark, sf)
    # every video with duration >= 1s yields at least one frame row
    n_videos = media.filter("kind = 'video' AND duration_ms >= 1000").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_audio_chunking_overlap_and_energy(spark, media):
    from data_engineering_nd_spark.operators.multimodal import chunk_audio

    # media_id=4: duration 2000ms -> windows [0,2000),[1000,2000)
    chunks = sorted(
        chunk_audio(media, window_ms=2000, hop_ms=1000).collect(),
        key=lambda r: r.chunk_index,
    )
    assert [r.media_id for r in chunks] == [4, 4]
    assert [(r.start_ms, r.end_ms) for r in chunks] == [
        (0, 2000), (1000, 2000),
    ]
    # constant fake PCM (byte 0x05 everywhere) -> identical RMS per chunk
    assert len({r.rms for r in chunks}) == 1 and chunks[0].rms > 0


def test_audio_chunking_registered_query(spark):
    from data_engineering_nd_spark.operators.multimodal import (
        multimodal_audio_chunks_query,
        synthetic_media,
    )

    sf = "/root/testdata/sf0.001"
    out = multimodal_audio_chunks_query(spark, sf)
    media = synthetic_media(spark, sf)
    n_audio = media.filter("kind = 'audio' AND duration_ms > 0").count()
    assert out.select("media_id").distinct().count() == n_audio
    # chunks tile the duration: per media, max(end_ms) == duration_ms
    import pyspark.sql.functions as F

    joined = (
        out.groupBy("media_id").agg(F.max("end_ms").alias("last_end"))
        .join(media.select("media_id", "duration_ms"), "media_id")
    )
    assert joined.filter("last_end <> duration_ms").count() == 0


def test_pair_manifest_gates_both_modalities(spark):
    """A pair survives only if BOTH the token gate and the intensity gate
    pass; dropped ids are attributable to exactly one failing gate."""
    import pandas as pd
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.multimodal import (
        image_features,
        pair_manifest,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 4],
                # 1: long enough text; 2: too short; 4: long enough
                "text": ["tok " * 25, "short text", "tok " * 30],
                "lang": ["en", "en", "de"],
                "source": ["s0", "s0", "s1"],
            }
        )
    )
    media = docs.select(
        docs.doc_id.alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = pair_manifest(image_features(media), docs).collect()
    ids = {r["media_id"] for r in out}
    assert 2 not in ids  # token gate
    for r in out:
        assert 0.2 < r["mean_intensity"] < 0.6
        assert r["n_tokens"] >= 20


def test_scene_cuts_flags_checksum_jumps(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from data_engineering_nd_spark.operators.multimodal import scene_cuts

    frames = spark.createDataFrame(
        [
            # video 1: smooth, then a jump at frame 2, smooth after
            (1, 0, 1000), (1, 1, 1200), (1, 2, 900_000_000), (1, 3, 900_000_100),
            # video 2: one continuous shot
            (2, 0, 5000), (2, 1, 5100),
        ],
        ["media_id", "frame_index", "frame_checksum"],
    )
    got = {r["media_id"]: r for r in scene_cuts(frames, cut_threshold=1_000_000).collect()}
    assert got[1]["n_frames"] == 4
    assert got[1]["n_cuts"] == 1
    assert got[1]["first_cut_index"] == 2
    assert got[2]["n_cuts"] == 0
    assert got[2]["first_cut_index"] is None


def test_image_dhash_exact_duplicates_collide(spark):
    """Byte-identical payloads share a fingerprint (hamming 0); a payload
    with a different byte PATTERN lands far away; pairs surface through
    the pigeonhole blocking."""
    from pyspark.sql import functions as F

    from data_engineering_nd_spark.operators.multimodal import (
        image_dhash,
        image_dhash_pairs,
    )

    rows = [
        (1, "image", ("abcxyz" * 30).encode()),
        (2, "image", ("abcxyz" * 30).encode()),   # exact dup of 1
        (3, "image", ("zyxcba" * 30).encode()),   # reversed pattern
        (4, "video", ("abcxyz" * 30).encode()),   # wrong kind: excluded
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    fps = {r["id"]: r["fp"] for r in image_dhash(df).collect()}
    assert set(fps) == {1, 2, 3}
    assert fps[1] == fps[2]
    assert bin(fps[1] ^ fps[3]).count("1") > 3
    pairs = image_dhash_pairs(df, max_hamming=3).collect()
    assert [(r.media_id_a, r.media_id_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_dhash_seed_pairs_non_vacuous(spark):
    """The registered dhash query seeds four engineered near-duplicates
    (VERDICT r06 #2) so the gate verifies real pairs at every SF: the
    expected seed pairs and hamming distances are pinned exactly."""
    from data_engineering_nd_spark.operators.multimodal import (
        _dhash_seed_media,
        multimodal_dhash_dedup_query,
    )

    mids = [mid for mid, _ in _dhash_seed_media()]
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in multimodal_dhash_dedup_query(
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r.media_id_a in mids and r.media_id_b in mids
    }
    assert got == {
        (mids[0], mids[1]): 1,
        (mids[0], mids[2]): 2,
        (mids[0], mids[3]): 3,
        (mids[1], mids[2]): 3,
    }


def test_fake_resize_known_grid(spark):
    """Hand-checkable resize: a payload whose derived grid is known —
    nearest-neighbor index arithmetic, checksum, and mean verified
    against a direct python loop."""
    from data_engineering_nd_spark.operators.multimodal import (
        fake_decode_image,
        fake_resize_image,
    )

    payload = bytes(range(37, 37 + 200))
    meta = fake_decode_image(payload)
    got = fake_resize_image(payload, 8, 8)
    w, h, n = meta["width"], meta["height"], len(payload)
    sampled = [
        payload[(((r * h) // 8) * w + ((c * w) // 8)) % n]
        for r in range(8)
        for c in range(8)
    ]
    check = 0
    for b in sampled:
        check = (check * 131 + b) % 1_000_000_007
    assert got["resized_checksum"] == check
    assert abs(got["resized_mean"] - sum(sampled) / 64 / 255.0) < 1e-12


def test_resize_thumbnails_only_images(spark):
    from data_engineering_nd_spark.operators.multimodal import resize_thumbnails

    rows = [
        (1, "image", b"abcdefgh" * 10),
        (2, "video", b"abcdefgh" * 10),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = resize_thumbnails(df).collect()
    assert [r.media_id for r in out] == [1]
    assert out[0].thumb_w == 8 and out[0].thumb_h == 8


def test_vad_segments_known_runs(spark):
    """Hand-built chunk frame: runs of active chunks merge across
    contiguous indices and split on gaps; boundaries and peaks exact."""
    from data_engineering_nd_spark.operators.multimodal import vad_segments

    rows = [
        # media 1: active 0-1, gap, active 3
        (1, 0, 0, 2000, 50.0),
        (1, 1, 1000, 3000, 60.0),
        (1, 2, 2000, 4000, 10.0),
        (1, 3, 3000, 5000, 47.0),
        # media 2: nothing active
        (2, 0, 0, 2000, 44.9),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, chunk_index int, start_ms int, end_ms int, rms double"
    )
    got = sorted(
        vad_segments(df, rms_threshold=45.0).collect(),
        key=lambda r: (r.media_id, r.segment_index),
    )
    assert [
        (r.media_id, r.segment_start_ms, r.segment_end_ms, r.n_chunks, r.peak_rms)
        for r in got
    ] == [(1, 0, 3000, 2, 60.0), (1, 3000, 5000, 1, 47.0)]


def test_dedup_decisions_keep_best_per_cluster(spark):
    """The four engineered seeds form one connected cluster (pairs
    1-2, 1-3, 1-4, 2-3); payloads are equal-length so the ascending
    media_id tie-break keeps the base seed and drops the variants."""
    from data_engineering_nd_spark.operators.multimodal import (
        _dhash_seed_media,
        multimodal_dedup_decisions_query,
    )

    mids = [mid for mid, _ in _dhash_seed_media()]
    rows = {
        r.media_id: r
        for r in multimodal_dedup_decisions_query(
            spark, "/root/testdata/sf0.001"
        ).collect()
        if r.media_id in mids
    }
    assert set(rows) == set(mids)
    assert all(r.cluster_id == mids[0] for r in rows.values())
    assert rows[mids[0]].decision == "keep"
    assert all(rows[m].decision == "drop" for m in mids[1:])
    assert all(r.payload_bytes == 61 for r in rows.values())
