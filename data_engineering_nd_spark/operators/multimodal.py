"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

Part of the training-data-pipeline surface (BASELINE.json north star). The
container has no image/audio codecs, so the *decode kernels* are stubs — a
deterministic fake for tests plus NotImplementedError for the real thing —
but everything Spark-side is real and tested: the schema contract, the
mapInPandas batch iteration, output schema declaration, and the
partition-preserving shape (no shuffle introduced by decode/featurize).

Scale design: media bytes never leave the executor; per-batch processing is
Arrow-columnar; decode output schemas are declared so downstream Catalyst
plans prune/push down normally. For 100 TB of media you'd partition by
content shard, keep batches ~64MB (spark.sql.execution.arrow.
maxRecordsPerBatch), and resize/feature-extract in the same pass to avoid
re-reading bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, n_bytes bigint, checksum bigint, "
    "decoded_width int, decoded_height int, mean_intensity double"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_index int, frame_checksum bigint"


def decode_image(payload: bytes) -> dict:
    """Real decoder — requires an image codec library not present in this
    container. The Spark plumbing calls fake_decode_image in tests."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode_image "
        "or plug a real decoder with the same return contract"
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in with the same contract as decode_image:
    returns dict(width, height, mean_intensity) derived purely from bytes."""
    n = len(payload)
    checksum = 0
    for b in payload:
        checksum = (checksum * 131 + b) % 1_000_000_007
    return {
        "width": (checksum % 64) + 1,
        "height": ((checksum // 64) % 64) + 1,
        "mean_intensity": (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0,
    }


def image_features(df: DataFrame, decoder=fake_decode_image) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas (Arrow batches).

    One narrow pass over the media partitions: no shuffle, media bytes stay
    executor-local, output is a small typed frame that joins back on
    media_id.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                checksum = 0
                for b in data:
                    checksum = (checksum * 131 + b) % 1_000_000_007
                d = decoder(data)
                out.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(data),
                        "checksum": checksum,
                        "decoded_width": d["width"],
                        "decoded_height": d["height"],
                        "mean_intensity": d["mean_intensity"],
                    }
                )
            yield pd.DataFrame(out, columns=[c.split()[0] for c in IMAGE_FEATURES_SCHEMA.split(", ")])

    return df.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        process, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per sampled
    frame index based on duration metadata (the decode of actual frames is
    the stubbed step). Demonstrates the 1-to-N mapInPandas shape."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, duration, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n_frames = max(int((duration or 0) // every_ms), 0)
                data = bytes(payload) if payload is not None else b""
                base = sum(data[:64]) + 1
                for i in range(n_frames):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": i,
                            "frame_checksum": (base * 131 + i) % 1_000_000_007,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_checksum"]
            )

    return df.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms", "payload"
    ).mapInPandas(process, FRAME_SAMPLE_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "media_id bigint, chunk_index int, start_ms int, end_ms int, rms double"
)


def decode_audio(payload: bytes) -> "list[float]":
    """Real decoder — requires an audio codec library not present in this
    container. The Spark plumbing uses the deterministic byte-level fake."""
    raise NotImplementedError(
        "audio codecs unavailable in this environment; chunk_audio uses the "
        "payload bytes as fake PCM"
    )


def chunk_audio(
    df: DataFrame, window_ms: int = 2000, hop_ms: int = 1000
) -> DataFrame:
    """Overlapping-window audio chunking: each payload expands to
    ceil(duration/hop) windows of ``window_ms`` with an RMS-style energy
    per chunk. The 1-to-N-with-overlap mapInPandas shape (hop < window
    means adjacent chunks share samples) — with a real codec only the
    sample-extraction line changes. Chunking is per-row and narrow: no
    shuffle, parallelism = input partitions."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, duration, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                dur = int(duration or 0)
                if not data or dur <= 0:
                    continue
                # fake PCM: bytes as centered samples, time-scaled to dur
                samples = np.frombuffer(data, dtype=np.uint8).astype(
                    np.float64
                ) - 128.0
                per_ms = max(len(samples) / dur, 1e-9)
                start = 0
                idx = 0
                while start < dur:
                    end = min(start + window_ms, dur)
                    lo = int(start * per_ms)
                    hi = max(int(end * per_ms), lo + 1)
                    w = samples[lo:hi]
                    rows.append(
                        {
                            "media_id": media_id,
                            "chunk_index": idx,
                            "start_ms": start,
                            "end_ms": end,
                            "rms": round(
                                float(np.sqrt(np.mean(w * w))), 4
                            ),
                        }
                    )
                    start += hop_ms
                    idx += 1
            yield pd.DataFrame(
                rows,
                columns=["media_id", "chunk_index", "start_ms", "end_ms", "rms"],
            )

    return df.filter(F.col("kind") == "audio").select(
        "media_id", "duration_ms", "payload"
    ).mapInPandas(process, AUDIO_CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# driver-facing queries. The testdata ships no binary media table, so the
# media frame is synthesized deterministically from `documents` (payload =
# UTF-8 bytes of the text) — the decode kernels are byte-level Python and not
# SQL-expressible, so these register as rows-only checks (no oracle).
# ---------------------------------------------------------------------------
from pyspark.sql import SparkSession  # noqa: E402

from data_engineering_nd_spark.catalog import load  # noqa: E402
from data_engineering_nd_spark.registry import query  # noqa: E402


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> MEDIA_SCHEMA frame: every doc an 'image', every 5th a
    'video' whose duration is derived from its length."""
    docs = load(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("video"))
        .when(F.col("doc_id") % 5 == 3, F.lit("audio"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length("text") * F.lit(10)).cast("int").alias("duration_ms"),
    )


@query("multimodal_image_features")
def multimodal_image_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_features(synthetic_media(spark, sf_dir))


@query("multimodal_frame_samples")
def multimodal_frame_samples_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synthetic_media(spark, sf_dir), every_ms=1000)


@query("multimodal_audio_chunks")
def multimodal_audio_chunks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_audio(synthetic_media(spark, sf_dir))
