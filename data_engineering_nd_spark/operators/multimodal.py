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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 1_000_000_007
_POW131 = np.ones(1, dtype=np.int64)  # growable cache of 131^j mod _P


def _powers131(n: int) -> np.ndarray:
    """First n powers of 131 mod 1e9+7 (cached; grows monotonically)."""
    global _POW131
    if len(_POW131) < n:
        ext = np.empty(n, dtype=np.int64)
        ext[: len(_POW131)] = _POW131
        for j in range(len(_POW131), n):
            ext[j] = (ext[j - 1] * 131) % _P
        _POW131 = ext
    return _POW131[:n]


def poly_checksum(data: bytes) -> int:
    """131-base polynomial hash mod 1e9+7 — bit-identical to the Horner
    loop ``c = (c*131 + b) % P`` but computed as a numpy dot product
    against precomputed powers, so the per-BYTE work is vectorized (the
    loop version was the hot path's anti-pattern: row-at-a-time Python
    inside mapInPandas). Each (byte × power) term is < 2^38 and the
    reduction is chunked at 2^20 terms, so int64 never overflows."""
    n = len(data)
    if n == 0:
        return 0
    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    pw = _powers131(n)[::-1]  # exponent n-1-i at position i
    total = 0
    chunk = 1 << 20
    for i in range(0, n, chunk):
        total = (total + int(np.dot(b[i : i + chunk], pw[i : i + chunk]) % _P)) % _P
    return total

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
    checksum = poly_checksum(payload)
    head = np.frombuffer(payload[: min(n, 256)], dtype=np.uint8)
    return {
        "width": (checksum % 64) + 1,
        "height": ((checksum // 64) % 64) + 1,
        "mean_intensity": (int(head.sum()) / max(min(n, 256), 1)) / 255.0,
    }


def image_features(df: DataFrame, decoder=fake_decode_image) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas (Arrow batches).

    One narrow pass over the media partitions: no shuffle, media bytes stay
    executor-local, output is a small typed frame that joins back on
    media_id.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            decoded = [decoder(d) for d in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": np.fromiter(
                        (len(d) for d in payloads), np.int64, len(payloads)
                    ),
                    # vectorized per row (numpy dot, no per-byte Python)
                    "checksum": np.fromiter(
                        (poly_checksum(d) for d in payloads),
                        np.int64,
                        len(payloads),
                    ),
                    "decoded_width": np.fromiter(
                        (d["width"] for d in decoded), np.int64, len(decoded)
                    ),
                    "decoded_height": np.fromiter(
                        (d["height"] for d in decoded), np.int64, len(decoded)
                    ),
                    "mean_intensity": np.fromiter(
                        (d["mean_intensity"] for d in decoded),
                        np.float64,
                        len(decoded),
                    ),
                }
            )

    return df.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        process, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per sampled
    frame index based on duration metadata (the decode of actual frames is
    the stubbed step). Demonstrates the 1-to-N mapInPandas shape."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            durs = (
                pd.to_numeric(pdf["duration_ms"], errors="coerce")
                .fillna(0)
                .to_numpy(np.int64)
            )
            n_frames = np.maximum(durs // every_ms, 0)
            base = np.fromiter(
                (
                    int(
                        np.frombuffer(
                            (bytes(p) if p is not None else b"")[:64], np.uint8
                        ).sum()
                    )
                    + 1
                    for p in pdf["payload"]
                ),
                np.int64,
                n,
            )
            # 1-to-N expansion without a per-frame Python loop
            rep_ids = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            rep_base = np.repeat(base, n_frames)
            frame_idx = (
                np.concatenate([np.arange(k, dtype=np.int64) for k in n_frames])
                if n
                else np.empty(0, dtype=np.int64)
            )
            yield pd.DataFrame(
                {
                    "media_id": rep_ids,
                    "frame_index": frame_idx,
                    "frame_checksum": (rep_base * 131 + frame_idx) % _P,
                }
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
    shuffle, parallelism = input partitions.

    Fully vectorized per Arrow batch (same repeat/concatenate shape as
    sample_frames): chunk windows expand via np.repeat + concatenated
    aranges, and every chunk's RMS comes from one global prefix-sum of
    squared samples — sum(sq[lo:hi]) = S[hi] - S[lo] — so there is no
    per-row (or per-chunk) Python loop."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        empty = pd.DataFrame(
            {
                "media_id": pd.Series(dtype="int64"),
                "chunk_index": pd.Series(dtype="int32"),
                "start_ms": pd.Series(dtype="int32"),
                "end_ms": pd.Series(dtype="int32"),
                "rms": pd.Series(dtype="float64"),
            }
        )
        for pdf in batches:
            durs = (
                pd.to_numeric(pdf["duration_ms"], errors="coerce")
                .fillna(0)
                .to_numpy(np.int64)
            )
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            lens = np.fromiter(map(len, payloads), np.int64, len(payloads))
            keep = (durs > 0) & (lens > 0)
            if not keep.any():
                yield empty
                continue
            ids = pdf["media_id"].to_numpy()[keep]
            durs = durs[keep]
            lens = lens[keep]
            # fake PCM: bytes as centered samples, time-scaled to duration
            flat = (
                np.frombuffer(b"".join(p for p, k in zip(payloads, keep) if k), np.uint8)
                .astype(np.float64)
                - 128.0
            )
            sq_prefix = np.concatenate([[0.0], np.cumsum(flat * flat)])
            offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
            per_ms = np.maximum(lens / durs, 1e-9)

            n_chunks = -(-durs // hop_ms)  # ceil(dur / hop)
            rep = np.repeat(np.arange(len(durs)), n_chunks)
            chunk_idx = np.concatenate(
                [np.arange(k, dtype=np.int64) for k in n_chunks]
            )
            start = chunk_idx * hop_ms
            end = np.minimum(start + window_ms, durs[rep])
            lo = (start * per_ms[rep]).astype(np.int64)
            hi = np.maximum((end * per_ms[rep]).astype(np.int64), lo + 1)
            glo = offsets[rep] + lo
            ghi = offsets[rep] + hi
            rms = np.sqrt(
                (sq_prefix[ghi] - sq_prefix[glo]) / (ghi - glo)
            ).round(4)
            yield pd.DataFrame(
                {
                    "media_id": ids[rep],
                    "chunk_index": chunk_idx.astype(np.int32),
                    "start_ms": start.astype(np.int32),
                    "end_ms": end.astype(np.int32),
                    "rms": rms,
                }
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


@query(
    "multimodal_image_features",
    # The synthetic corpus is pure ASCII (chars == bytes for every doc,
    # verified at sf0.01), so the byte-level fake decode IS SQL-mirrorable:
    # the 131-base polynomial checksum is a Horner fold over ascii codes
    # (bit-identical to poly_checksum's chunked numpy dot product), and the
    # derived width/height/intensity are pure arithmetic on it. With real
    # binary payloads this oracle would be dropped (rows-only) — the point
    # here is pinning the mapInPandas plumbing end to end.
    oracle=r"""
    WITH img AS (
        SELECT doc_id AS media_id, text
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 5 <> 3
    ), c AS (
        SELECT media_id, text,
            CAST(strlen(text) AS BIGINT) AS n_bytes,
            list_reduce(
                list_prepend(
                    CAST(0 AS BIGINT),
                    list_transform(string_split(text, ''),
                                   x -> CAST(ascii(x) AS BIGINT))
                ),
                (acc, x) -> (acc * 131 + x) % 1000000007
            ) AS checksum
        FROM img
    )
    SELECT media_id, n_bytes, checksum,
           CAST(checksum % 64 + 1 AS INT) AS decoded_width,
           CAST((checksum // 64) % 64 + 1 AS INT) AS decoded_height,
           CAST(list_sum(list_transform(string_split(substr(text, 1, 256), ''),
                                        x -> CAST(ascii(x) AS BIGINT))) AS DOUBLE)
               / greatest(least(n_bytes, 256), 1) / 255.0 AS mean_intensity
    FROM c
    """,
)
def multimodal_image_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_features(synthetic_media(spark, sf_dir))


@query(
    "multimodal_frame_samples",
    # Same ASCII-corpus argument as multimodal_image_features: the frame
    # expansion (duration // 1000 rows per video) and the byte-derived
    # checksum are exact integer arithmetic, so the 1-to-N mapInPandas
    # shape value-hashes against a generate_series UNNEST.
    oracle=r"""
    WITH vid AS (
        SELECT doc_id AS media_id, text,
               CAST(length(text) * 10 AS BIGINT) AS dur
        FROM documents WHERE doc_id % 5 = 0
    ), b AS (
        SELECT media_id, dur // 1000 AS n_frames,
               list_sum(list_transform(string_split(substr(text, 1, 64), ''),
                                       x -> CAST(ascii(x) AS BIGINT))) + 1 AS base
        FROM vid WHERE dur // 1000 >= 1
    )
    SELECT media_id,
           CAST(t.j AS INT) AS frame_index,
           CAST((base * 131 + t.j) % 1000000007 AS BIGINT) AS frame_checksum
    FROM b, UNNEST(generate_series(0, n_frames - 1)) AS t(j)
    """,
)
def multimodal_frame_samples_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(synthetic_media(spark, sf_dir), every_ms=1000)


# The RMS arithmetic is exact until the last two ops: samples are
# integers, so sums of squares are integer-valued float64 (< 2^53) in
# BOTH engines regardless of accumulation order; the final
# sqrt(sum/count) then rounds identically. Window indices replicate
# the float64 expression order of the vectorized kernel exactly
# (trunc(start * max(n/dur, 1e-9))). Factored as a constant because the
# VAD segmentation oracle below builds on the same chunk frame.
_AUDIO_CHUNKS_SQL = r"""
    WITH aud AS (
        SELECT doc_id AS media_id, text,
               CAST(length(text) * 10 AS BIGINT) AS dur,
               CAST(strlen(text) AS BIGINT) AS n
        FROM documents WHERE doc_id % 5 = 3 AND length(text) > 0
    ), chunks AS (
        SELECT media_id, text, dur, n, CAST(t.j AS BIGINT) AS idx
        FROM aud, UNNEST(generate_series(0, (dur + 999) // 1000 - 1)) AS t(j)
    ), win AS (
        SELECT media_id, text,
               CAST(idx AS INT) AS chunk_index,
               CAST(idx * 1000 AS INT) AS start_ms,
               CAST(least(idx * 1000 + 2000, dur) AS INT) AS end_ms,
               CAST(trunc(CAST(idx * 1000 AS DOUBLE)
                          * greatest(CAST(n AS DOUBLE) / CAST(dur AS DOUBLE), 1e-9))
                    AS BIGINT) AS lo,
               greatest(
                   CAST(trunc(CAST(least(idx * 1000 + 2000, dur) AS DOUBLE)
                              * greatest(CAST(n AS DOUBLE) / CAST(dur AS DOUBLE), 1e-9))
                        AS BIGINT),
                   CAST(trunc(CAST(idx * 1000 AS DOUBLE)
                              * greatest(CAST(n AS DOUBLE) / CAST(dur AS DOUBLE), 1e-9))
                        AS BIGINT) + 1
               ) AS hi
        FROM chunks
    )
    SELECT media_id, chunk_index, start_ms, end_ms,
           round(sqrt(
               list_sum(list_transform(
                   string_split(substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT)), ''),
                   x -> (CAST(ascii(x) AS DOUBLE) - 128.0) * (CAST(ascii(x) AS DOUBLE) - 128.0)
               )) / CAST(hi - lo AS DOUBLE)
           ), 4) AS rms
    FROM win
    """


@query("multimodal_audio_chunks", oracle=_AUDIO_CHUNKS_SQL)
def multimodal_audio_chunks_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_audio(synthetic_media(spark, sf_dir))


@query(
    "multimodal_metadata_stats",
    # The metadata lane IS SQL-expressible (unlike the byte-level decode
    # kernels above): per-kind media counts, payload bytes, duration
    # profile. This pins the synthetic_media contract itself — schema,
    # kind assignment, duration derivation — with a value hash.
    oracle="""
    SELECT
        CASE WHEN doc_id % 5 = 0 THEN 'video'
             WHEN doc_id % 5 = 3 THEN 'audio'
             ELSE 'image' END AS kind,
        COUNT(*) AS n_media,
        CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
        CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes,
        round(CAST(SUM(CAST(length(text) * 10 AS BIGINT)) AS DOUBLE)
              / COUNT(*), 2) AS avg_duration_ms
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_metadata_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kind-level media catalog profile — the query a pipeline runs before
    deciding batch sizes and partitioning for the decode pass. One hash
    aggregate over metadata columns only; payload bytes contribute their
    LENGTH (a scan-side scalar), never their content, to the shuffle."""
    media = synthetic_media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.max(F.length("payload")).cast("bigint").alias("max_bytes"),
        F.round(
            F.sum(F.col("duration_ms").cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            2,
        ).alias("avg_duration_ms"),
    )


def pair_manifest(
    feats: DataFrame,
    docs: DataFrame,
    min_tokens: int = 20,
    intensity_lo: float = 0.2,
    intensity_hi: float = 0.6,
) -> DataFrame:
    """Caption–image pair assembly with dual-modality quality gates: keep a
    (text, image) pair only when the text side has enough tokens AND the
    decoded image side sits inside an intensity band (the stand-in for
    "not black / not blown out" real-image filters). This is the manifest
    a multimodal training pipeline materializes after decode — pairs that
    survive both gates, with the features needed for packing downstream.

    Scale shape: the decode output (small typed rows) joins the text table
    on the id — an equi-join of two id-partitioned frames (sort-merge at
    scale, never a shuffle of payload bytes: the binary column was dropped
    before the join)."""
    from data_engineering_nd_spark.functions.text import token_count

    text_side = docs.select(
        "doc_id", "lang", "source", token_count("text").alias("n_tokens")
    )
    return (
        feats.join(text_side, feats.media_id == text_side.doc_id)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("mean_intensity") > intensity_lo)
            & (F.col("mean_intensity") < intensity_hi)
        )
        .select(
            "media_id", "lang", "source", "n_tokens", "n_bytes",
            "checksum", "mean_intensity",
        )
    )


@query(
    "multimodal_pair_manifest",
    # Same ASCII-corpus byte-arithmetic argument as multimodal_image_features
    # (whose oracle CTE this extends): the decode side is exact integer math,
    # the text side is the proven token_count mirror, and the join key is the
    # id — so the full two-modality manifest value-hashes.
    oracle=r"""
    WITH img AS (
        SELECT doc_id AS media_id, text
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 5 <> 3
    ), c AS (
        SELECT media_id,
            CAST(strlen(text) AS BIGINT) AS n_bytes,
            list_reduce(
                list_prepend(
                    CAST(0 AS BIGINT),
                    list_transform(string_split(text, ''),
                                   x -> CAST(ascii(x) AS BIGINT))
                ),
                (acc, x) -> (acc * 131 + x) % 1000000007
            ) AS checksum,
            CAST(list_sum(list_transform(string_split(substr(text, 1, 256), ''),
                                         x -> CAST(ascii(x) AS BIGINT))) AS DOUBLE)
                / greatest(least(strlen(text), 256), 1) / 255.0 AS mean_intensity
        FROM img
    ), d AS (
        SELECT doc_id, lang, source,
               CAST(len(string_split(
                   regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
                    AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT media_id, lang, source, n_tokens, n_bytes, checksum, mean_intensity
    FROM c JOIN d ON c.media_id = d.doc_id
    WHERE n_tokens >= 20 AND mean_intensity > 0.2 AND mean_intensity < 0.6
    """,
)
def multimodal_pair_manifest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, sf_dir)
    docs = load(spark, "documents", sf_dir)
    return pair_manifest(image_features(media), docs)


def scene_cuts(
    frames: DataFrame, cut_threshold: int = 300_000_000
) -> DataFrame:
    """Shot-boundary detection over a sampled frame stream: a CUT is a
    frame whose feature distance to the previous frame exceeds the
    threshold (here the |Δchecksum| of the deterministic fake features —
    with a real decoder this becomes a histogram/embedding distance, the
    Spark shape is identical). Per-video lag window over the small typed
    frame rows — the payload never reappears after the decode pass.

    Returns per-video shot statistics: frame count, cut count, and the
    index of the first cut (NULL when the video is one continuous shot).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("media_id").orderBy("frame_index")
    delta = F.abs(
        F.col("frame_checksum") - F.lag("frame_checksum").over(w)
    )
    flagged = frames.withColumn(
        "is_cut", (delta > F.lit(cut_threshold)).cast("int")
    )
    return (
        flagged.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.coalesce(F.sum("is_cut"), F.lit(0)).cast("bigint").alias("n_cuts"),
            F.min(F.when(F.col("is_cut") == 1, F.col("frame_index"))).alias(
                "first_cut_index"
            ),
        )
    )


@query(
    "multimodal_scene_cuts",
    # Extends the frame_samples oracle CTE with a LAG over the exact
    # integer checksums — the cut decision is pure integer arithmetic, so
    # the per-video shot statistics value-hash.
    oracle=r"""
    WITH vid AS (
        SELECT doc_id AS media_id, text,
               CAST(length(text) * 10 AS BIGINT) AS dur
        FROM documents WHERE doc_id % 5 = 0
    ), b AS (
        SELECT media_id, dur // 1000 AS n_frames,
               list_sum(list_transform(string_split(substr(text, 1, 64), ''),
                                       x -> CAST(ascii(x) AS BIGINT))) + 1 AS base
        FROM vid WHERE dur // 1000 >= 1
    ), fr AS (
        SELECT media_id,
               CAST(t.j AS INT) AS frame_index,
               CAST((base * 131 + t.j) % 1000000007 AS BIGINT) AS frame_checksum
        FROM b, UNNEST(generate_series(0, n_frames - 1)) AS t(j)
    ), flagged AS (
        SELECT media_id, frame_index,
               CASE WHEN abs(frame_checksum - LAG(frame_checksum) OVER (
                        PARTITION BY media_id ORDER BY frame_index))
                         > 300000000
                    THEN 1 ELSE 0 END AS is_cut
        FROM fr
    )
    SELECT media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COALESCE(SUM(is_cut), 0) AS BIGINT) AS n_cuts,
           MIN(CASE WHEN is_cut = 1 THEN frame_index END) AS first_cut_index
    FROM flagged
    GROUP BY media_id
    """,
)
def multimodal_scene_cuts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scene_cuts(sample_frames(synthetic_media(spark, sf_dir), every_ms=1000))


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (dHash): the LAION-style near-duplicate sweep
# over image payloads
# ---------------------------------------------------------------------------

_DHASH_BITS = 60  # fits signed BIGINT in both engines (same reason as
                  # dedup._SIMHASH_MD5_BITS; real dHash uses 64 = 8x8)


def image_dhash(media: DataFrame) -> DataFrame:
    """Difference-hash fingerprint per image -> (id, fp: bigint).

    Real dHash resizes the image to a tiny grid and sets bit b iff
    pixel[b] > pixel[b+1]. The fake decoder's "pixel stream" IS the
    payload byte sequence (see `fake_decode_image`), so the
    resize-equivalent here samples _DHASH_BITS+1 byte positions spread
    evenly over the payload — position_b = 1 + (n-1)*b // (bits), exact
    integer arithmetic — and compares neighbors. Scale/offset-invariant
    over the sampled stream, like the real thing over pixels.

    Entirely JVM expression work (decode + ascii + compare folded into
    whole-stage codegen) — the fingerprint pass is a narrow scan-side
    projection with NO Python and no shuffle; with a real codec you'd
    compute the same 60 bits inside the mapInPandas decode batch instead.
    """
    # The 60-bit fold is built as ONE SQL string parsed in a single
    # F.expr call: the per-bit Column-API loop cost ~900 py4j round
    # trips (~2.5s of driver Python PER PLAN BUILD, measured) for an
    # expression the JVM parses in milliseconds. Same operators
    # node-for-node: double divide + floor for the positions (matches
    # DuckDB's integer //), CASE per bit, left-to-right bitwise OR.
    s = "decode(payload, 'UTF-8')"
    n = f"length({s})"

    def byte_at(pos: str) -> str:  # 1-based position expression
        return f"ascii(substr({s}, CAST({pos} AS INT), 1))"

    terms = []
    for b in range(_DHASH_BITS):
        # (n-1)*b / bits is exact: the product is a small int, the divide
        # is by a constant — floor matches DuckDB's integer //
        p = f"(floor((({n} - 1) * {b}) / {_DHASH_BITS}) + 1)"
        q = f"(floor((({n} - 1) * {b + 1}) / {_DHASH_BITS}) + 1)"
        terms.append(
            f"(CASE WHEN {byte_at(p)} > {byte_at(q)} "
            f"THEN shiftleft(CAST(1 AS BIGINT), {b}) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    fp = F.expr("(CAST(0 AS BIGINT) | " + " | ".join(terms) + ")")
    return (
        media.filter(F.col("kind") == "image")
        .filter(F.length("payload") >= 2)
        .select(F.col("media_id").alias("id"), fp.alias("fp"))
    )


def image_dhash_pairs(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs at dHash Hamming <= max_hamming, via the
    shared pigeonhole chunk blocking (`dedup.hamming_blocked_pairs`) —
    exact recall, candidate generation by equi-join, never O(n²)."""
    from data_engineering_nd_spark.operators.dedup import hamming_blocked_pairs

    return hamming_blocked_pairs(
        image_dhash(media), bits=_DHASH_BITS, max_hamming=max_hamming
    ).select(
        F.col("id_a").alias("media_id_a"),
        F.col("id_b").alias("media_id_b"),
        "hamming",
    )


def _dhash_seed_media() -> list[tuple[int, str]]:
    """Engineered near-duplicate image payloads (VERDICT r06 #2): the
    natural corpus has no dHash-Hamming<=3 pairs at small scale factors,
    so the sf0.01 gate record was 0-row-vacuous. These four 61-char
    payloads make the sampled positions the characters themselves
    (n=61 -> position_b = b+1), so bit b of the fingerprint is exactly
    char[b] > char[b+1]: the base is all-equal (fp = 0) and each variant
    raises a chosen set of bits by one 'z' per bit. Expected pairs:
    (base, v1) hamming 1, (base, v2) 2, (base, v3) 3, (v1, v2) 3.
    Media ids sit far above any doc_id at any scale factor."""
    base = "m" * 61

    def variant(positions: list[int]) -> str:
        cs = list(base)
        for p in positions:
            cs[p] = "z"
        return "".join(cs)

    return [
        (10_000_000_001, base),
        (10_000_000_002, variant([10])),
        (10_000_000_003, variant([20, 40])),
        (10_000_000_004, variant([5, 25, 45])),
    ]


@query("multimodal_dhash_dedup")  # oracle registered below (generated SQL)
def multimodal_dhash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup sweep over the synthetic image corpus: 60-bit
    byte-stream dHash + pigeonhole Hamming<=3 blocking. The ASCII corpus
    makes the whole pipeline SQL-mirrorable (chars == bytes), so the
    fingerprint construction AND the blocking are value-hash verified —
    with real codecs only the decode batch changes.

    The corpus is seeded with four engineered near-duplicates (mirrored
    verbatim in the oracle's corpus CTE) so the verification is
    non-vacuous at EVERY scale factor — the gate proves real pairs, not
    the empty set (VERDICT r06 #2)."""
    return image_dhash_pairs(_seeded_image_media(spark, sf_dir), max_hamming=3)


def _seeded_image_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media plus the engineered near-duplicate seeds — the
    corpus both dhash queries (pairs + dedup decisions) sweep."""
    seeds = spark.createDataFrame(
        [(mid, "image", txt.encode("utf-8")) for mid, txt in _dhash_seed_media()],
        "media_id bigint, kind string, payload binary",
    )
    return (
        synthetic_media(spark, sf_dir)
        .select("media_id", "kind", "payload")
        .unionByName(seeds)
    )


def _dhash_pair_ctes() -> str:
    """Shared SQL CTE block (img -> fps -> chunks -> pairs) mirroring the
    seeded dHash near-dup sweep — used by the pair query's oracle and by
    the cluster/decision composition built on top of it."""
    bits = _DHASH_BITS
    max_hamming = 3
    n_chunks = max_hamming + 1
    bounds = [round(i * bits / n_chunks) for i in range(n_chunks + 1)]
    spans = [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]
    bit_terms = "\n               + ".join(
        f"CASE WHEN ascii(substr(text, CAST((length(text)-1) * {b} // {bits} + 1 AS INT), 1))"
        f" > ascii(substr(text, CAST((length(text)-1) * {b + 1} // {bits} + 1 AS INT), 1))"
        f" THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    chunk_case = " ".join(
        f"WHEN {i} THEN (fp >> {start}) & {(1 << width) - 1}"
        for i, (start, width) in enumerate(spans)
    )
    seed_values = ",\n            ".join(
        f"({mid}, '{txt}')" for mid, txt in _dhash_seed_media()
    )
    return f"""img AS (
        SELECT doc_id AS media_id, text
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 5 <> 3 AND length(text) >= 2
        UNION ALL
        -- engineered near-duplicate seeds, identical to the Spark side's
        -- seeded frame (VERDICT r06 #2: keeps the gate non-vacuous)
        SELECT * FROM (VALUES
            {seed_values}
        ) AS seeds(media_id, text)
    ),
    fps AS (
        SELECT media_id AS id,
               CAST({bit_terms} AS BIGINT) AS fp
        FROM img
    ),
    chunks AS (
        SELECT id, fp, c,
               CASE c {chunk_case} END AS key
        FROM fps, unnest(range({n_chunks})) AS t(c)
    ),
    pairs AS (
        SELECT DISTINCT a.id AS media_id_a, b.id AS media_id_b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        FROM chunks a
        JOIN chunks b ON a.c = b.c AND a.key = b.key AND a.id < b.id
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    )"""


def _register_dhash_oracle() -> None:
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ORACLE_SQL["multimodal_dhash_dedup"] = (
        "WITH "
        + _dhash_pair_ctes()
        + "\n    SELECT media_id_a, media_id_b, hamming FROM pairs"
    )


_register_dhash_oracle()


@query("multimodal_dedup_decisions")  # oracle registered below (generated)
def multimodal_dedup_decisions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAION-sweep OUTPUT artifact (VERDICT r06 #6): dHash near-dup
    pairs -> connected components (large-star/small-star) -> keep-best
    resolution. One row per clustered image: its cluster id (= minimum
    member media_id), payload size, and the keep/drop decision — keep the
    LARGEST payload (highest-resolution analog), media_id ascending
    tie-break. Composes three already-verified operators the way a
    production image-canonicalization pass runs them.

    Scale shape: pairs/clusters are output-sized (near-dup pairs, not the
    corpus), so the cluster frame BROADCASTS into the media join
    (plan-pinned); the per-cluster window partitions by dup cluster,
    never the corpus."""
    from pyspark.sql.window import Window

    from data_engineering_nd_spark.operators.dedup import (
        connected_components_star,
    )

    media = _seeded_image_media(spark, sf_dir)
    pairs = image_dhash_pairs(media, max_hamming=3)
    clusters = connected_components_star(
        pairs, src="media_id_a", dst="media_id_b"
    )
    sizes = media.select(
        F.col("media_id"), F.length("payload").cast("bigint").alias("payload_bytes")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("payload_bytes"), "media_id"
    )
    return (
        sizes.join(
            F.broadcast(
                clusters.select(
                    F.col("id").alias("media_id"), F.col("comp").alias("cluster_id")
                )
            ),
            "media_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .select(
            "cluster_id",
            "media_id",
            "payload_bytes",
            F.when(F.col("rn") == 1, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("decision"),
        )
    )


def _register_dedup_decisions_oracle() -> None:
    from data_engineering_nd_spark.registry import ORACLE_SQL

    ORACLE_SQL["multimodal_dedup_decisions"] = (
        "WITH RECURSIVE "
        + _dhash_pair_ctes()
        + """,
    edges AS (
        SELECT media_id_a AS src, media_id_b AS dst FROM pairs
        UNION
        SELECT media_id_b AS src, media_id_a AS dst FROM pairs
    ),
    reach(id, r) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    ),
    clusters AS (
        SELECT id AS media_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    ),
    ranked AS (
        SELECT c.cluster_id, c.media_id,
               CAST(strlen(i.text) AS BIGINT) AS payload_bytes,
               row_number() OVER (
                   PARTITION BY c.cluster_id
                   ORDER BY CAST(strlen(i.text) AS BIGINT) DESC, c.media_id
               ) AS rn
        FROM clusters c JOIN img i ON i.media_id = c.media_id
    )
    SELECT cluster_id, media_id, payload_bytes,
           CASE WHEN rn = 1 THEN 'keep' ELSE 'drop' END AS decision
    FROM ranked"""
    )


_register_dedup_decisions_oracle()


# ---------------------------------------------------------------------------
# Image resize (thumbnailing): the remaining decode-stage primitive
# ---------------------------------------------------------------------------


def fake_resize_image(payload: bytes, out_w: int = 8, out_h: int = 8) -> dict:
    """Deterministic stand-in for a nearest-neighbor thumbnail resize.

    The fake decoder's image is the payload byte stream laid out as a
    (height x width) grid (width/height derived from the checksum, as in
    `fake_decode_image`); the resize samples the byte at each of the
    out_h x out_w nearest-neighbor grid positions — the exact index
    arithmetic a real nearest-neighbor downscale performs, byte index =
    ((r*H//out_h)*W + (c*W//out_w)) mod n. Returns the thumbnail's mean
    intensity and its 131-base checksum (the resize analog of the decode
    checksum)."""
    n = len(payload)
    if n == 0:
        return {"resized_mean": 0.0, "resized_checksum": 0}
    meta = fake_decode_image(payload)
    w, h = meta["width"], meta["height"]
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    idx = (rows[:, None] * w + cols[None, :]).ravel() % n
    sampled = arr[idx]
    pw = _powers131(len(sampled))[::-1]
    checksum = int(np.dot(sampled, pw) % _P)
    return {
        "resized_mean": float(sampled.sum()) / (out_w * out_h) / 255.0,
        "resized_checksum": checksum,
    }


RESIZE_SCHEMA = (
    "media_id bigint, thumb_w int, thumb_h int, "
    "resized_mean double, resized_checksum bigint"
)


def resize_thumbnails(
    df: DataFrame, out_w: int = 8, out_h: int = 8, resizer=fake_resize_image
) -> DataFrame:
    """Thumbnail every image payload via mapInPandas (Arrow batches) —
    the resize runs inside the decode stage, payload bytes never cross a
    shuffle, and the output is a small typed row per image. With a real
    codec, swap ``resizer`` for a PIL/cv2 nearest-neighbor downscale;
    the Spark-side plumbing (schema, batching, narrow no-shuffle plan)
    is identical."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            out = [resizer(p, out_w, out_h) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "thumb_w": np.full(len(pdf), out_w, dtype="int32"),
                    "thumb_h": np.full(len(pdf), out_h, dtype="int32"),
                    "resized_mean": np.fromiter(
                        (d["resized_mean"] for d in out), np.float64, len(out)
                    ),
                    "resized_checksum": np.fromiter(
                        (d["resized_checksum"] for d in out), np.int64, len(out)
                    ),
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(process, RESIZE_SCHEMA)
    )


@query("multimodal_resize_thumbnails")  # oracle registered below (generated)
def multimodal_resize_thumbnails_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8x8 nearest-neighbor thumbnails of every synthetic image: the
    resize index arithmetic, sampled-byte checksum, and mean intensity
    are all SQL-mirrorable on the ASCII corpus (chars == bytes), so the
    whole resize stage — not just its row count — is value-hash
    verified. With real codecs only the resizer kernel changes.

    Non-empty payloads only, mirrored in the oracle's img CTE: the SQL
    mirror samples bytes with ``% n`` which has no n == 0 early-return
    (DuckDB modulo-by-zero) while fake_resize_image returns mean 0.0 /
    checksum 0 — filtering both sides keeps the mirror exact
    (ADVICE r06 #4)."""
    media = synthetic_media(spark, sf_dir).filter(F.length("payload") >= 1)
    return resize_thumbnails(media)


def _register_resize_oracle() -> None:
    from data_engineering_nd_spark.registry import ORACLE_SQL

    out_w = out_h = 8
    # sampled byte (1-based substr index) for thumbnail cell i (0..63):
    # r = i // 8, c = i % 8; idx = ((r*h//8)*w + (c*w//8)) % n + 1
    sample = (
        "ascii(substr(text, CAST((((i // {ow}) * h // {oh}) * w"
        " + ((i % {ow}) * w // {ow})) % n + 1 AS INT), 1))"
    ).format(ow=out_w, oh=out_h)
    ORACLE_SQL["multimodal_resize_thumbnails"] = f"""
    WITH img AS (
        -- strlen guard mirrors the Spark side's non-empty-payload filter:
        -- the % n sampling below would divide by zero on empty text
        -- (ADVICE r06 #4)
        SELECT doc_id AS media_id, text
        FROM documents
        WHERE doc_id % 5 <> 0 AND doc_id % 5 <> 3 AND strlen(text) >= 1
    ),
    c AS (
        SELECT media_id, text,
            CAST(strlen(text) AS BIGINT) AS n,
            list_reduce(
                list_prepend(
                    CAST(0 AS BIGINT),
                    list_transform(string_split(text, ''),
                                   x -> CAST(ascii(x) AS BIGINT))
                ),
                (acc, x) -> (acc * 131 + x) % 1000000007
            ) AS checksum
        FROM img
    ),
    dims AS (
        SELECT media_id, text, n,
               CAST(checksum % 64 + 1 AS BIGINT) AS w,
               CAST((checksum // 64) % 64 + 1 AS BIGINT) AS h
        FROM c
    ),
    sampled AS (
        SELECT media_id,
               list_transform(range(0, {out_w * out_h}),
                              i -> CAST({sample} AS BIGINT)) AS px
        FROM dims
    )
    SELECT media_id,
           CAST({out_w} AS INT) AS thumb_w,
           CAST({out_h} AS INT) AS thumb_h,
           CAST(list_sum(px) AS DOUBLE) / {out_w * out_h} / 255.0
               AS resized_mean,
           list_reduce(list_prepend(CAST(0 AS BIGINT), px),
                       (acc, x) -> (acc * 131 + x) % 1000000007)
               AS resized_checksum
    FROM sampled
    """


_register_resize_oracle()


# ---------------------------------------------------------------------------
# VAD-style activity segmentation over the chunk stream
# ---------------------------------------------------------------------------


def vad_segments(
    chunks: DataFrame, rms_threshold: float = 45.0
) -> DataFrame:
    """Voice-activity-style segmentation: contiguous runs of chunks whose
    RMS clears the threshold merge into (segment_start, segment_end)
    spans — the step that turns a chunked audio stream into utterance
    boundaries for transcription/captioning. Classic gaps-and-islands on
    the chunk index (the sessionize pattern): a run starts where the
    previous ACTIVE chunk isn't the immediate predecessor.

    The activity decision uses the 4-dp-ROUNDED rms (the chunk
    operator's published value), so threshold membership is engine- and
    rerun-exact. Scale shape: the window partitions by media_id over
    chunk-index rows (duration/hop per recording — bounded, tiny), never
    the corpus; one filter + one lag + one hash-agg."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("media_id").orderBy("chunk_index")
    active = chunks.filter(F.col("rms") >= rms_threshold)
    runs = active.withColumn(
        "_new",
        F.when(
            F.lag("chunk_index").over(w).isNull()
            | (F.lag("chunk_index").over(w) != F.col("chunk_index") - 1),
            1,
        ).otherwise(0),
    ).withColumn(
        "_run",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return runs.groupBy("media_id", F.col("_run").alias("segment_index")).agg(
        F.min("start_ms").alias("segment_start_ms"),
        F.max("end_ms").alias("segment_end_ms"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("rms").alias("peak_rms"),
    )


@query(
    "multimodal_vad_segments",
    oracle="WITH chunk_frame AS (" + _AUDIO_CHUNKS_SQL + """)
    , active AS (
        SELECT * FROM chunk_frame WHERE rms >= 45.0
    ),
    runs AS (
        SELECT media_id, chunk_index, start_ms, end_ms, rms,
               SUM(CASE WHEN prev IS NULL OR prev <> chunk_index - 1
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY media_id ORDER BY chunk_index
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS seg
        FROM (
            SELECT *,
                   lag(chunk_index) OVER (
                       PARTITION BY media_id ORDER BY chunk_index) AS prev
            FROM active
        )
    )
    SELECT media_id, CAST(seg AS BIGINT) AS segment_index,
           MIN(start_ms) AS segment_start_ms,
           MAX(end_ms) AS segment_end_ms,
           COUNT(*) AS n_chunks,
           MAX(rms) AS peak_rms
    FROM runs
    GROUP BY media_id, seg
    """,
)
def multimodal_vad_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity segments over the synthetic audio corpus at RMS >= 45
    (picked to split the chunk population roughly in half, with no chunk
    on the exact boundary): chunking, activity gating, and the
    gaps-and-islands merge are all value-hashed cross-engine."""
    chunks = chunk_audio(synthetic_media(spark, sf_dir))
    return vad_segments(chunks, rms_threshold=45.0)


# ---------------------------------------------------------------------------
# Binary-file ingestion: the object-store scan path for opaque media blobs
# ---------------------------------------------------------------------------


@query(
    "multimodal_binary_ingest",
    # same ASCII-corpus argument as multimodal_image_features: file bytes
    # == utf-8 text bytes, so the Horner fold is SQL-mirrorable; the
    # per-checksum values are < 1e9+7 and the subset is SF-bounded, so
    # the SUM stays far inside BIGINT
    oracle="""
    WITH sub AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0
    ),
    c AS (
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               list_reduce(
                   list_prepend(
                       CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      x -> CAST(ascii(x) AS BIGINT))
                   ),
                   (acc, x) -> (acc * 131 + x) % 1000000007
               ) AS checksum
        FROM sub
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
           CAST(SUM(checksum) AS BIGINT) AS checksum_sum,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM c
    """,
)
def multimodal_binary_ingest_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The INGESTION half the other multimodal queries assume: every 37th
    document's bytes land as an individual ``<doc_id>.bin`` blob file,
    Spark's built-in ``binaryFile`` source scans the directory (path +
    content per file — the object-store pattern for opaque media), the
    media id is recovered from the file name, and the standard
    mapInPandas featurizer (``image_features``) checksums every payload.
    The report hash-pins file count, byte totals, the Horner-checksum
    sum and an id sum against the source corpus — a dropped, truncated
    or mis-attributed file diverges.

    At 100 TB this is how image/audio corpora actually arrive: millions
    of blobs under a prefix, scanned by binaryFile with
    ``pathGlobFilter``/``modifiedAfter`` pushdown, bytes staying
    executor-local through the Arrow featurizer — never a driver
    collect. (The driver-side file WRITING here is only the test
    fixture.)"""
    import os
    import shutil
    import tempfile

    docs = (
        load(spark, "documents", sf_dir)
        .filter(F.col("doc_id") % 37 == 0)
        .select("doc_id", "text")
        .collect()
    )
    work = tempfile.mkdtemp(prefix="binary_ingest_")
    try:
        for r in docs:
            with open(os.path.join(work, f"{r['doc_id']}.bin"), "wb") as f:
                f.write((r["text"] or "").encode("utf-8"))
        blobs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin")
            .load(work)
            .select(
                F.regexp_extract(
                    F.col("path"), r"(\d+)\.bin$", 1
                ).cast("bigint").alias("media_id"),
                F.lit("image").alias("kind"),
                F.col("content").alias("payload"),
            )
        )
        feats = image_features(blobs)
        out = feats.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
            F.sum("checksum").cast("bigint").alias("checksum_sum"),
            F.sum("media_id").cast("bigint").alias("id_checksum"),
        )
        # output-sized (1 row); materialize before the blob dir goes away
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)
