"""Round-3 queries, part 29: MP4 faststart/duration, MP3 frame sniff
behind ID3 tags, caption-video duration sync, HLS ladder sanity.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _box(t: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + t + payload


def _mvhd_v0(timescale: int, duration: int) -> bytes:
    return _box(b"mvhd", bytes(4) + struct.pack(">II", 0, 0)
                + struct.pack(">II", timescale, duration) + bytes(4))


_MP4_FAST = (_box(b"ftyp", b"isomiso2")
             + _box(b"moov", _mvhd_v0(1000, 90_000))
             + _box(b"mdat", bytes(8))).hex()
_MP4_SLOW = (_box(b"ftyp", b"mp42mp42")
             + _box(b"mdat", bytes(8))
             + _box(b"moov", _mvhd_v0(600, 1200))).hex()


# --------------------------------------------------------------------------
# mp4_faststart
# --------------------------------------------------------------------------

def q_mp4_faststart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.mp4_faststart over a faststart isom (90 s), a moov-last
    mp42 (2 s), and a non-MP4 payload."""
    from .media import mp4_faststart

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_MP4_FAST))
        .otherwise(F.lit(_MP4_SLOW))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return mp4_faststart(docs).select(
        "doc_id", "mp4_brand", "mp4_faststart", "mp4_duration_ms",
        "mp4_n_boxes",
    ).orderBy("doc_id")


ORACLE_MP4 = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 1 THEN 'isom' WHEN 2 THEN 'mp42' END
         AS mp4_brand,
       CAST(CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 0 END AS INTEGER)
         AS mp4_faststart,
       CAST(CASE doc_id % 3 WHEN 1 THEN 90000 WHEN 2 THEN 2000 END
            AS BIGINT) AS mp4_duration_ms,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL ELSE 3 END AS INTEGER)
         AS mp4_n_boxes
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# mp3_frame
# --------------------------------------------------------------------------

_ID3_HDR = (b"ID3" + bytes([4, 0, 0, 0, 0, 0, 20])).hex()  # tag 20 B


def q_mp3_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.id3_sniff + mp3_frame_sniff composed: the frame header
    sits AFTER the ID3 tag, located via 10 + id3_tag_bytes; a tagless
    stream starts at 0; garbage reports invalid sync."""
    from .media import id3_sniff, mp3_frame_sniff

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit(_ID3_HDR + "00" * 20 + "fffb9000"))
        .when(m == 1, F.lit("fffb440400000000"))
        .otherwise(F.lit("00ff00ff00ff"))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    tagged = id3_sniff(docs).withColumn(
        "frame_off",
        F.when(F.col("id3_tag_bytes").isNotNull(),
               10 + F.col("id3_tag_bytes")).otherwise(F.lit(0)),
    )
    return mp3_frame_sniff(tagged, offset_col="frame_off").select(
        "doc_id", "frame_off", "mp3_valid_sync", "mp3_bitrate_kbps",
        "mp3_sample_rate",
    ).orderBy("doc_id")


ORACLE_MP3 = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 30 ELSE 0 END AS BIGINT)
         AS frame_off,
       CAST(CASE doc_id % 3 WHEN 2 THEN 0 ELSE 1 END AS INTEGER)
         AS mp3_valid_sync,
       CAST(CASE doc_id % 3 WHEN 0 THEN 128 WHEN 1 THEN 56 END
            AS BIGINT) AS mp3_bitrate_kbps,
       CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 END
            AS BIGINT) AS mp3_sample_rate
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# caption_video_sync
# --------------------------------------------------------------------------

def q_caption_video_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed media check: WebVTT span vs MP4 mvhd duration per
    asset — captions that stop far short of the video mark a broken
    pair before training.  |span - duration| <= 1000 ms = in_sync."""
    from .media import mp4_faststart, vtt_cues

    doc = F.col("doc_id")
    m = doc % 2
    mp4 = F.when(m == 0, F.lit(_MP4_FAST)).otherwise(F.lit(_MP4_SLOW))
    vtt = F.when(
        m == 0,
        F.lit("WEBVTT\n\n00:00:00.000 --> 00:01:29.500\nfull\n"),
    ).otherwise(
        F.lit("WEBVTT\n\n00:00:00.000 --> 00:00:00.900\nshort?\n"))
    assets = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.unhex(mp4).alias("bytes"),
        vtt.alias("body"),
    )
    j = vtt_cues(mp4_faststart(assets))
    delta = F.abs(F.col("vtt_span_ms") - F.col("mp4_duration_ms"))
    return j.select(
        "doc_id", "mp4_duration_ms", "vtt_span_ms",
        delta.cast("long").alias("delta_ms"),
        (delta <= 1000).alias("in_sync"),
    ).orderBy("doc_id")


ORACLE_SYNC = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 90000 ELSE 2000 END AS BIGINT)
         AS mp4_duration_ms,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 89500 ELSE 900 END AS BIGINT)
         AS vtt_span_ms,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 500 ELSE 1100 END AS BIGINT)
         AS delta_ms,
       doc_id % 2 = 0 AS in_sync
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# hls_ladder
# --------------------------------------------------------------------------

def q_hls_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed HLS sanity: is the variant ladder MONOTONE (higher
    bandwidth never lower resolution)?  A broken ladder marks an
    encoder misconfig and untrustworthy rendition metadata."""
    from .media import m3u8_variants

    doc = F.col("doc_id")
    m = doc % 2
    body = F.when(m == 0, F.lit(
        "#EXTM3U\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360\na\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=2500000,RESOLUTION=1280x720\nb\n"
    )).otherwise(F.lit(
        "#EXTM3U\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=1280x720\na\n"
        "#EXT-X-STREAM-INF:BANDWIDTH=2500000,RESOLUTION=640x360\nb\n"
    ))
    docs = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                       body.alias("body"))
    v = m3u8_variants(docs)
    sorted_by_bw = F.array_sort(
        F.transform("m3u8_variants", lambda x: F.struct(
            x["bandwidth"].alias("bw"), x["height"].alias("h"))))
    heights = F.transform(sorted_by_bw, lambda x: x["h"])
    monotone = F.aggregate(
        F.when(F.size(heights) >= 2, F.sequence(
            F.lit(1), F.size(heights) - 1))
        .otherwise(F.array().cast("array<int>")),
        F.lit(True),
        lambda acc, i: acc & (F.get(heights, i) >= F.get(heights, i - 1)),
    )
    return v.select(
        "doc_id",
        F.size("m3u8_variants").cast("long").alias("n_variants"),
        monotone.alias("ladder_monotone"),
    ).orderBy("doc_id")


ORACLE_HLS_LADDER = """
SELECT doc_id, CAST(2 AS BIGINT) AS n_variants,
       doc_id % 2 = 0 AS ladder_monotone
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mp4_faststart": q_mp4_faststart,
        "mp3_frame": q_mp3_frame,
        "caption_video_sync": q_caption_video_sync,
        "hls_ladder": q_hls_ladder,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mp4_faststart": ORACLE_MP4,
        "mp3_frame": ORACLE_MP3,
        "caption_video_sync": ORACLE_SYNC,
        "hls_ladder": ORACLE_HLS_LADDER,
    }
