"""Round-3 queries, part 25: HLS master-playlist variants, WAV header
sniff, WebVTT cue accounting, ID3v2 syncsafe tag sniff.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# m3u8_variants
# --------------------------------------------------------------------------

_M3U8_MASTER = (
    "#EXTM3U\n"
    "#EXT-X-STREAM-INF:BANDWIDTH=800000,RESOLUTION=640x360\n"
    "low/{d}.m3u8\n"
    "#EXT-X-STREAM-INF:BANDWIDTH=2500000,RESOLUTION=1280x720\n"
    "hd/{d}.m3u8\n"
)
_M3U8_MEDIA = "#EXTM3U\n#EXTINF:4.0,\nseg0.ts\n#EXTINF:4.0,\nseg1.ts\n"


def q_m3u8_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.m3u8_variants over a 2-variant master playlist, a media
    playlist (empty list), and a non-HLS body (NULL list) — the
    n_variants column keeps the three cases distinct through the
    explode."""
    from .media import m3u8_variants

    doc = F.col("doc_id")
    m = doc % 3
    body = (
        F.when(m == 0, F.lit("just a text file"))
        .when(m == 1, F.concat(
            F.lit("#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=800000,"
                  "RESOLUTION=640x360\nlow/"), doc.cast("string"),
            F.lit(".m3u8\n#EXT-X-STREAM-INF:BANDWIDTH=2500000,"
                  "RESOLUTION=1280x720\nhd/"), doc.cast("string"),
            F.lit(".m3u8\n")))
        .otherwise(F.lit(_M3U8_MEDIA))
    )
    docs = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                       body.alias("body"))
    v = m3u8_variants(docs)
    return (
        v.select(
            "doc_id",
            F.size("m3u8_variants").cast("long").alias("n_variants"),
            F.explode_outer("m3u8_variants").alias("s"),
        )
        .select("doc_id", "n_variants", "s.bandwidth", "s.width",
                "s.height", "s.uri")
        .orderBy("doc_id", "bandwidth")
    )


ORACLE_M3U8 = """
WITH rows AS (
  SELECT doc_id, CAST(2 AS BIGINT) AS n_variants,
         CAST(800000 AS BIGINT) AS bandwidth,
         CAST(640 AS BIGINT) AS width, CAST(360 AS BIGINT) AS height,
         'low/' || doc_id || '.m3u8' AS uri
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id, 2, 2500000, 1280, 720, 'hd/' || doc_id || '.m3u8'
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id, 0, NULL, NULL, NULL, NULL
  FROM documents WHERE doc_id % 3 = 2
  UNION ALL
  SELECT doc_id, NULL, NULL, NULL, NULL, NULL
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, n_variants, bandwidth, width, height, uri
FROM rows
ORDER BY doc_id, bandwidth
"""


# --------------------------------------------------------------------------
# wav_sniff
# --------------------------------------------------------------------------

def _wav(fmt: int, ch: int, rate: int, bits: int) -> str:
    return (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, fmt, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
            ).hex()


_WAV_PCM = _wav(1, 2, 44100, 16)
_WAV_FLOAT = _wav(3, 1, 16000, 32)


def q_wav_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.wav_sniff over PCM stereo 44.1k/16, float mono 16k/32,
    and a non-WAV payload."""
    from .media import wav_sniff

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_WAV_PCM))
        .otherwise(F.lit(_WAV_FLOAT))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return wav_sniff(docs).select(
        "doc_id", "wav_channels", "wav_sample_rate", "wav_bits",
        "wav_is_pcm", "wav_bytes_per_s",
    ).orderBy("doc_id")


ORACLE_WAV = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 1 THEN 2 WHEN 2 THEN 1 END AS BIGINT)
         AS wav_channels,
       CAST(CASE doc_id % 3 WHEN 1 THEN 44100 WHEN 2 THEN 16000 END
            AS BIGINT) AS wav_sample_rate,
       CAST(CASE doc_id % 3 WHEN 1 THEN 16 WHEN 2 THEN 32 END AS BIGINT)
         AS wav_bits,
       CAST(CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 0 END AS INTEGER)
         AS wav_is_pcm,
       CAST(CASE doc_id % 3 WHEN 1 THEN 176400 WHEN 2 THEN 64000 END
            AS BIGINT) AS wav_bytes_per_s
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# vtt_cues
# --------------------------------------------------------------------------

_VTT = ("WEBVTT\n\n1\n00:00:01.000 --> 00:00:03.500\nhello\n\n"
        "2\n00:00:05.000 --> 00:00:06.250\nworld\n")


def q_vtt_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.vtt_cues over a 2-cue subtitle file, a cueless WEBVTT
    header, and a non-VTT body."""
    from .media import vtt_cues

    doc = F.col("doc_id")
    m = doc % 3
    body = (
        F.when(m == 0, F.lit("not a subtitle file"))
        .when(m == 1, F.lit(_VTT))
        .otherwise(F.lit("WEBVTT\n\nNOTE nothing timed\n"))
    )
    docs = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                       body.alias("body"))
    return vtt_cues(docs).select(
        "doc_id", "vtt_n_cues", "vtt_captioned_ms", "vtt_span_ms",
    ).orderBy("doc_id")


ORACLE_VTT = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 2
            ELSE 0 END AS BIGINT) AS vtt_n_cues,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 3750
            ELSE 0 END AS BIGINT) AS vtt_captioned_ms,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 5250
            ELSE 0 END AS BIGINT) AS vtt_span_ms
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# id3_sniff
# --------------------------------------------------------------------------

_ID3_V4 = (b"ID3" + bytes([4, 0, 0x80, 0x00, 0x00, 0x02, 0x01])).hex()
_ID3_V3 = (b"ID3" + bytes([3, 0, 0x00, 0x00, 0x01, 0x7F, 0x7F])).hex()


def q_id3_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.id3_sniff over an unsynchronized v2.4 tag (syncsafe 257),
    a v2.3 tag (syncsafe 32767), and a non-ID3 payload."""
    from .media import id3_sniff

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("fffb9000"))
        .when(m == 1, F.lit(_ID3_V4 + "00" * 4))
        .otherwise(F.lit(_ID3_V3 + "00" * 4))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return id3_sniff(docs).select(
        "doc_id", "id3_version", "id3_tag_bytes", "id3_unsynchronized",
    ).orderBy("doc_id")


ORACLE_ID3 = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 1 THEN '2.4.0' WHEN 2 THEN '2.3.0' END
         AS id3_version,
       CAST(CASE doc_id % 3 WHEN 1 THEN 257 WHEN 2 THEN 32767 END
            AS BIGINT) AS id3_tag_bytes,
       CAST(CASE doc_id % 3 WHEN 1 THEN 1 WHEN 2 THEN 0 END AS INTEGER)
         AS id3_unsynchronized
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "m3u8_variants": q_m3u8_variants,
        "wav_sniff": q_wav_sniff,
        "vtt_cues": q_vtt_cues,
        "id3_sniff": q_id3_sniff,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "m3u8_variants": ORACLE_M3U8,
        "wav_sniff": ORACLE_WAV,
        "vtt_cues": ORACLE_VTT,
        "id3_sniff": ORACLE_ID3,
    }
