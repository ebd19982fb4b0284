"""Round-3 queries, part 31: FLAC STREAMINFO, Ogg page/codec sniff,
generic PNG chunk inventory, SVG active-content audit.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# flac_streaminfo
# --------------------------------------------------------------------------

def _flac(rate: int, ch: int, bits: int, total: int) -> str:
    b21 = ((rate % 16) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)
    b22 = (((bits - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F)
    packed = (
        bytes([rate >> 12 & 0xFF, (rate >> 4) & 0xFF, b21, b22])
        + struct.pack(">I", total & 0xFFFFFFFF)
    )
    streaminfo = bytes(10) + packed + bytes(16)
    return (b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo).hex()


_FLAC_CD = _flac(44100, 2, 16, 44100 * 90)
_FLAC_HI = _flac(96000, 1, 24, 96000 * 2)


def q_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.flac_streaminfo over CD-quality stereo (90 s), 96k/24
    mono (2 s), and a non-FLAC payload."""
    from .media import flac_streaminfo

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_FLAC_CD))
        .otherwise(F.lit(_FLAC_HI))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return flac_streaminfo(docs).select(
        "doc_id", "flac_sample_rate", "flac_channels", "flac_bits",
        "flac_total_samples", "flac_duration_ms",
    ).orderBy("doc_id")


ORACLE_FLAC = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 1 THEN 44100 WHEN 2 THEN 96000 END
            AS BIGINT) AS flac_sample_rate,
       CAST(CASE doc_id % 3 WHEN 1 THEN 2 WHEN 2 THEN 1 END AS BIGINT)
         AS flac_channels,
       CAST(CASE doc_id % 3 WHEN 1 THEN 16 WHEN 2 THEN 24 END AS BIGINT)
         AS flac_bits,
       CAST(CASE doc_id % 3 WHEN 1 THEN 3969000 WHEN 2 THEN 192000 END
            AS BIGINT) AS flac_total_samples,
       CAST(CASE doc_id % 3 WHEN 1 THEN 90000 WHEN 2 THEN 2000 END
            AS BIGINT) AS flac_duration_ms
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# ogg_sniff
# --------------------------------------------------------------------------

def _ogg(serial: int, seq: int, bos: bool, packet: bytes) -> str:
    hdr = (b"OggS" + bytes([0, 2 if bos else 0])
           + bytes(8) + struct.pack("<II", serial, seq)
           + bytes(4) + bytes([1, len(packet)]))
    return (hdr + packet).hex()


_OGG_OPUS = _ogg(777, 0, True, b"OpusHead\x01\x02")
_OGG_VORBIS = _ogg(888, 0, True, b"\x01vorbis\x00\x00")


def q_ogg_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.ogg_page_sniff over an Opus BOS page, a Vorbis BOS page,
    and a non-Ogg payload."""
    from .media import ogg_page_sniff

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_OGG_OPUS))
        .otherwise(F.lit(_OGG_VORBIS))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return ogg_page_sniff(docs).select(
        "doc_id", "ogg_serial", "ogg_page_seq", "ogg_bos", "ogg_codec",
    ).orderBy("doc_id")


ORACLE_OGG = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 1 THEN 777 WHEN 2 THEN 888 END
            AS BIGINT) AS ogg_serial,
       CAST(CASE WHEN doc_id % 3 IN (1, 2) THEN 0 END AS BIGINT)
         AS ogg_page_seq,
       CAST(CASE WHEN doc_id % 3 IN (1, 2) THEN 1 END AS INTEGER)
         AS ogg_bos,
       CASE doc_id % 3 WHEN 1 THEN 'opus' WHEN 2 THEN 'vorbis' END
         AS ogg_codec
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# png_inventory
# --------------------------------------------------------------------------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


_PNG_SIG = bytes.fromhex("89504e470d0a1a0a")
_IHDR13 = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
_PNG_RICH = (_PNG_SIG + _chunk(b"IHDR", _IHDR13)
             + _chunk(b"iCCP", b"p\x00x" + bytes(20))
             + _chunk(b"tRNS", bytes(6))
             + _chunk(b"IDAT", bytes(10))
             + _chunk(b"IEND", b"")).hex()
_PNG_PLAIN = (_PNG_SIG + _chunk(b"IHDR", _IHDR13)
              + _chunk(b"IDAT", bytes(4))
              + _chunk(b"IEND", b"")).hex()


def q_png_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.png_chunk_inventory exploded, plus derived has_trns /
    has_iccp audit columns computed as array expressions over the one
    walk."""
    from .images import png_chunk_inventory

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_PNG_RICH))
        .otherwise(F.lit(_PNG_PLAIN))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    inv = png_chunk_inventory(imgs)
    has = lambda t: F.exists(
        "png_chunks", lambda c: c["ctype"] == t).cast("int")
    return inv.select(
        "doc_id",
        F.size("png_chunks").cast("long").alias("n_chunks"),
        F.when(F.col("png_chunks").isNotNull(), has("tRNS"))
        .alias("has_trns"),
        F.when(F.col("png_chunks").isNotNull(), has("iCCP"))
        .alias("has_iccp"),
        F.array_join(F.transform("png_chunks",
                                 lambda c: c["ctype"]), ",")
        .alias("chunk_order"),
    ).orderBy("doc_id")


ORACLE_PNG_INVENTORY = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 5 ELSE 3 END
            AS BIGINT) AS n_chunks,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 1 ELSE 0 END
            AS INTEGER) AS has_trns,
       CAST(CASE doc_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 1 ELSE 0 END
            AS INTEGER) AS has_iccp,
       CASE doc_id % 3
         WHEN 1 THEN 'IHDR,iCCP,tRNS,IDAT,IEND'
         WHEN 2 THEN 'IHDR,IDAT,IEND' END AS chunk_order
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# svg_security
# --------------------------------------------------------------------------

def q_svg_security(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.svg_security_audit over a passive drawing, a scripted
    SVG with an onload handler, and one with foreignObject + external
    href."""
    from .extract import svg_security_audit

    doc = F.col("doc_id")
    m = doc % 3
    body = (
        F.when(m == 0, F.lit('<svg><circle r="5" fill="red"/></svg>'))
        .when(m == 1, F.lit('<svg onload="run()"><script>x()'
                            "</script></svg>"))
        .otherwise(F.lit('<svg><foreignObject><a xlink:href='
                         '"https://x.example/p">t</a>'
                         "</foreignObject></svg>"))
    )
    docs = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                       body.alias("body"))
    a = docs.select("doc_id",
                    svg_security_audit(F.col("body")).alias("s"))
    return a.select(
        "doc_id", "s.n_scripts", "s.n_event_handlers",
        "s.n_foreign_objects", "s.n_external_refs", "s.passive",
    ).orderBy("doc_id")


ORACLE_SVG_SECURITY = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS INTEGER)
         AS n_scripts,
       CAST(CASE doc_id % 3 WHEN 1 THEN 1 ELSE 0 END AS INTEGER)
         AS n_event_handlers,
       CAST(CASE doc_id % 3 WHEN 2 THEN 1 ELSE 0 END AS INTEGER)
         AS n_foreign_objects,
       CAST(CASE doc_id % 3 WHEN 2 THEN 1 ELSE 0 END AS INTEGER)
         AS n_external_refs,
       doc_id % 3 = 0 AS passive
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flac_streaminfo": q_flac,
        "ogg_sniff": q_ogg_sniff,
        "png_inventory": q_png_inventory,
        "svg_security": q_svg_security,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flac_streaminfo": ORACLE_FLAC,
        "ogg_sniff": ORACLE_OGG,
        "png_inventory": ORACLE_PNG_INVENTORY,
        "svg_security": ORACLE_SVG_SECURITY,
    }
