"""Round-3 queries, part 2: container walks for the modern image stack —
animated WebP (ANIM/ANMF), APNG (acTL placement rules), TIFF IFD both
byte orders, SVG text dims, JPEG color-management segments (ICC / Adobe
transform / CMYK-vs-YCCK routing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _h2(col) -> Column:
    """One byte -> 2 hex chars."""
    return F.lpad(F.hex(col.cast("long") % 256), 2, "0")


def _le16h(col) -> Column:
    return F.concat(_h2(col), _h2((col / 256).cast("long")))


def _le24h(col) -> Column:
    return F.concat(_h2(col), _h2((col / 256).cast("long")),
                    _h2((col / 65536).cast("long")))


def _le32h(col) -> Column:
    return F.concat(_le16h(col), _le16h((col / 65536).cast("long")))


def _be16h(col) -> Column:
    return F.concat(_h2((col / 256).cast("long")), _h2(col))


def _be32h(col) -> Column:
    return F.concat(_be16h((col / 65536).cast("long")), _be16h(col))


# --------------------------------------------------------------------------
# animated_webp
# --------------------------------------------------------------------------

def q_animated_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.webp_animation over constructed RIFF containers: a 3-frame
    animation (durations 10+doc%50 / 20+doc%30 / 40 ms, loop count
    doc%5, alpha flag), a static VP8X with only the ICC flag, a static
    lossy 'VP8 ', and junk; the oracle restates frame count, min/total
    duration and the flags arithmetically."""
    from .images import webp_animation

    doc = F.col("doc_id")
    m = doc % 4
    d1 = (10 + doc % 50).cast("long")
    d2 = (20 + doc % 30).cast("long")
    loops = (doc % 5).cast("long")

    def chunk(cc_hex: str, payload_hex) -> Column:
        n = F.length(payload_hex) / 2
        return F.concat(F.lit(cc_hex), _le32h(n.cast("long")), payload_hex)

    def anmf(dur) -> Column:
        return chunk("414E4D46",
                     F.concat(F.lit("00" * 12), _le24h(dur), F.lit("00")))

    vp8x = lambda flags: chunk(  # noqa: E731
        "56503858",
        F.concat(F.lit(flags), F.lit("000000"),
                 F.lit("030000"), F.lit("030000")))
    anim = chunk("414E494D", F.concat(F.lit("00000000"), _le16h(loops)))
    head = F.concat(F.lit("52494646"), F.lit("00010000"),
                    F.lit("57454250"))
    hexstr = (
        F.when(m == 0, F.concat(head, vp8x("12"), anim,
                                anmf(d1), anmf(d2), anmf(F.lit(40))))
        .when(m == 1, F.concat(head, vp8x("20")))
        .when(m == 2, F.concat(
            F.lit("52494646"), F.lit("14000000"), F.lit("57454250"),
            F.lit("56503820"), F.lit("0C000000"), F.lit("00" * 12)))
        .otherwise(F.lit("4A554E4B" * 5))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return webp_animation(imgs).select(
        "doc_id", "webp_animated", "webp_frames", "webp_loop_count",
        "webp_min_dur_ms", "webp_total_dur_ms", "webp_has_alpha",
        "webp_has_icc", "webp_complete",
    ).orderBy("doc_id")


ORACLE_ANIMATED_WEBP = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 0 END AS webp_animated,
       CASE WHEN doc_id % 4 < 2 THEN CAST(CASE WHEN doc_id % 4 = 0
            THEN 3 ELSE 1 END AS BIGINT)
            WHEN doc_id % 4 = 2 THEN CAST(1 AS BIGINT)
       END AS webp_frames,
       CASE WHEN doc_id % 4 = 0 THEN CAST(doc_id % 5 AS BIGINT)
       END AS webp_loop_count,
       CASE WHEN doc_id % 4 = 0 THEN
            least(10 + doc_id % 50, 20 + doc_id % 30, 40)
       END AS webp_min_dur_ms,
       CASE WHEN doc_id % 4 = 0 THEN
            (10 + doc_id % 50) + (20 + doc_id % 30) + 40
       END AS webp_total_dur_ms,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 0 END AS webp_has_alpha,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0 END AS webp_has_icc,
       CASE WHEN doc_id % 4 < 3 THEN 1 END AS webp_complete
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# apng_detect
# --------------------------------------------------------------------------

def q_apng_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.apng_animation over constructed PNG chunk streams: a
    2-frame APNG (delays (1+doc%20)/10 s and 5/0 s — den 0 reads as
    100 -> 50 ms, plays doc%3), a plain PNG, a PNG whose acTL appears
    after IDAT (spec: not an APNG), and junk."""
    from .images import apng_animation

    doc = F.col("doc_id")
    m = doc % 4
    num1 = (1 + doc % 20).cast("long")
    plays = (doc % 3).cast("long")

    def chunk(typ_hex: str, data_hex) -> Column:
        n = F.length(data_hex) / 2
        return F.concat(_be32h(n.cast("long")), F.lit(typ_hex), data_hex,
                        F.lit("00000000"))

    sig = F.lit("89504E470D0A1A0A")
    ihdr = chunk("49484452", F.lit("00000004000000040806000000"))
    actl = chunk("6163544C", F.concat(F.lit("00000002"), _be32h(plays)))
    fctl1 = chunk("6663544C", F.concat(
        F.lit("00000000" + "00000004" + "00000004" + "00000000"
              + "00000000"),
        _be16h(num1), F.lit("000A"), F.lit("0000")))
    fctl2 = chunk("6663544C", F.lit(
        "00000001" + "00000004" + "00000004" + "00000000" + "00000000"
        + "0005" + "0000" + "0000"))
    idat = chunk("49444154", F.lit("78"))
    iend = chunk("49454E44", F.lit(""))
    hexstr = (
        F.when(m == 0, F.concat(sig, ihdr, actl, fctl1, idat, fctl2, iend))
        .when(m == 1, F.concat(sig, ihdr, idat, iend))
        .when(m == 2, F.concat(sig, ihdr, idat, actl, iend))
        .otherwise(F.lit("474946383961" + "00" * 10))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return apng_animation(imgs).select(
        "doc_id", "apng", "apng_frames", "apng_plays",
        "apng_total_delay_ms", "png_complete",
    ).orderBy("doc_id")


ORACLE_APNG = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN 1
            WHEN doc_id % 4 < 3 THEN 0 END AS apng,
       CASE WHEN doc_id % 4 = 0 THEN CAST(2 AS BIGINT) END AS apng_frames,
       CASE WHEN doc_id % 4 = 0 THEN CAST(doc_id % 3 AS BIGINT)
       END AS apng_plays,
       CASE WHEN doc_id % 4 = 0 THEN
            (1000 * (1 + doc_id % 20)) // 10 + 50
       END AS apng_total_delay_ms,
       CASE WHEN doc_id % 4 < 3 THEN 1 END AS png_complete
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# tiff_sniff
# --------------------------------------------------------------------------

def q_tiff_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.tiff_dims over constructed IFDs: little-endian with SHORT
    width / LONG height / orientation 1+doc%8, big-endian with LONG
    width / SHORT height and no orientation tag, and junk."""
    from .images import tiff_dims

    doc = F.col("doc_id")
    m = doc % 3
    w = (100 + doc % 300).cast("long")
    h = (50 + doc % 200).cast("long")
    orient = (1 + doc % 8).cast("long")

    def ent_le(tag: int, typ: int, val) -> Column:
        vh = _le16h(val) if typ == 3 else _le32h(val)
        pad = "0000" if typ == 3 else ""
        return F.concat(_le16h(F.lit(tag)), _le16h(F.lit(typ)),
                        F.lit("01000000"), vh, F.lit(pad))

    def ent_be(tag: int, typ: int, val) -> Column:
        vh = _be16h(val) if typ == 3 else _be32h(val)
        pad = "0000" if typ == 3 else ""
        return F.concat(_be16h(F.lit(tag)), _be16h(F.lit(typ)),
                        F.lit("00000001"), vh, F.lit(pad))

    ii = F.concat(
        F.lit("49492A00" + "08000000" + "0300"),
        ent_le(256, 3, w), ent_le(257, 4, h), ent_le(274, 3, orient),
        F.lit("00000000"))
    mm = F.concat(
        F.lit("4D4D002A" + "00000008" + "0002"),
        ent_be(256, 4, w), ent_be(257, 3, h),
        F.lit("00000000"))
    hexstr = (
        F.when(m == 0, ii).when(m == 1, mm)
        .otherwise(F.lit("FFD8FFE0" + "00" * 12))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return tiff_dims(imgs).select(
        "doc_id", "tiff_endian", "sniff_w", "sniff_h", "tiff_orientation",
    ).orderBy("doc_id")


ORACLE_TIFF = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INTEGER)
         WHEN 0 THEN 'II' WHEN 1 THEN 'MM' END AS tiff_endian,
       CASE WHEN doc_id % 3 < 2 THEN CAST(100 + doc_id % 300 AS BIGINT)
       END AS sniff_w,
       CASE WHEN doc_id % 3 < 2 THEN CAST(50 + doc_id % 200 AS BIGINT)
       END AS sniff_h,
       CASE WHEN doc_id % 3 = 0 THEN CAST(1 + doc_id % 8 AS BIGINT)
       END AS tiff_orientation
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# svg_sniff
# --------------------------------------------------------------------------

def q_svg_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.svg_dims over text payloads: width/height attributes,
    XML-declaration + comment + viewBox fallback, relative units
    (-> NULL dims, flagged), and an HTML non-SVG."""
    from .images import svg_dims

    doc = F.col("doc_id")
    m = doc % 4
    w = (100 + doc % 300).cast("string")
    h = (50 + doc % 200).cast("string")
    text = (
        F.when(m == 0, F.concat(
            F.lit('<svg width="'), w, F.lit('" height="'), h,
            F.lit('" xmlns="http://www.w3.org/2000/svg"></svg>')))
        .when(m == 1, F.concat(
            F.lit('<?xml version="1.0"?><!-- icon --><svg viewBox="0 0 '),
            w, F.lit(" "), h, F.lit('"><path d="M0 0"/></svg>')))
        .when(m == 2, F.lit('<svg width="10em" height="4em"/>'))
        .otherwise(F.lit("<!DOCTYPE html><html><body>x</body></html>"))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.encode(text, "UTF-8").alias("bytes"))
    return svg_dims(imgs).select(
        "doc_id", "is_svg", "sniff_w", "sniff_h", "svg_relative_units",
    ).orderBy("doc_id")


ORACLE_SVG = """
SELECT doc_id,
       CASE WHEN doc_id % 4 < 3 THEN 1 ELSE 0 END AS is_svg,
       CASE WHEN doc_id % 4 < 2 THEN CAST(100 + doc_id % 300 AS BIGINT)
       END AS sniff_w,
       CASE WHEN doc_id % 4 < 2 THEN CAST(50 + doc_id % 200 AS BIGINT)
       END AS sniff_h,
       CASE WHEN doc_id % 4 < 2 THEN 0
            WHEN doc_id % 4 = 2 THEN 1 END AS svg_relative_units
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# jpeg_color
# --------------------------------------------------------------------------

def q_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.jpeg_app_segments over constructed marker chains: YCCK
    (EXIF + 2 ICC chunks + Adobe transform 2 + 4-component SOF), raw
    CMYK (4-comp, no APP14), Adobe-RGB (transform 0, 3-comp), grayscale,
    plain YCbCr, and junk."""
    from .images import jpeg_app_segments

    doc = F.col("doc_id")
    m = doc % 6

    def seg(marker: str, body_hex: str) -> str:
        n = len(body_hex) // 2 + 2
        return marker + format(n, "04X") + body_hex

    exif = seg("FFE1", "457869660000" + "00" * 8)
    icc1 = seg("FFE2", "4943435F50524F46494C4500" + "0101" + "00" * 4)
    icc2 = seg("FFE2", "4943435F50524F46494C4500" + "0202" + "00" * 4)
    adobe = lambda t: seg(  # noqa: E731
        "FFEE", "41646F6265" + "00" * 6 + format(t, "02X"))

    def sof(ncomp: int) -> str:
        return seg("FFC0",
                   "08" + "000A" + "0014" + format(ncomp, "02X")
                   + "00" * (3 * ncomp))

    hexstr = (
        F.when(m == 0, F.lit("FFD8" + exif + icc1 + icc2 + adobe(2)
                             + sof(4) + "FFD9"))
        .when(m == 1, F.lit("FFD8" + sof(4) + "FFD9"))
        .when(m == 2, F.lit("FFD8" + adobe(0) + sof(3) + "FFD9"))
        .when(m == 3, F.lit("FFD8" + sof(1) + "FFD9"))
        .when(m == 4, F.lit("FFD8" + exif + sof(3) + "FFD9"))
        .otherwise(F.lit("474946383961" + "00" * 8))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return jpeg_app_segments(imgs).select(
        "doc_id", "jpeg_has_exif", "jpeg_has_icc", "jpeg_icc_chunks",
        "jpeg_adobe_transform", "jpeg_ncomp", "jpeg_color_mode",
    ).orderBy("doc_id")


ORACLE_JPEG_COLOR = """
SELECT doc_id,
       CASE WHEN doc_id % 6 = 5 THEN NULL
            WHEN doc_id % 6 IN (0, 4) THEN 1 ELSE 0 END AS jpeg_has_exif,
       CASE WHEN doc_id % 6 = 5 THEN NULL
            WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS jpeg_has_icc,
       CASE WHEN doc_id % 6 = 5 THEN NULL
            WHEN doc_id % 6 = 0 THEN CAST(2 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS jpeg_icc_chunks,
       CASE WHEN doc_id % 6 = 0 THEN CAST(2 AS BIGINT)
            WHEN doc_id % 6 = 2 THEN CAST(0 AS BIGINT)
       END AS jpeg_adobe_transform,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 4 WHEN 1 THEN 4 WHEN 2 THEN 3 WHEN 3 THEN 1
         WHEN 4 THEN 3 END AS jpeg_ncomp,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 'ycck' WHEN 1 THEN 'cmyk' WHEN 2 THEN 'rgb'
         WHEN 3 THEN 'gray' WHEN 4 THEN 'ycbcr' END AS jpeg_color_mode
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "animated_webp": q_animated_webp,
        "apng_detect": q_apng_detect,
        "tiff_sniff": q_tiff_sniff,
        "svg_sniff": q_svg_sniff,
        "jpeg_color": q_jpeg_color,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "animated_webp": ORACLE_ANIMATED_WEBP,
        "apng_detect": ORACLE_APNG,
        "tiff_sniff": ORACLE_TIFF,
        "svg_sniff": ORACLE_SVG,
        "jpeg_color": ORACLE_JPEG_COLOR,
    }
