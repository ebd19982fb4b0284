"""Round-3 queries, part 13: variable-offset image container walks —
GIF animation accounting (frames / delays / loop count, no LZW decode)
and ISO-BMFF (AVIF / HEIC) `ispe`/`pixi` extraction (no codec).

Both are constructed-payload queries like jpeg_sniff (suite36): the
byte streams are built from the spec per doc_id family, so the oracle
can state every field in closed form.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .images import gif_animation, isobmff_meta


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _le16(col) -> F.Column:
    """Hex of a value as a little-endian u16 (GIF integer encoding)."""
    c = col.cast("long")
    return F.concat(
        F.lpad(F.hex(c % 256), 2, "0"),
        F.lpad(F.hex((c / 256).cast("long") % 256), 2, "0"),
    )


def _be32(col) -> F.Column:
    return F.lpad(F.hex(col.cast("long")), 8, "0")


# --------------------------------------------------------------------------
# gif_animation
# --------------------------------------------------------------------------

_GIF87 = "474946383761"
_GIF89 = "474946383961"
_LSD = "0200" "0200" "00" "00" "00"  # 2x2, no global color table
# image descriptor (1x1, no LCT) + LZW min code + one 2-byte sub-block
_FRAME = "2C" "0000000001000100" "00" "02" "024C01" "00"
_TRAILER = "3B"
_NETSCAPE = "21FF0B" "4E45545343415045322E30" "0301"  # + le16(loops) + 00


def _gce(delay_hex: F.Column) -> F.Column:
    return F.concat(F.lit("21F904" "00"), delay_hex, F.lit("00" "00"))


def q_gif_animation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.gif_animation over constructed GIF streams — the four
    families per doc_id%4: (0) static GIF87a single frame; (1) GIF89a
    3 frames with per-frame graphic-control delays (5+doc%90, 10, 12)
    and a NETSCAPE loop count doc%5; (2) GIF89a 2 frames (delays 10,
    3+doc%7), NO application extension (loop NULL = play once); (3)
    GIF89a truncated after frame 1 at an extension introducer —
    counted frames survive, gif_complete = 0.  Every output field is a
    closed form of doc_id, stated by the oracle."""
    doc = F.col("doc_id")
    m = doc % 4
    d1 = _le16(5 + doc % 90)
    d2 = _le16(F.lit(10))
    d3 = _le16(F.lit(12))
    loops = _le16(doc % 5)
    d2b = _le16(3 + doc % 7)
    hexstr = (
        F.when(m == 0, F.concat(F.lit(_GIF87 + _LSD + _FRAME + _TRAILER)))
        .when(m == 1, F.concat(
            F.lit(_GIF89 + _LSD + _NETSCAPE), loops, F.lit("00"),
            _gce(d1), F.lit(_FRAME), _gce(d2), F.lit(_FRAME),
            _gce(d3), F.lit(_FRAME), F.lit(_TRAILER)))
        .when(m == 2, F.concat(
            F.lit(_GIF89 + _LSD), _gce(d2), F.lit(_FRAME),
            _gce(d2b), F.lit(_FRAME), F.lit(_TRAILER)))
        .otherwise(F.lit(_GIF89 + _LSD + _FRAME + "21"))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return gif_animation(imgs).select(
        "doc_id", "gif_kind", "gif_frames", "gif_animated",
        "gif_min_delay_cs", "gif_total_delay_cs", "gif_loop_count",
        "gif_complete",
    ).orderBy("doc_id")


ORACLE_GIF = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 0 THEN '87a' ELSE '89a' END AS gif_kind,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 WHEN 3 THEN 1
       END AS BIGINT) AS gif_frames,
       CAST(CASE WHEN doc_id % 4 IN (1, 2) THEN 1 ELSE 0 END
            AS INTEGER) AS gif_animated,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 1 THEN LEAST(5 + doc_id % 90, 10)
         WHEN 2 THEN 3 + doc_id % 7
       END AS BIGINT) AS gif_min_delay_cs,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 1 THEN 27 + doc_id % 90
         WHEN 2 THEN 13 + doc_id % 7
       END AS BIGINT) AS gif_total_delay_cs,
       CAST(CASE WHEN doc_id % 4 = 1 THEN doc_id % 5
       END AS BIGINT) AS gif_loop_count,
       CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END
            AS INTEGER) AS gif_complete
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# isobmff_dims
# --------------------------------------------------------------------------

def _ftyp(brand_hex: str) -> str:
    return "00000018" "66747970" + brand_hex + "00000000" \
        + "61766966" "6D696631"


def _meta_chain(w: F.Column, h: F.Column, pixi_hex: str,
                largesize: bool = False) -> F.Column:
    """meta(full) -> iprp -> ipco -> ispe(w,h) [+ pixi]."""
    ispe = F.concat(F.lit("00000014" "69737065" "00000000"),
                    _be32(w), _be32(h))
    ipco_len = 8 + 20 + len(pixi_hex) // 2
    iprp_len = 8 + ipco_len
    ipco = F.concat(F.lit(f"{ipco_len:08X}" "6970636F"), ispe,
                    F.lit(pixi_hex))
    iprp = F.concat(F.lit(f"{iprp_len:08X}" "69707270"), ipco)
    if largesize:
        total = 16 + 4 + iprp_len
        return F.concat(
            F.lit("00000001" "6D657461" + f"{total:016X}" + "00000000"),
            iprp)
    total = 8 + 4 + iprp_len
    return F.concat(F.lit(f"{total:08X}" "6D657461" "00000000"), iprp)


_PIXI3 = "00000010" "70697869" "00000000" "03"  # + 3 depth bytes
_PIXI1 = "0000000E" "70697869" "00000000" "01" "0C"  # 1 channel, 12-bit


def q_isobmff_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.isobmff_meta over constructed AVIF/HEIC box chains — the
    dims live 4 containers deep (meta->iprp->ipco->ispe) at offsets that
    depend on sibling boxes, so this exercises the real walk: (0) avif,
    full chain + 3-channel pixi with depth 8+2*(doc%2); (1) heic,
    1-channel 12-bit pixi; (2) avif whose meta box uses the size==1
    LARGESIZE encoding, ispe only (channels/depth NULL); (3) avif ftyp
    followed by a meta box whose declared size overruns the payload —
    truncated fetch: brand survives, everything else NULL."""
    doc = F.col("doc_id")
    m = doc % 4
    w = (100 + doc % 900).cast("long")
    h = (80 + doc % 500).cast("long")
    dep = F.lpad(F.hex(8 + 2 * (doc % 2)), 2, "0")
    pixi3 = F.concat(F.lit(_PIXI3), dep, dep, dep)
    chain3 = F.concat(
        F.lit("00000014" "69737065" "00000000"), _be32(w), _be32(h))
    # family 0: meta with ispe + 3-channel pixi (sizes for 16-byte pixi)
    fam0 = F.concat(
        F.lit("00000040" "6D657461" "00000000"
              "00000034" "69707270" "0000002C" "6970636F"),
        chain3, pixi3)
    hexstr = (
        F.when(m == 0, F.concat(F.lit(_ftyp("61766966")), fam0))
        .when(m == 1, F.concat(F.lit(_ftyp("68656963")),
                               _meta_chain(w, h, _PIXI1)))
        .when(m == 2, F.concat(F.lit(_ftyp("61766966")),
                               _meta_chain(w, h, "", largesize=True)))
        .otherwise(F.concat(F.lit(_ftyp("61766966")),
                            F.lit("00000040" "6D657461"
                                  "00000000" "11223344")))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return isobmff_meta(imgs).select(
        "doc_id", "bmff_brand", "bmff_w", "bmff_h",
        "bmff_channels", "bmff_bit_depth",
    ).orderBy("doc_id")


ORACLE_BMFF = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 1 THEN 'heic' ELSE 'avif' END AS bmff_brand,
       CAST(CASE WHEN doc_id % 4 < 3 THEN 100 + doc_id % 900
       END AS BIGINT) AS bmff_w,
       CAST(CASE WHEN doc_id % 4 < 3 THEN 80 + doc_id % 500
       END AS BIGINT) AS bmff_h,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 3 WHEN 1 THEN 1
       END AS BIGINT) AS bmff_channels,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 8 + 2 * (doc_id % 2) WHEN 1 THEN 12
       END AS BIGINT) AS bmff_bit_depth
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "gif_animation": q_gif_animation,
        "isobmff_dims": q_isobmff_dims,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "gif_animation": ORACLE_GIF,
        "isobmff_dims": ORACLE_BMFF,
    }
