"""Round-3 queries, part 14: unigram surprisal quality scores, JPEG
scan/DRI structure, PNG tEXt metadata, per-host alt-text coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# unigram_surprisal
# --------------------------------------------------------------------------

def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.unigram_surprisal over documents.text; the
    oracle rebuilds the smoothed unigram table and the micro-quantized
    -log2 p(w) sums in SQL."""
    from .textops.quality import unigram_surprisal

    return unigram_surprisal(_docs(spark, sf_dir)).orderBy("id")


ORACLE_SURPRISAL = """
WITH tok AS (
  SELECT doc_id AS id, UNNEST(list_filter(
      string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w
  FROM documents
),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
tot AS (SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n_total FROM tok),
scored AS (
  SELECT tok.id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(ROUND(1e6 * -log2((uni.c + 1.0) / tot.n_total))
                       AS BIGINT)) AS BIGINT) AS sum_surprisal_micro
  FROM tok JOIN uni ON uni.w = tok.w CROSS JOIN tot
  GROUP BY tok.id
)
SELECT d.doc_id AS id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.sum_surprisal_micro, 0) AS sum_surprisal_micro,
       CASE WHEN s.n_tokens > 0 THEN
         CAST(ROUND(CAST(s.sum_surprisal_micro AS DOUBLE)
                    / s.n_tokens / 1e3) AS BIGINT)
       END AS mean_surprisal_milli
FROM documents d LEFT JOIN scored s ON s.id = d.doc_id
ORDER BY id
"""


# --------------------------------------------------------------------------
# jpeg_scan
# --------------------------------------------------------------------------

_SOF0 = "ffc0" + "0011" + "08" + "0010" + "0010" + "03" \
    + "012200" + "021101" + "031101"
_SOF2 = "ffc2" + "0011" + "08" + "0010" + "0010" + "03" \
    + "012200" + "021101" + "031101"
_DRI4 = "ffdd" + "0004" + "0004"
_SOS = "ffda" + "0008" + "01" + "0100" + "003f00"
_ENTROPY = "1234" + "ff00" + "56" + "ffd0" + "78"  # stuffed FF00 + RST0

_JPEG_BASE = "ffd8" + _SOF0 + _DRI4 + _SOS + _ENTROPY + "ffd9"
_JPEG_PROG = ("ffd8" + _SOF2 + _SOS + _ENTROPY + _SOS + _ENTROPY
              + _SOS + _ENTROPY + "ffd9")
_JPEG_TRUNC = "ffd8" + _SOF0 + _SOS + _ENTROPY


def q_jpeg_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.jpeg_scan_structure over planted streams: baseline with
    DRI=4 and stuffed-byte/RST entropy data, a 3-scan progressive, a
    truncated single-scan stream with no EOI, and a non-JPEG; the
    oracle states (scans, dri, eoi) per case."""
    from .images import jpeg_scan_structure

    doc = F.col("doc_id")
    m = doc % 4
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_JPEG_BASE))
        .when(m == 2, F.lit(_JPEG_PROG))
        .otherwise(F.lit(_JPEG_TRUNC))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return jpeg_scan_structure(imgs).select(
        "doc_id", "jpeg_n_scans", "jpeg_restart_interval",
        "jpeg_has_eoi",
    ).orderBy("doc_id")


ORACLE_JPEG_SCAN = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 2 THEN 3
                 ELSE 1 END AS INTEGER) AS jpeg_n_scans,
       CAST(CASE doc_id % 4 WHEN 1 THEN 4 END AS BIGINT)
         AS jpeg_restart_interval,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 3 THEN 0
                 ELSE 1 END AS INTEGER) AS jpeg_has_eoi
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# png_text
# --------------------------------------------------------------------------

def _text_chunk(key: str, value: str) -> str:
    import struct
    import zlib

    data = key.encode() + b"\x00" + value.encode()
    return (struct.pack(">I", len(data)) + b"tEXt" + data
            + struct.pack(">I", zlib.crc32(b"tEXt" + data))).hex()


_PNG_HDR = "89504e470d0a1a0a" + "0000000d49484452" \
    + "0000001000000010" + "0802000000" + "00000000"
_IEND = "0000000049454e44" + "ae426082"
_PNG_2TEXT = (_PNG_HDR + _text_chunk("Software", "gimp")
              + _text_chunk("Author", "alice") + _IEND)
_PNG_0TEXT = _PNG_HDR + _IEND


def q_png_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.png_text_chunks exploded to rows: a PNG carrying
    Software/Author tEXt, a PNG with none (one NULL row via
    explode_outer), and a non-PNG (NULL row)."""
    from .images import png_text_chunks

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_PNG_2TEXT))
        .otherwise(F.lit(_PNG_0TEXT))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return (
        png_text_chunks(imgs)
        .select("doc_id", F.explode_outer("png_texts").alias("t"))
        .select("doc_id", F.col("t.key").alias("text_key"),
                F.col("t.value").alias("text_value"))
        .orderBy("doc_id", "text_key")
    )


ORACLE_PNG_TEXT = """
WITH rows AS (
  SELECT doc_id, 'Software' AS text_key, 'gimp' AS text_value
  FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id, 'Author', 'alice' FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id, NULL, NULL FROM documents WHERE doc_id % 3 <> 1
)
SELECT doc_id, text_key, text_value
FROM rows
ORDER BY doc_id, text_key
"""


# --------------------------------------------------------------------------
# alt_coverage
# --------------------------------------------------------------------------

def q_alt_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.host_alt_coverage over 8 hosts: pages carry 0, 2 (one
    alt), or 3 (two nonempty alts, one empty) <img> tags; the oracle
    replays the per-page counts and the host rollup."""
    from .mmcurate import host_alt_coverage

    doc = F.col("doc_id")
    k, m = doc % 8, doc % 3
    body = (
        F.when(m == 0, F.lit("<p>no images</p>"))
        .when(m == 1, F.lit('<img src="a.jpg" alt="a cat"><img src="b.jpg">'))
        .otherwise(F.lit('<img src="c.jpg" alt="ok"><img src="d.jpg" '
                         'alt=""><img src="e.jpg" alt="fine">'))
    )
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("m"), k.cast("string"), F.lit(".com")).alias("host"),
        body.alias("body"),
    )
    return host_alt_coverage(pages).orderBy("host")


ORACLE_ALT_COVERAGE = """
WITH p AS (
  SELECT 'm' || (doc_id % 8) || '.com' AS host,
         CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 3 END AS i,
         CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END AS a
  FROM documents
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(i) AS BIGINT) AS n_imgs,
       CAST(SUM(a) AS BIGINT) AS n_with_alt,
       CASE WHEN SUM(i) > 0
            THEN CAST((1000 * SUM(a)) // SUM(i) AS BIGINT) END
         AS alt_permille
FROM p
GROUP BY host
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "unigram_surprisal": q_unigram_surprisal,
        "jpeg_scan": q_jpeg_scan,
        "png_text": q_png_text,
        "alt_coverage": q_alt_coverage,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "unigram_surprisal": ORACLE_SURPRISAL,
        "jpeg_scan": ORACLE_JPEG_SCAN,
        "png_text": ORACLE_PNG_TEXT,
        "alt_coverage": ORACLE_ALT_COVERAGE,
    }
