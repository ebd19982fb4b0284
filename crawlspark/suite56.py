"""Round-3 queries, part 6: EXIF IFD1 thumbnail privacy scan, PNG
Adam7 interlace size accounting, PMI bigram collocations, and
Levenshtein caption pairs within perceptual-dup groups.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# exif_thumbnail
# --------------------------------------------------------------------------

def _tiff_hex(le: bool, ifd1: bool, thumb_off: int) -> str:
    """Constant TIFF prefix up to (exclusive) the IFD1 length VALUE:
    header, IFD0 (1 orientation entry), next-IFD pointer, and — when
    ``ifd1`` — IFD1's compression + offset entries and the length
    entry's tag/type/count.  Byte-exact per TIFF 6.0 so the pandas-UDF
    walker has real offsets to chase."""
    e = "<" if le else ">"

    def h(fmt: str, *vals: int) -> str:
        return struct.pack(e + fmt, *vals).hex()

    out = ("49492a00" if le else "4d4d002a") + h("I", 8)
    # IFD0: one entry (orientation SHORT 1), next-IFD -> 26 or 0
    out += h("H", 1) + h("HHI", 0x0112, 3, 1) + h("H", 1) + "0000"
    out += h("I", 26 if ifd1 else 0)
    if not ifd1:
        return out
    # IFD1: compression=6 (SHORT), JPEGInterchangeFormat, then the
    # length entry up to its 4-byte value (appended by the caller)
    out += h("H", 3)
    out += h("HHI", 0x0103, 3, 1) + h("H", 6) + "0000"
    out += h("HHII", 0x0201, 4, 1, thumb_off)
    out += h("HHI", 0x0202, 4, 1)
    return out


def q_exif_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.exif_thumbnail_scan over constructed TIFF/EXIF blocks:
    per doc%5 — non-TIFF (NULLs), TIFF without IFD1, little- and
    big-endian IFD1 with an in-bounds JPEG thumbnail of L=4+doc%9
    bytes, and an IFD1 whose thumbnail offset points past the payload
    (privacy scan must flag out-of-bounds)."""
    from .images import exif_thumbnail_scan

    doc = F.col("doc_id")
    m = doc % 5
    L = (4 + doc % 9).cast("long")
    lhex = F.lpad(F.hex(L), 2, "0")
    len_le = F.concat(lhex, F.lit("000000"))
    len_be = F.concat(F.lit("000000"), lhex)
    tail = F.concat(F.lit("00000000"),
                    F.expr("repeat('AB', CAST(4 + doc_id % 9 AS INT))"))
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))  # GIF89a: not TIFF
        .when(m == 1, F.lit(_tiff_hex(True, False, 0)))
        .when(m == 2, F.concat(F.lit(_tiff_hex(True, True, 68)),
                               len_le, tail))
        .when(m == 3, F.concat(F.lit(_tiff_hex(False, True, 68)),
                               len_be, tail))
        .otherwise(F.concat(F.lit(_tiff_hex(True, True, 9999)),
                            F.lit("08000000"), F.lit("00000000")))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return exif_thumbnail_scan(imgs).select(
        "doc_id", "exif_ifd0_entries", "has_thumbnail", "thumb_offset",
        "thumb_len", "thumb_compression", "thumb_in_bounds",
    ).orderBy("doc_id")


ORACLE_EXIF_THUMBNAIL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 1 END AS INTEGER)
         AS exif_ifd0_entries,
       CAST(CASE WHEN doc_id % 5 = 0 THEN NULL
                 WHEN doc_id % 5 = 1 THEN 0 ELSE 1 END AS INTEGER)
         AS has_thumbnail,
       CAST(CASE WHEN doc_id % 5 IN (2, 3) THEN 68
                 WHEN doc_id % 5 = 4 THEN 9999 END AS BIGINT)
         AS thumb_offset,
       CAST(CASE WHEN doc_id % 5 IN (2, 3) THEN 4 + doc_id % 9
                 WHEN doc_id % 5 = 4 THEN 8 END AS BIGINT) AS thumb_len,
       CAST(CASE WHEN doc_id % 5 IN (2, 3, 4) THEN 6 END AS BIGINT)
         AS thumb_compression,
       CAST(CASE WHEN doc_id % 5 IN (2, 3) THEN 1
                 WHEN doc_id % 5 = 4 THEN 0 END AS INTEGER)
         AS thumb_in_bounds
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# adam7_plan
# --------------------------------------------------------------------------

def q_adam7_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.adam7_plan for w=1+doc%40, h=1+doc%25 (tiny sizes
    exercise empty passes: a 1x1 image has exactly one nonempty pass);
    the oracle replays the 7-pass ceil grid and the filter-byte
    accounting in integer SQL."""
    from .images import adam7_plan

    doc = F.col("doc_id")
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        (1 + doc % 40).cast("long").alias("w"),
        (1 + doc % 25).cast("long").alias("h"),
    )
    return adam7_plan(imgs).select(
        "doc_id", "w", "h", "interlaced_bytes", "plain_bytes",
        "overhead_permille", "nonempty_passes",
    ).orderBy("doc_id")


ORACLE_ADAM7 = """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 40 AS w, 1 + doc_id % 25 AS h
  FROM documents
),
pass(x0, y0, dx, dy) AS (
  SELECT UNNEST([0,4,0,2,0,1,0]), UNNEST([0,0,4,0,2,0,1]),
         UNNEST([8,8,4,4,2,2,1]), UNNEST([8,8,8,4,4,2,2])
),
per AS (
  SELECT d.doc_id, d.w, d.h,
         CASE WHEN d.w > p.x0 THEN (d.w - p.x0 + p.dx - 1) // p.dx
              ELSE 0 END AS cols,
         CASE WHEN d.h > p.y0 THEN (d.h - p.y0 + p.dy - 1) // p.dy
              ELSE 0 END AS rows
  FROM d CROSS JOIN pass p
),
agg AS (
  SELECT doc_id, w, h,
         CAST(SUM(CASE WHEN cols > 0 AND rows > 0
                       THEN rows * (1 + 3 * cols) ELSE 0 END)
              AS BIGINT) AS interlaced_bytes,
         CAST(SUM(CASE WHEN cols > 0 AND rows > 0 THEN 1 ELSE 0 END)
              AS INTEGER) AS nonempty_passes
  FROM per GROUP BY doc_id, w, h
)
SELECT doc_id, w, h, interlaced_bytes,
       h * (1 + 3 * w) AS plain_bytes,
       (1000 * (interlaced_bytes - h * (1 + 3 * w)))
         // (h * (1 + 3 * w)) AS overhead_permille,
       nonempty_passes
FROM agg
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# pmi_collocations
# --------------------------------------------------------------------------

def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.pmi_collocations over documents.text with
    min_count=5; the oracle rebuilds tokens, unigram/bigram counts and
    the micro-quantized log2 PMI with the same operand order."""
    from .textops.quality import pmi_collocations

    return pmi_collocations(
        _docs(spark, sf_dir), min_count=5).orderBy("w1", "w2")


ORACLE_PMI = """
WITH tok AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT UNNEST(t) AS w FROM tok) GROUP BY w
),
bi_raw AS (
  SELECT UNNEST(list_transform(range(1, len(t)),
                               i -> struct_pack(w1 := t[i],
                                                w2 := t[i+1]))) AS b
  FROM tok
),
bi AS (
  SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bi_raw GROUP BY b.w1, b.w2 HAVING COUNT(*) >= 5
),
tot AS (
  SELECT CAST(SUM(len(t)) AS BIGINT) AS n_tok,
         CAST(SUM(GREATEST(len(t) - 1, 0)) AS BIGINT) AS n_bi
  FROM tok
)
SELECT bi.w1, bi.w2, bi.c12, u1.c AS c1, u2.c AS c2,
       CAST(ROUND((LN(CAST(bi.c12 AS DOUBLE) * t.n_tok * t.n_tok
                      / (CAST(t.n_bi AS DOUBLE) * u1.c * u2.c))
                   / LN(2.0)) * 1e6) AS BIGINT) AS pmi_micro
FROM bi
JOIN uni u1 ON u1.w = bi.w1
JOIN uni u2 ON u2.w = bi.w2
CROSS JOIN tot t
ORDER BY bi.w1, bi.w2
"""


# --------------------------------------------------------------------------
# caption_edit_pairs
# --------------------------------------------------------------------------

def q_caption_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.caption_edit_pairs over 50 planted phash groups with 4
    caption variants (exact dup, punctuation, typo, rewrite); the
    oracle replays the bucketed self-join with DuckDB's levenshtein —
    both engines implement the classic DP metric, so distances match
    exactly."""
    from .mmcurate import caption_edit_pairs

    doc = F.col("doc_id")
    variant = (
        F.when(doc % 4 == 0, F.lit("the red fox"))
        .when(doc % 4 == 1, F.lit("the red fox!"))
        .when(doc % 4 == 2, F.lit("the redd fox"))
        .otherwise(F.lit("a blue dog sleeps"))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("image_id"),
        (doc % 50).cast("long").alias("phash"),
        F.concat(F.lit("cap "), (doc % 50).cast("string"),
                 F.lit(" "), variant).alias("caption"),
    )
    return caption_edit_pairs(imgs, max_dist=3).orderBy(
        "phash", "id_a", "id_b")


ORACLE_CAPTION_EDIT = """
WITH imgs AS (
  SELECT doc_id AS image_id, doc_id % 50 AS phash,
         'cap ' || CAST(doc_id % 50 AS VARCHAR) || ' ' ||
         CASE WHEN doc_id % 4 = 0 THEN 'the red fox'
              WHEN doc_id % 4 = 1 THEN 'the red fox!'
              WHEN doc_id % 4 = 2 THEN 'the redd fox'
              ELSE 'a blue dog sleeps' END AS caption
  FROM documents
)
SELECT a.phash, a.image_id AS id_a, b.image_id AS id_b,
       CAST(levenshtein(a.caption, b.caption) AS BIGINT) AS edit_dist,
       levenshtein(a.caption, b.caption) <= 3 AS within
FROM imgs a JOIN imgs b
  ON a.phash = b.phash AND a.image_id < b.image_id
ORDER BY a.phash, id_a, id_b
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exif_thumbnail": q_exif_thumbnail,
        "adam7_plan": q_adam7_plan,
        "pmi_collocations": q_pmi_collocations,
        "caption_edit_pairs": q_caption_edit_pairs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exif_thumbnail": ORACLE_EXIF_THUMBNAIL,
        "adam7_plan": ORACLE_ADAM7,
        "pmi_collocations": ORACLE_PMI,
        "caption_edit_pairs": ORACLE_CAPTION_EDIT,
    }
