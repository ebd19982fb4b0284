"""Round-3 queries, part 4: CSS background-image extraction, consensus
captions within perceptual-dup groups, RFC 8288 Link-header preload
parsing, and Iceberg-style snapshot expiry / orphan-file planning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# css_bg_images
# --------------------------------------------------------------------------

def q_css_bg_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.css_background_images over constructed pages: one inline
    style attribute url, a <style> block with a real url plus a data:
    URI that must be dropped; the oracle states the two surviving rows
    per page arithmetically."""
    from .extract import css_background_images

    doc = F.col("doc_id")
    body = F.concat(
        F.lit('<html><body><div style="background-image: url(\'/hero-'),
        doc.cast("string"),
        F.lit('.jpg\'); color: red"></div><style>.a { background: '
              '#fff url("/sprite-'),
        doc.cast("string"),
        F.lit('.png") no-repeat; } .b { background-image: '
              'url(data:image/gif;base64,R0lGOD); }</style></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    return css_background_images(pages).orderBy("doc_id", "css_source")


ORACLE_CSS_BG = """
SELECT doc_id,
       '/hero-' || CAST(doc_id AS VARCHAR) || '.jpg' AS css_url,
       'inline' AS css_source
FROM documents
UNION ALL
SELECT doc_id,
       '/sprite-' || CAST(doc_id AS VARCHAR) || '.png' AS css_url,
       'style_block' AS css_source
FROM documents
ORDER BY doc_id, css_source
"""


# --------------------------------------------------------------------------
# caption_consensus
# --------------------------------------------------------------------------

def q_caption_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.caption_consensus over 40 perceptual-dup groups: copies
    with doc%5 != 0 carry the group's majority caption, the rest a
    minority one; consensus = most frequent caption (lexicographic
    tiebreak), support in integer permille, conflict flag."""
    from .mmcurate import caption_consensus

    doc = F.col("doc_id")
    g = (doc % 40).cast("long")
    caption = F.when(
        doc % 5 != 0, F.concat(F.lit("major-"), g.cast("string"))
    ).otherwise(F.concat(F.lit("minor-"), g.cast("string")))
    images = _docs(spark, sf_dir).select(
        doc.alias("image_id"), g.alias("phash"), caption.alias("caption"))
    return caption_consensus(images).orderBy("phash")


ORACLE_CAPTION_CONSENSUS = """
WITH imgs AS (
  SELECT doc_id % 40 AS g,
         CASE WHEN doc_id % 5 <> 0
              THEN 'major-' || CAST(doc_id % 40 AS VARCHAR)
              ELSE 'minor-' || CAST(doc_id % 40 AS VARCHAR) END AS cap
  FROM documents
),
per_cap AS (
  SELECT g, cap, COUNT(*) AS n FROM imgs GROUP BY g, cap
),
best AS (
  SELECT g, cap, n,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY n DESC, cap) AS rn,
         SUM(n) OVER (PARTITION BY g) AS n_copies,
         COUNT(*) OVER (PARTITION BY g) AS n_captions
  FROM per_cap
)
SELECT CAST(g AS BIGINT) AS phash,
       cap AS consensus_caption,
       CAST(n AS BIGINT) AS consensus_count,
       CAST(n_copies AS BIGINT) AS n_copies,
       CAST(n_captions AS BIGINT) AS n_captions,
       CAST(1000 * n // n_copies AS BIGINT) AS support_permille,
       n_captions > 1 AS conflict
FROM best WHERE rn = 1
ORDER BY phash
"""


# --------------------------------------------------------------------------
# link_preload
# --------------------------------------------------------------------------

def q_link_preload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.parse_link_headers over constructed Link headers carrying a
    preload-as-image hint, a quoted rel="next" pagination target and a
    bare stylesheet entry; the oracle restates the three exploded rows
    (url, rel, as, ord) per response."""
    from .fetch import parse_link_headers

    doc = F.col("doc_id")
    hdr = F.concat(
        F.lit("<https://cdn.example/img-"), doc.cast("string"),
        F.lit(".webp>; rel=preload; as=image, </page?p="),
        (doc + 1).cast("string"),
        F.lit('>; rel="next", <https://cdn.example/site.css>; '
              "rel=stylesheet"),
    )
    resp = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), hdr.alias("link_header"))
    return parse_link_headers(resp).orderBy("doc_id", "ord")


ORACLE_LINK_PRELOAD = """
SELECT doc_id,
       'https://cdn.example/img-' || CAST(doc_id AS VARCHAR) || '.webp'
         AS link_url,
       'preload' AS link_rel, 'image' AS link_as, CAST(0 AS BIGINT) AS ord
FROM documents
UNION ALL
SELECT doc_id, '/page?p=' || CAST(doc_id + 1 AS VARCHAR),
       'next', NULL, CAST(1 AS BIGINT)
FROM documents
UNION ALL
SELECT doc_id, 'https://cdn.example/site.css',
       'stylesheet', NULL, CAST(2 AS BIGINT)
FROM documents
ORDER BY doc_id, ord
"""


# --------------------------------------------------------------------------
# snapshot_expiry
# --------------------------------------------------------------------------

_EXP_HORIZON = 55
_EXP_KEEP = 3


def q_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """checkpoint.snapshot_expiry: 10 snapshots at ts 10*id, horizon 55,
    retain last 3 — snapshots 0-4 expire (5 is under horizon? 5*10=50<55
    but rank keeps 7,8,9; snapshot 5,6 expire too iff ts<55 -> only 5).
    Each doc's file is referenced by snapshots doc%10 and (doc*3)%10;
    a file is orphaned when every referencing snapshot expired."""
    from .checkpoint import snapshot_expiry

    snaps = spark.range(10).select(
        F.col("id").cast("long").alias("snapshot_id"),
        (10 * F.col("id")).cast("long").alias("commit_ts"),
    )
    doc = F.col("doc_id")
    files = _docs(spark, sf_dir).select(
        F.concat(F.lit("f"), doc.cast("string")).alias("file_id"),
        (doc % 10).cast("long").alias("snapshot_id"),
    ).unionByName(_docs(spark, sf_dir).select(
        F.concat(F.lit("f"), doc.cast("string")).alias("file_id"),
        ((doc * 3) % 10).cast("long").alias("snapshot_id"),
    ))
    return snapshot_expiry(
        snaps, files, horizon_ts=_EXP_HORIZON, keep_last=_EXP_KEEP,
    ).orderBy("file_id")


ORACLE_SNAPSHOT_EXPIRY = f"""
WITH snaps AS (
  SELECT UNNEST(generate_series(0, 9)) AS snap
),
flags AS (
  SELECT snap,
         (10 * snap < {_EXP_HORIZON}) AND (snap < 10 - {_EXP_KEEP})
           AS expirable
  FROM snaps
),
files AS (
  SELECT 'f' || CAST(doc_id AS VARCHAR) AS file_id,
         doc_id % 10 AS snap
  FROM documents
  UNION ALL
  SELECT 'f' || CAST(doc_id AS VARCHAR) AS file_id,
         (doc_id * 3) % 10 AS snap
  FROM documents
),
g AS (
  SELECT file_id, COUNT(*) AS n_refs,
         SUM(CASE WHEN NOT expirable THEN 1 ELSE 0 END) AS n_live_refs
  FROM files JOIN flags USING (snap)
  GROUP BY file_id
)
SELECT file_id, CAST(n_refs AS BIGINT) AS n_refs,
       CAST(n_live_refs AS BIGINT) AS n_live_refs,
       n_live_refs = 0 AS orphaned
FROM g
ORDER BY file_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "css_bg_images": q_css_bg_images,
        "caption_consensus": q_caption_consensus,
        "link_preload": q_link_preload,
        "snapshot_expiry": q_snapshot_expiry,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "css_bg_images": ORACLE_CSS_BG,
        "caption_consensus": ORACLE_CAPTION_CONSENSUS,
        "link_preload": ORACLE_LINK_PRELOAD,
        "snapshot_expiry": ORACLE_SNAPSHOT_EXPIRY,
    }
