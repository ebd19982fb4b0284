"""Round-2 continuation queries, part 6: image+caption pair mining from
page HTML (the harvest step feeding the input_hint table), OpenGraph
hero-image metadata, and html-lang consistency checking.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying (or arithmetically stating) the identical result,
aligned names/types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import image_caption_pairs, og_image_meta


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# img_caption_pairs — (image_url, caption) harvest with figcaption priority
# --------------------------------------------------------------------------

def q_img_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-pair mining over a 3-shape corpus: a figure with a real
    figcaption (doc%3==0), a figure whose img has only alt text
    (doc%3==1 — proves the fallback), a bare captioned img on every
    page, and a caption-less img that must be dropped."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    page_url = F.concat(F.lit("http://h"), (doc % 9).cast("string"),
                        F.lit(".test/a/page.html"))
    fig = (
        F.when(doc % 3 == 0, F.concat(
            F.lit('<figure><img src="f'), s,
            F.lit('.jpg" alt="ignored"><figcaption>fig cap '),
            (doc % 13).cast("string"),
            F.lit("</figcaption></figure>"),
        ))
        .when(doc % 3 == 1, F.concat(
            F.lit('<figure><img src="g'), s, F.lit('.jpg" alt="galt '),
            (doc % 7).cast("string"), F.lit('"></figure>'),
        ))
        .otherwise(F.lit(""))
    )
    body = F.concat(
        F.lit("<html><body>"), fig,
        F.lit('<img src="/b'), s, F.lit('.png" alt="bare '),
        (doc % 5).cast("string"), F.lit('">'),
        F.lit('<img src="/n'), s, F.lit('.png">'),
        F.lit("</body></html>"),
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), page_url.alias("page_url")
    )
    return d.select(
        "doc_id",
        F.explode(
            image_caption_pairs(F.col("body"), F.col("page_url"))
        ).alias("p"),
    ).select(
        "doc_id",
        F.col("p.image_url").alias("image_url"),
        F.col("p.caption").alias("caption"),
        F.col("p.source").alias("source"),
    )


ORACLE_IMG_CAPTION_PAIRS = """
WITH d AS (
  SELECT doc_id, 'http://h' || CAST(doc_id % 9 AS VARCHAR) || '.test'
           AS auth
  FROM documents
)
SELECT doc_id,
       auth || '/a/f' || CAST(doc_id AS VARCHAR) || '.jpg' AS image_url,
       'fig cap ' || CAST(doc_id % 13 AS VARCHAR) AS caption,
       'figcaption' AS source
FROM d WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id,
       auth || '/a/g' || CAST(doc_id AS VARCHAR) || '.jpg',
       'galt ' || CAST(doc_id % 7 AS VARCHAR), 'alt'
FROM d WHERE doc_id % 3 = 1
UNION ALL
SELECT doc_id,
       auth || '/b' || CAST(doc_id AS VARCHAR) || '.png',
       'bare ' || CAST(doc_id % 5 AS VARCHAR), 'alt'
FROM d
"""


# --------------------------------------------------------------------------
# og_images — OpenGraph / Twitter-card hero image metadata
# --------------------------------------------------------------------------

def q_og_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """og:image with dims+title (doc%4==0), twitter:image fallback
    (doc%4==1), og:image without dims (doc%4==2), no nomination
    (doc%4==3 -> null row)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    meta = (
        F.when(doc % 4 == 0, F.concat(
            F.lit('<meta property="og:image" content="http://c.test/o'), s,
            F.lit('.jpg"><meta property="og:image:width" content="'),
            (F.lit(640) + doc % 5).cast("string"),
            F.lit('"><meta property="og:image:height" content="480">'
                  '<meta property="og:title" content="t'),
            (doc % 11).cast("string"), F.lit('">'),
        ))
        .when(doc % 4 == 1, F.concat(
            F.lit('<meta name="twitter:image" content="http://c.test/t'),
            s, F.lit('.png">'),
        ))
        .when(doc % 4 == 2, F.concat(
            F.lit('<meta property="og:image" content="http://c.test/p'),
            s, F.lit('.webp">'),
        ))
        .otherwise(F.lit('<meta property="og:type" content="article">'))
    )
    body = F.concat(F.lit("<html><head>"), meta,
                    F.lit("</head><body></body></html>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    og = og_image_meta(F.col("body"))
    return d.select(
        "doc_id",
        og["image_url"].alias("image_url"),
        og["width"].alias("width"),
        og["height"].alias("height"),
        og["title"].alias("title"),
    )


ORACLE_OG_IMAGES = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'http://c.test/o' || CAST(doc_id AS VARCHAR) || '.jpg'
         WHEN 1 THEN 'http://c.test/t' || CAST(doc_id AS VARCHAR) || '.png'
         WHEN 2 THEN 'http://c.test/p' || CAST(doc_id AS VARCHAR) || '.webp'
       END AS image_url,
       CASE WHEN doc_id % 4 = 0 THEN 640 + doc_id % 5 END AS width,
       CASE WHEN doc_id % 4 = 0 THEN 480 END AS height,
       CASE WHEN doc_id % 4 = 0 THEN 't' || CAST(doc_id % 11 AS VARCHAR)
       END AS title
FROM documents
"""


# --------------------------------------------------------------------------
# html_lang_check — declared lang attr vs the table's lang column
# --------------------------------------------------------------------------

def q_html_lang_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<html lang="..."> declaration vs the corpus lang column: every
    5th page declares a bogus 'xx' (the mismatch a language-routing
    pipeline must catch before trusting the declaration)."""
    doc = F.col("doc_id")
    declared = F.when(doc % 5 == 0, F.lit("xx")).otherwise(F.col("lang"))
    body = F.concat(F.lit('<html lang="'), declared,
                    F.lit('"><body>x</body></html>'))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.col("lang"), body.alias("body")
    )
    got = F.regexp_extract(F.col("body"), r'(?i)<html[^>]*\blang\s*=\s*"([^"]*)"', 1)
    return d.select(
        "doc_id", "lang",
        got.alias("declared_lang"),
        (got == F.col("lang")).alias("consistent"),
    )


ORACLE_HTML_LANG = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS declared_lang,
       NOT doc_id % 5 = 0 AS consistent
FROM documents
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "img_caption_pairs": q_img_caption_pairs,
        "og_images": q_og_images,
        "html_lang_check": q_html_lang_check,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "img_caption_pairs": ORACLE_IMG_CAPTION_PAIRS,
        "og_images": ORACLE_OG_IMAGES,
        "html_lang_check": ORACLE_HTML_LANG,
    }
