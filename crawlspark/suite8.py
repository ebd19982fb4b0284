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
        "caption_harvest": q_caption_harvest,
        "bandwidth_throttle": q_bandwidth_throttle,
        "scheme_dedup": q_scheme_dedup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "img_caption_pairs": ORACLE_IMG_CAPTION_PAIRS,
        "og_images": ORACLE_OG_IMAGES,
        "html_lang_check": ORACLE_HTML_LANG,
        "caption_harvest": _oracle_caption_harvest(),
        "bandwidth_throttle": ORACLE_BANDWIDTH,
        "scheme_dedup": ORACLE_SCHEME_DEDUP,
    }


# --------------------------------------------------------------------------
# caption_harvest — composed: mine -> canonicalize -> blocklist -> dedup
# --------------------------------------------------------------------------

_HARVEST_BLOCK = {"h4.test": "ads"}


def q_caption_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed caption-harvest pipeline over a synthetic page
    corpus: inline (figcaption/alt) pair mining + OpenGraph nominations
    -> URL canonicalization with tracking-param strip -> registrable-
    domain blocklist gate (h4.test pages' own images drop; the shared
    CDN logo they also embed survives) -> per-image dedup keeping the
    lowest-doc reference with a reference count.  Every stage is the
    already-verified operator; the oracle replays the whole chain."""
    from .canon import canonicalize_expr, strip_tracking_params, url_category

    doc = F.col("doc_id")
    s = doc.cast("string")
    page_url = F.concat(F.lit("http://h"), (doc % 9).cast("string"),
                        F.lit(".test/a/page.html"))
    fig = (
        F.when(doc % 3 == 0, F.concat(
            F.lit('<figure><img src="f'), s,
            F.lit('.jpg" alt="ignored"><figcaption>fig cap '),
            (doc % 13).cast("string"), F.lit("</figcaption></figure>"),
        ))
        .when(doc % 3 == 1, F.concat(
            F.lit('<figure><img src="g'), s, F.lit('.jpg" alt="galt '),
            (doc % 7).cast("string"), F.lit('"></figure>'),
        ))
        .otherwise(F.lit(""))
    )
    og = F.when(doc % 4 == 0, F.concat(
        F.lit('<meta property="og:image" content="http://c.test/o'), s,
        F.lit('.jpg"><meta property="og:title" content="t'),
        (doc % 11).cast("string"), F.lit('">'),
    )).otherwise(F.lit(""))
    body = F.concat(
        F.lit("<html><head>"), og, F.lit("</head><body>"), fig,
        F.lit('<img src="/b'), s, F.lit('.png?utm_source=s" alt="bare '),
        (doc % 5).cast("string"), F.lit('">'),
        F.lit('<img src="http://cdn.test/logo.png" alt="logo">'),
        F.lit("</body></html>"),
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), page_url.alias("page_url")
    )
    inline = pages.select(
        "doc_id",
        F.explode(image_caption_pairs(F.col("body"), F.col("page_url"))
                  ).alias("p"),
    ).select(
        "doc_id", F.col("p.image_url").alias("raw_url"),
        F.col("p.caption").alias("caption"), F.col("p.source").alias("source"),
    )
    ogm = og_image_meta(F.col("body"))
    og_pairs = pages.select(
        "doc_id", ogm["image_url"].alias("raw_url"),
        ogm["title"].alias("caption"), F.lit("og").alias("source"),
    ).filter(F.col("raw_url").isNotNull() & F.col("caption").isNotNull())
    allp = inline.unionByName(og_pairs).select(
        "doc_id", "caption", "source",
        strip_tracking_params(canonicalize_expr(F.col("raw_url")))
        .alias("image_url"),
    )
    gated = allp.filter(
        url_category(F.col("image_url"), _HARVEST_BLOCK, {}) == "ok"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("image_url")
    ranked = (
        gated
        .withColumn("n_refs", F.count("*").over(w).cast("long"))
        .withColumn(
            "__r",
            F.row_number().over(w.orderBy("doc_id", "source", "caption")),
        )
        .filter(F.col("__r") == 1)
    )
    return ranked.select(
        "image_url", "caption", "source",
        F.col("doc_id").alias("from_doc"), "n_refs",
    )


def _oracle_caption_harvest() -> str:
    return """
WITH d AS (
  SELECT doc_id, 'http://h' || CAST(doc_id % 9 AS VARCHAR) || '.test'
           AS auth
  FROM documents
),
inline AS (
  SELECT doc_id,
         auth || '/a/f' || CAST(doc_id AS VARCHAR) || '.jpg' AS image_url,
         'fig cap ' || CAST(doc_id % 13 AS VARCHAR) AS caption,
         'figcaption' AS source
  FROM d WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, auth || '/a/g' || CAST(doc_id AS VARCHAR) || '.jpg',
         'galt ' || CAST(doc_id % 7 AS VARCHAR), 'alt'
  FROM d WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id, auth || '/b' || CAST(doc_id AS VARCHAR) || '.png',
         'bare ' || CAST(doc_id % 5 AS VARCHAR), 'alt'
  FROM d
  UNION ALL
  SELECT doc_id, 'http://cdn.test/logo.png', 'logo', 'alt' FROM d
  UNION ALL
  SELECT doc_id, 'http://c.test/o' || CAST(doc_id AS VARCHAR) || '.jpg',
         't' || CAST(doc_id % 11 AS VARCHAR), 'og'
  FROM d WHERE doc_id % 4 = 0
),
gated AS (
  SELECT * FROM inline WHERE doc_id % 9 <> 4
     OR image_url NOT LIKE 'http://h4.test/%'
),
ranked AS (
  SELECT image_url, caption, source, doc_id,
         CAST(COUNT(*) OVER (PARTITION BY image_url) AS BIGINT) AS n_refs,
         ROW_NUMBER() OVER (PARTITION BY image_url
                            ORDER BY doc_id, source, caption) AS r
  FROM gated
)
SELECT image_url, caption, source, CAST(doc_id AS BIGINT) AS from_doc,
       n_refs
FROM ranked WHERE r = 1
"""


# --------------------------------------------------------------------------
# bandwidth_throttle — byte-cost pacing per host
# --------------------------------------------------------------------------

_BW_RATE = 1_000_000  # 1 MB/s polite per-host allowance


def q_bandwidth_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bandwidth_throttle_schedule over a 13-host wave with response
    sizes 2 kB..2 MB at a 1 MB/s per-host allowance (min gap 100 ms):
    big objects earn long pauses, small ones only the floor.  Lag +
    running-sum windows replayed in SQL."""
    from .politeness import bandwidth_throttle_schedule

    doc = F.col("doc_id")
    wave = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("h"), (doc % 13).cast("string")).alias("host"),
        doc.cast("long").alias("seq"),
        (F.lit(2000) + (doc * 4099) % 2_000_000).cast("long")
        .alias("est_bytes"),
    )
    out = bandwidth_throttle_schedule(
        wave, rate_bytes_per_s=_BW_RATE, min_gap_ms=100
    )
    return out.select("doc_id", "host", "seq", "est_bytes", "gap_ms",
                      "fetch_start_ms", "fetch_end_ms")


ORACLE_BANDWIDTH = f"""
WITH wave AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 13 AS VARCHAR) AS host,
         CAST(doc_id AS BIGINT) AS seq,
         CAST(2000 + (doc_id * 4099) % 2000000 AS BIGINT) AS est_bytes
  FROM documents
),
g AS (
  SELECT *,
         LAG(est_bytes) OVER w AS prev_b,
         est_bytes * 1000 // {_BW_RATE} AS xfer
  FROM wave
  WINDOW w AS (PARTITION BY host ORDER BY seq)
),
gg AS (
  SELECT *,
         CASE WHEN prev_b IS NULL THEN 0
              ELSE GREATEST(100, prev_b * 1000 // {_BW_RATE}) END AS gap_ms
  FROM g
),
c AS (
  SELECT *,
         CAST(SUM(gap_ms + xfer) OVER
           (PARTITION BY host ORDER BY seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS fetch_end_ms
  FROM gg
)
SELECT doc_id, host, seq, est_bytes, CAST(gap_ms AS BIGINT) AS gap_ms,
       CAST(fetch_end_ms - xfer AS BIGINT) AS fetch_start_ms, fetch_end_ms
FROM c
"""


# --------------------------------------------------------------------------
# scheme_dedup — prefer the https edition of dual-scheme URLs
# --------------------------------------------------------------------------

def q_scheme_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prefer_https_dedup over a corpus where every 4th URL was crawled
    under BOTH schemes (the https edition must win and fold the count)
    and the rest under exactly one (doc%2 picks which)."""
    from .canon import prefer_https_dedup

    doc = F.col("doc_id")
    path = F.concat(F.lit("site"), (doc % 31).cast("string"),
                    F.lit(".test/p/"), doc.cast("string"))
    single = F.when(doc % 2 == 0, F.concat(F.lit("http://"), path)
                    ).otherwise(F.concat(F.lit("https://"), path))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), path.alias("path"),
                                    single.alias("single_url"))
    dual = d.filter(doc % 4 == 0).select(
        F.explode(F.array(
            F.concat(F.lit("http://"), F.col("path")),
            F.concat(F.lit("https://"), F.col("path")),
        )).alias("url")
    )
    rest = d.filter(doc % 4 != 0).select(F.col("single_url").alias("url"))
    return prefer_https_dedup(dual.unionByName(rest))


ORACLE_SCHEME_DEDUP = """
WITH d AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 31 AS VARCHAR) || '.test/p/' ||
           CAST(doc_id AS VARCHAR) AS path
  FROM documents
)
SELECT '//' || path AS schemeless_key,
       'https://' || path AS url,
       CAST(2 AS BIGINT) AS n_variants
FROM d WHERE doc_id % 4 = 0
UNION ALL
SELECT '//' || path,
       CASE WHEN doc_id % 2 = 0 THEN 'http://' || path
            ELSE 'https://' || path END,
       CAST(1 AS BIGINT)
FROM d WHERE doc_id % 4 <> 0
"""
