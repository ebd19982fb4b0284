"""Round-3 queries, part 5: image-specific robots policy, Vary-aware
cache identity, EXIF-GPS privacy scrub planning.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the construction, no nullable booleans in gate output
(string statuses instead), integer-exact columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# image_robots — noimageindex / max-image-preview gating
# --------------------------------------------------------------------------

def q_image_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.image_indexing_policy over a 6-case meta/header matrix:
    plain noimageindex, preview:none, combined list, bot-specific tag
    OVERRIDING a generic preview (most-specific-wins leaves preview
    unset), header-additive preview, and no directives at all."""
    from .robots import image_indexing_policy

    doc = F.col("doc_id")
    r = doc % 6

    def meta(name: str, content: str) -> str:
        return f'<meta name="{name}" content="{content}">'

    body = (
        F.when(r == 0, meta("robots", "noimageindex"))
        .when(r == 1, meta("robots", "max-image-preview:none"))
        .when(r == 2, meta("robots", "noimageindex, max-image-preview:standard"))
        .when(r == 3, meta("crawlspark", "noimageindex")
              + meta("robots", "max-image-preview:large"))
        .otherwise(F.lit("<html></html>"))
    )
    header = F.when(r == 4, F.lit("max-image-preview:large"))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), header.alias("xrt")
    )
    pol = image_indexing_policy(F.col("body"), F.col("xrt"))
    return d.select(
        "doc_id",
        pol["noimageindex"].alias("noimageindex"),
        pol["max_image_preview"].alias("max_image_preview"),
    )


ORACLE_IMAGE_ROBOTS = """
SELECT doc_id,
       doc_id % 6 IN (0, 2, 3) AS noimageindex,
       CASE doc_id % 6 WHEN 1 THEN 'none' WHEN 2 THEN 'standard'
            WHEN 4 THEN 'large' ELSE 'unset' END AS max_image_preview
FROM documents
"""


# --------------------------------------------------------------------------
# vary_cache_key — RFC 9111 secondary cache keys
# --------------------------------------------------------------------------

def q_vary_cache_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.vary_cache_identity over a 5-case Vary matrix: single
    header, messy two-header list (case/space/dup folding), ``*``
    (uncacheable, null key), empty, and absent; request headers send
    accept-language en/de by doc parity."""
    from .sinks import vary_cache_identity

    doc = F.col("doc_id")
    r = doc % 5
    vary = (
        F.when(r == 0, "Accept-Language")
        .when(r == 1, " Accept-Encoding , accept-language, Accept-Encoding ")
        .when(r == 2, "*")
        .when(r == 3, "")
    )
    lang = F.when(doc % 2 == 0, "en").otherwise("de")
    headers = F.create_map(
        F.lit("accept-language"), lang,
        F.lit("accept-encoding"), F.lit("gzip"),
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("http://v.test/u"), doc.cast("string")).alias("url"),
        vary.alias("vary"),
        headers.alias("req_headers"),
    )
    out = vary_cache_identity(d)
    return out.select(
        "doc_id", "vary_key",
        F.when(F.col("uncacheable"), "uncacheable").otherwise("cacheable")
        .alias("cache_class"),
    )


ORACLE_VARY_CACHE_KEY = """
SELECT doc_id,
       CASE doc_id % 5
         WHEN 0 THEN 'accept-language=' ||
           CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END
         WHEN 1 THEN 'accept-encoding=gzip&accept-language=' ||
           CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END
         WHEN 2 THEN NULL
         ELSE '' END AS vary_key,
       CASE WHEN doc_id % 5 = 2 THEN 'uncacheable'
            ELSE 'cacheable' END AS cache_class
FROM documents
"""


# --------------------------------------------------------------------------
# exif_gps_scrub — image privacy plan
# --------------------------------------------------------------------------

def q_exif_gps_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.exif_gps_scrub_plan over a typed EXIF map: lat+lon on
    doc%3==0 (plus altitude on doc%6==0), a camera-make key on every
    row (must NOT count), and a null metadata map on doc%7==0
    (precedence: null map -> no keys at all)."""
    from .mmcurate import exif_gps_scrub_plan

    doc = F.col("doc_id")
    full = F.map_filter(
        F.create_map(
            F.lit("Make"), F.lit("X"),
            F.lit("GPSLatitude"), F.when(doc % 3 == 0, F.lit("48.1")),
            F.lit("GPSLongitude"), F.when(doc % 3 == 0, F.lit("11.5")),
            F.lit("GPSAltitude"), F.when(doc % 6 == 0, F.lit("519")),
        ),
        lambda k, v: v.isNotNull(),
    )
    exif = F.when(doc % 7 != 0, full)
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        exif.alias("exif"),
    )
    return exif_gps_scrub_plan(imgs)


ORACLE_EXIF_GPS_SCRUB = """
WITH i AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         CASE WHEN doc_id % 7 = 0 THEN 0
              WHEN doc_id % 6 = 0 THEN 3
              WHEN doc_id % 3 = 0 THEN 2
              ELSE 0 END AS n
  FROM documents
)
SELECT image_id, CAST(n AS BIGINT) AS n_gps_keys, n > 0 AS has_gps,
       CASE WHEN n > 0 THEN 'strip_gps' ELSE 'none' END AS action
FROM i
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "image_robots": q_image_robots,
        "vary_cache_key": q_vary_cache_key,
        "exif_gps_scrub": q_exif_gps_scrub,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "image_robots": ORACLE_IMAGE_ROBOTS,
        "vary_cache_key": ORACLE_VARY_CACHE_KEY,
        "exif_gps_scrub": ORACLE_EXIF_GPS_SCRUB,
    }
