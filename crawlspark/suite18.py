"""Round-2 continuation queries, part 16: site-icon selection and
host change rates feeding the recrawl prior.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import site_icons
from .politeness import host_change_rates


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# site_icon_pick — favicon / apple-touch-icon selection
# --------------------------------------------------------------------------

def q_site_icon_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """site_icons at target 180px over 4 shapes: smallest fitting icon
    (192 beats 512), largest when none fit, an unsized icon as last
    link resort, and the /favicon.ico default when the page declares
    nothing."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    page = F.concat(F.lit("http://h"), (doc % 6).cast("string"),
                    F.lit(".test/p/"), s)
    head = (
        F.when(doc % 4 == 0, F.concat(
            F.lit('<link rel="icon" sizes="32x32" href="/i32-'), s,
            F.lit('.png"><link rel="apple-touch-icon" sizes="192x192" '
                  'href="/i192-'), s,
            F.lit('.png"><link rel="icon" sizes="512x512" href="/i512-'),
            s, F.lit('.png">')))
        .when(doc % 4 == 1, F.concat(
            F.lit('<link rel="icon" sizes="32x32" href="/a-'), s,
            F.lit('.png"><link rel="icon" sizes="64x64" href="/b-'), s,
            F.lit('.png">')))
        .when(doc % 4 == 2, F.concat(
            F.lit('<link rel="icon" href="/plain-'), s, F.lit('.svg">')))
        .otherwise(F.lit('<link rel="stylesheet" href="/s.css">'))
    )
    body = F.concat(F.lit("<html><head>"), head,
                    F.lit("</head><body></body></html>"))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), page.alias("page_url")
    )
    icon = site_icons(F.col("body"), F.col("page_url"), target_px=180)
    return d.select(
        "doc_id",
        icon["icon_url"].alias("icon_url"),
        icon["declared_px"].alias("declared_px"),
        icon["source"].alias("source"),
    )


ORACLE_SITE_ICON = """
WITH d AS (
  SELECT doc_id,
         'http://h' || CAST(doc_id % 6 AS VARCHAR) || '.test' AS auth,
         CAST(doc_id % 4 AS INTEGER) AS v
  FROM documents
)
SELECT doc_id,
       CASE v
         WHEN 0 THEN auth || '/i192-' || CAST(doc_id AS VARCHAR) || '.png'
         WHEN 1 THEN auth || '/b-' || CAST(doc_id AS VARCHAR) || '.png'
         WHEN 2 THEN auth || '/plain-' || CAST(doc_id AS VARCHAR) || '.svg'
         ELSE auth || '/favicon.ico'
       END AS icon_url,
       CASE v WHEN 0 THEN 192 WHEN 1 THEN 64 END AS declared_px,
       CASE WHEN v = 3 THEN 'default' ELSE 'link' END AS source
FROM d
"""


# --------------------------------------------------------------------------
# change_rates — per-host modified share -> recrawl interval prior
# --------------------------------------------------------------------------

def q_change_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """host_change_rates over a crawl-diff feed whose modified share
    varies by host tier (hot news hosts ~50%, weekly hosts ~20%,
    mostly-static ~5% and ~1%): each tier lands on its interval."""
    doc = F.col("doc_id")
    h = doc % 9
    modified = (
        F.when(h <= 2, doc % 2 == 0)
        .when(h <= 5, doc % 5 == 0)
        .when(h == 6, doc % 20 == 0)
        .otherwise(doc % 100 == 0)
    )
    diffs = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), h.cast("string")).alias("host"),
        F.when(modified, F.lit("modified")).otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    return host_change_rates(diffs)


ORACLE_CHANGE_RATES = """
WITH d AS (
  SELECT 'h' || CAST(doc_id % 9 AS VARCHAR) AS host,
         CASE WHEN doc_id % 9 <= 2 THEN doc_id % 2 = 0
              WHEN doc_id % 9 <= 5 THEN doc_id % 5 = 0
              WHEN doc_id % 9 = 6 THEN doc_id % 20 = 0
              ELSE doc_id % 100 = 0 END AS modified
  FROM documents
),
agg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(CASE WHEN modified THEN 1 ELSE 0 END) AS BIGINT)
           AS n_modified
  FROM d GROUP BY host
)
SELECT host, n_pages, n_modified,
       CAST((1000 * n_modified) // n_pages AS BIGINT) AS modified_permille,
       CAST(CASE WHEN (1000 * n_modified) // n_pages >= 500 THEN 21600
                 WHEN (1000 * n_modified) // n_pages >= 200 THEN 86400
                 WHEN (1000 * n_modified) // n_pages >= 50 THEN 604800
                 ELSE 2592000 END AS BIGINT) AS suggested_interval_s
FROM agg
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "site_icon_pick": q_site_icon_pick,
        "change_rates": q_change_rates,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "site_icon_pick": ORACLE_SITE_ICON,
        "change_rates": ORACLE_CHANGE_RATES,
    }
