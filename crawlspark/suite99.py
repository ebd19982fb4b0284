"""Round-3 queries, part 49: tracker-id operator clustering, CMS
fingerprint rollup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# tracker_clusters — shared analytics ids across hosts
# --------------------------------------------------------------------------

def q_tracker_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.tracker_ids over pages where doc%7 picks the tracker:
    every 10-doc block shares one GA id (clusters of hosts under one
    operator), and the rollup groups by id counting distinct hosts."""
    from .extract import tracker_ids

    doc = F.col("doc_id")
    m = doc % 3
    ga = F.concat(F.lit("UA-1000"), (doc / 10).cast("long").cast("string"),
                  F.lit("-1"))
    body = (
        F.when(m == 0, F.concat(
            F.lit("<script>ga('create','"), ga, F.lit("');</script>")))
        .when(m == 1, F.concat(
            F.lit('<script async src="https://www.googletagmanager.com/'
                  'gtag/js?id=G-ABC'), (doc % 10).cast("string"),
            F.lit('DEF0"></script>')))
        .otherwise(F.lit("<p>no trackers</p>"))
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), doc.cast("string")).alias("host"),
        body.alias("body"),
    )
    ids = d.select(
        "host", F.explode(tracker_ids(F.col("body"))).alias("t")
    ).select("host", F.col("t.kind").alias("kind"),
             F.col("t.id").alias("tid"))
    return (
        ids.groupBy("kind", "tid")
        .agg(F.countDistinct("host").cast("long").alias("n_hosts"))
        .orderBy("kind", "tid")
    )


ORACLE_TRACKER_CLUSTERS = """
WITH ids AS (
  SELECT CASE WHEN doc_id % 3 = 0
           THEN 'ga' ELSE 'ga4' END AS kind,
         CASE WHEN doc_id % 3 = 0
           THEN 'UA-1000' || CAST(doc_id // 10 AS VARCHAR) || '-1'
           ELSE 'G-ABC' || CAST(doc_id % 10 AS VARCHAR) || 'DEF0'
         END AS tid,
         'h' || CAST(doc_id AS VARCHAR) AS host
  FROM documents
  WHERE doc_id % 3 <> 2
)
SELECT kind, tid, CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM ids GROUP BY kind, tid
ORDER BY kind, tid
"""


# --------------------------------------------------------------------------
# cms_mix — platform fingerprint rollup
# --------------------------------------------------------------------------

def q_cms_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.cms_fingerprint over generator tags, stripped-generator
    asset paths, a priority collision (wp-content AND shopify cdn ->
    wordpress wins the fixed order), and unknown."""
    from .extract import cms_fingerprint

    doc = F.col("doc_id")
    m = doc % 5
    body = (
        F.when(m == 0, F.lit(
            '<meta name="generator" content="WordPress 6.4">'))
        .when(m == 1, F.lit('<img src="/wp-content/uploads/a.png">'))
        .when(m == 2, F.lit(
            '<script src="https://cdn.shopify.com/s/x.js"></script>'))
        .when(m == 3, F.lit(
            '<img src="/wp-content/x.png">'
            '<script src="https://cdn.shopify.com/y.js"></script>'))
        .otherwise(F.lit("<p>hand-rolled html</p>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    out = d.select("doc_id", cms_fingerprint(F.col("body")).alias("cms"))
    return out.groupBy("cms").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    ).orderBy("cms")


ORACLE_CMS_MIX = """
SELECT CASE WHEN doc_id % 5 IN (0, 1, 3) THEN 'wordpress'
            WHEN doc_id % 5 = 2 THEN 'shopify'
            ELSE 'unknown' END AS cms,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM documents GROUP BY 1 ORDER BY cms
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tracker_clusters": q_tracker_clusters,
        "cms_mix": q_cms_mix,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tracker_clusters": ORACLE_TRACKER_CLUSTERS,
        "cms_mix": ORACLE_CMS_MIX,
    }
