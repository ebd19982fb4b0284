"""Round-3 queries, part 50: JSON Feed ingestion, Twitter Card audit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# json_feed — jsonfeed.org discovery summary
# --------------------------------------------------------------------------

def q_json_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.json_feed_summary over a valid v1.1 feed, a v1 feed with
    no items, a wrong-version JSON blob, and non-JSON."""
    from .extract import json_feed_summary

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 4
    body = (
        F.when(m == 0, F.concat(
            F.lit('{"version":"https://jsonfeed.org/version/1.1",'
                  '"title":"Blog '), ds,
            F.lit('","items":[{"url":"https://b.test/p'), ds,
            F.lit('"},{"url":"https://b.test/q"}]}')))
        .when(m == 1, F.lit(
            '{"version":"https://jsonfeed.org/version/1",'
            '"title":"Empty","items":[]}'))
        .when(m == 2, F.lit('{"version":"2.0","title":"rss-ish"}'))
        .otherwise(F.lit("<html>not json</html>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    out = d.select("doc_id", json_feed_summary(F.col("body")).alias("f"))
    return out.select(
        "doc_id", "f.version_ok", "f.feed_title", "f.n_items",
        "f.first_item_url",
    ).orderBy("doc_id")


ORACLE_JSON_FEED = """
SELECT doc_id,
       doc_id % 4 IN (0, 1) AS version_ok,
       CASE doc_id % 4
         WHEN 0 THEN 'Blog ' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'Empty'
         WHEN 2 THEN 'rss-ish' END AS feed_title,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 ELSE 0 END AS INTEGER)
         AS n_items,
       CASE WHEN doc_id % 4 = 0
         THEN 'https://b.test/p' || CAST(doc_id AS VARCHAR) END
         AS first_item_url
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# twitter_cards — social preview completeness
# --------------------------------------------------------------------------

def q_twitter_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.twitter_card_summary: complete summary_large_image card,
    name= vs property= spellings, missing image, and none at all."""
    from .extract import twitter_card_summary

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit(
            '<meta name="twitter:card" content="summary_large_image">'
            '<meta name="twitter:title" content="T">'
            '<meta name="twitter:description" content="D">'
            '<meta name="twitter:image" content="https://i.test/x.png">'))
        .when(m == 1, F.lit(
            '<meta property="twitter:card" content="summary">'
            '<meta property="twitter:title" content="T2">'
            '<meta property="twitter:description" content="D2">'))
        .when(m == 2, F.lit(
            '<meta name="twitter:title" content="only title">'))
        .otherwise(F.lit("<p>nothing</p>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    out = d.select("doc_id",
                   twitter_card_summary(F.col("body")).alias("c"))
    return out.select(
        "doc_id", "c.card_type", "c.has_title", "c.has_description",
        "c.has_image", "c.complete",
    ).orderBy("doc_id")


ORACLE_TWITTER_CARDS = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'summary_large_image'
            WHEN 1 THEN 'summary' END AS card_type,
       doc_id % 4 IN (0, 1, 2) AS has_title,
       doc_id % 4 IN (0, 1) AS has_description,
       doc_id % 4 = 0 AS has_image,
       doc_id % 4 = 0 AS complete
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "json_feed": q_json_feed,
        "twitter_cards": q_twitter_cards,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "json_feed": ORACLE_JSON_FEED,
        "twitter_cards": ORACLE_TWITTER_CARDS,
    }
