"""Round-3 queries, part 56: security.txt parse, OPML reading-list
feed discovery.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# security_txt — RFC 9116 well-known parse
# --------------------------------------------------------------------------

def q_security_txt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.parse_security_txt: valid file with two contacts, an
    EXPIRED file, one missing the required Expires, and empty."""
    from .robots import parse_security_txt

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit(
            "Contact: mailto:sec@a.test\n"
            "Contact: https://a.test/report\n"
            "Expires: 2027-01-01T00:00:00Z\n"
            "Policy: https://a.test/policy\n"))
        .when(m == 1, F.lit(
            "Contact: mailto:old@b.test\n"
            "Expires: 2024-06-01T00:00:00Z\n"
            "Canonical: https://b.test/.well-known/security.txt\n"))
        .when(m == 2, F.lit("Contact: mailto:x@c.test\n"))
        .otherwise(F.lit(""))
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), doc.cast("string")).alias("host"),
        body.alias("body"),
    )
    return parse_security_txt(d).orderBy("host")


ORACLE_SECURITY_TXT = """
SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 3 THEN 0 ELSE 1 END
            AS INTEGER) AS n_contacts,
       CASE doc_id % 4 WHEN 0 THEN 'mailto:sec@a.test'
            WHEN 1 THEN 'mailto:old@b.test'
            WHEN 2 THEN 'mailto:x@c.test' END AS first_contact,
       CASE doc_id % 4 WHEN 0 THEN '2027-01-01T00:00:00Z'
            WHEN 1 THEN '2024-06-01T00:00:00Z' END AS expires,
       doc_id % 4 = 1 AS expired,
       doc_id % 4 = 0 AS has_policy,
       doc_id % 4 = 1 AS has_canonical
FROM documents
ORDER BY host
"""


# --------------------------------------------------------------------------
# opml_feeds — subscription-list discovery seeds
# --------------------------------------------------------------------------

def q_opml_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.opml_feed_urls over a two-outline OPML (one title=, one
    text= fallback; a folder outline without xmlUrl is skipped)."""
    from .extract import opml_feed_urls

    doc = F.col("doc_id")
    ds = doc.cast("string")
    xml = F.concat(
        F.lit('<opml><body><outline text="Tech"/>'
              '<outline title="Blog '), ds,
        F.lit('" xmlUrl="https://b.test/'), ds,
        F.lit('/feed.xml" htmlUrl="https://b.test/'), ds,
        F.lit('"/><outline text="Pods" xmlUrl="https://p.test/rss"/>'
              '</body></opml>'),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), xml.alias("x"))
    out = d.select(
        "doc_id",
        F.posexplode(opml_feed_urls(F.col("x"))).alias("ord", "o"),
    )
    return out.select(
        "doc_id", F.col("ord").cast("long").alias("ord"),
        "o.title", "o.xml_url", "o.html_url",
    ).orderBy("doc_id", "ord")


ORACLE_OPML_FEEDS = """
WITH e(ord) AS (VALUES (0), (1))
SELECT d.doc_id, CAST(e.ord AS BIGINT) AS ord,
       CASE e.ord WHEN 0 THEN 'Blog ' || CAST(d.doc_id AS VARCHAR)
            ELSE 'Pods' END AS title,
       CASE e.ord WHEN 0 THEN 'https://b.test/' ||
              CAST(d.doc_id AS VARCHAR) || '/feed.xml'
            ELSE 'https://p.test/rss' END AS xml_url,
       CASE e.ord WHEN 0 THEN 'https://b.test/' ||
              CAST(d.doc_id AS VARCHAR) END AS html_url
FROM documents d CROSS JOIN e
ORDER BY d.doc_id, ord
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "security_txt": q_security_txt,
        "opml_feeds": q_opml_feeds,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "security_txt": ORACLE_SECURITY_TXT,
        "opml_feeds": ORACLE_OPML_FEEDS,
    }
