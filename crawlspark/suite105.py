"""Round-3 queries, part 55: sitemap-level hreflang alternates, AI
opt-out meta directives.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# sitemap_hreflang — xhtml:link alternates inside <url> blocks
# --------------------------------------------------------------------------

def q_sitemap_hreflang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.sitemap_hreflang_links over a two-entry sitemap whose
    first entry declares en+de alternates and second has none."""
    from .extract import sitemap_hreflang_links

    doc = F.col("doc_id")
    ds = doc.cast("string")
    xml = F.concat(
        F.lit('<urlset><url><loc>https://s.test/en/p'), ds,
        F.lit('</loc>'
              '<xhtml:link rel="alternate" hreflang="en" '
              'href="https://s.test/en/p'), ds,
        F.lit('"/><xhtml:link rel="alternate" hreflang="de" '
              'href="https://s.test/de/p'), ds,
        F.lit('"/></url><url><loc>https://s.test/solo</loc></url>'
              '</urlset>'),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), xml.alias("xml"))
    out = d.select(
        "doc_id",
        F.posexplode(sitemap_hreflang_links(F.col("xml")))
        .alias("ord", "l"),
    )
    return out.select(
        "doc_id", F.col("ord").cast("long").alias("ord"),
        "l.loc", "l.hreflang", "l.href",
    ).orderBy("doc_id", "ord")


ORACLE_SITEMAP_HREFLANG = """
WITH e(ord, hreflang, pfx) AS (
  VALUES (0, 'en', 'https://s.test/en/p'),
         (1, 'de', 'https://s.test/de/p')
)
SELECT d.doc_id, CAST(e.ord AS BIGINT) AS ord,
       'https://s.test/en/p' || CAST(d.doc_id AS VARCHAR) AS loc,
       e.hreflang,
       e.pfx || CAST(d.doc_id AS VARCHAR) AS href
FROM documents d CROSS JOIN e
ORDER BY d.doc_id, ord
"""


# --------------------------------------------------------------------------
# noai_meta — page-level AI opt-out directives
# --------------------------------------------------------------------------

def q_noai_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.noai_meta_signals: meta noai, header noimageai, both
    channels, an 'noair' near-token that must NOT match, and clean."""
    from .extract import noai_meta_signals

    doc = F.col("doc_id")
    m = doc % 5
    html = (
        F.when(m == 0, F.lit(
            '<meta name="robots" content="index, noai">'))
        .when(m == 2, F.lit(
            '<meta name="robots" content="noai,noimageai">'))
        .when(m == 3, F.lit(
            '<meta name="robots" content="noair, index">'))
        .otherwise(F.lit("<p>page</p>"))
    )
    hdr = (
        F.when(m == 1, F.lit("noimageai"))
        .when(m == 2, F.lit("noai"))
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), html.alias("html"), hdr.alias("xr"))
    out = d.select(
        "doc_id",
        noai_meta_signals(F.col("html"), F.col("xr")).alias("s"),
    )
    return out.select(
        "doc_id", "s.noai", "s.noimageai", "s.channel"
    ).orderBy("doc_id")


ORACLE_NOAI_META = """
SELECT doc_id,
       doc_id % 5 IN (0, 2) AS noai,
       doc_id % 5 IN (1, 2) AS noimageai,
       CASE doc_id % 5 WHEN 0 THEN 'meta' WHEN 1 THEN 'header'
            WHEN 2 THEN 'both' END AS channel
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sitemap_hreflang": q_sitemap_hreflang,
        "noai_meta": q_noai_meta,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "sitemap_hreflang": ORACLE_SITEMAP_HREFLANG,
        "noai_meta": ORACLE_NOAI_META,
    }
