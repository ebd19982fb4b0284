"""Round-2 continuation queries, part 7: feed autodiscovery + parsing,
AMP/canonical folding, and content-addressed storage accounting.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying (or arithmetically stating) the identical result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import amp_canonical_fold, discover_feeds, feed_items
from .sinks import content_store_stats


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# feed_discovery — RSS/Atom autodiscovery links
# --------------------------------------------------------------------------

def q_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed autodiscovery over a 3-shape corpus: an RSS link (doc%3==0),
    BOTH an Atom and an RSS link (doc%3==1 — order preserved), none
    (doc%3==2 contributes no rows)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    rss = F.concat(
        F.lit('<link rel="alternate" type="application/rss+xml" '
              'href="http://f.test/r'), s, F.lit('.xml">'))
    atom = F.concat(
        F.lit('<link rel="alternate" type="application/atom+xml" '
              'href="http://f.test/a'), s, F.lit('.xml">'))
    head = (
        F.when(doc % 3 == 0, rss)
        .when(doc % 3 == 1, F.concat(atom, rss))
        .otherwise(F.lit('<link rel="stylesheet" href="/s.css">'))
    )
    body = F.concat(F.lit("<html><head>"), head,
                    F.lit("</head><body></body></html>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", F.explode(discover_feeds(F.col("body"))).alias("f")
    ).select(
        "doc_id",
        F.col("f.feed_url").alias("feed_url"),
        F.col("f.kind").alias("kind"),
    )


ORACLE_FEED_DISCOVERY = """
SELECT doc_id,
       'http://f.test/r' || CAST(doc_id AS VARCHAR) || '.xml' AS feed_url,
       'rss' AS kind
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'http://f.test/a' || CAST(doc_id AS VARCHAR) || '.xml',
       'atom'
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT doc_id, 'http://f.test/r' || CAST(doc_id AS VARCHAR) || '.xml',
       'rss'
FROM documents WHERE doc_id % 3 = 1
"""


# --------------------------------------------------------------------------
# feed_items — RSS <item> / Atom <entry> extraction
# --------------------------------------------------------------------------

def q_feed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed parsing: even docs are RSS feeds with two items
    (element-text links), odd docs Atom feeds with one entry
    (href-attribute link) — per-item block alignment is the point."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    rss_body = F.concat(
        F.lit("<rss><channel><item><link>http://n.test/p"), s,
        F.lit("a</link><title>ta "), (doc % 13).cast("string"),
        F.lit("</title><pubDate>D"), (doc % 28).cast("string"),
        F.lit("</pubDate></item><item><link>http://n.test/p"), s,
        F.lit("b</link><title>tb "), (doc % 7).cast("string"),
        F.lit("</title><pubDate>D"), (doc % 28).cast("string"),
        F.lit("</pubDate></item></channel></rss>"),
    )
    atom_body = F.concat(
        F.lit('<feed><entry><link href="http://n.test/e'), s,
        F.lit('"/><title>te '), (doc % 11).cast("string"),
        F.lit("</title><updated>U"), (doc % 30).cast("string"),
        F.lit("</updated></entry></feed>"),
    )
    body = F.when(doc % 2 == 0, rss_body).otherwise(atom_body)
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", F.explode(feed_items(F.col("body"))).alias("i")
    ).select(
        "doc_id",
        F.col("i.url").alias("url"),
        F.col("i.title").alias("title"),
        F.col("i.published").alias("published"),
    )


ORACLE_FEED_ITEMS = """
SELECT doc_id,
       'http://n.test/p' || CAST(doc_id AS VARCHAR) || 'a' AS url,
       'ta ' || CAST(doc_id % 13 AS VARCHAR) AS title,
       'D' || CAST(doc_id % 28 AS VARCHAR) AS published
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 'http://n.test/p' || CAST(doc_id AS VARCHAR) || 'b',
       'tb ' || CAST(doc_id % 7 AS VARCHAR),
       'D' || CAST(doc_id % 28 AS VARCHAR)
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 'http://n.test/e' || CAST(doc_id AS VARCHAR),
       'te ' || CAST(doc_id % 11 AS VARCHAR),
       'U' || CAST(doc_id % 30 AS VARCHAR)
FROM documents WHERE doc_id % 2 = 1
"""


# --------------------------------------------------------------------------
# amp_fold — AMP/alternate editions fold onto their canonical URL
# --------------------------------------------------------------------------

def q_amp_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMP folding: every 3rd page is an /amp/ edition carrying a
    rel=canonical back-link (folds, is_alternate), every 3rd declares a
    self-canonical (no-op), the rest have no canonical tag (no-op)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    canon_url = F.concat(F.lit("http://w.test/p"), s)
    url = F.when(doc % 3 == 0,
                 F.concat(F.lit("http://w.test/amp/p"), s)
                 ).otherwise(canon_url)
    body = (
        F.when(doc % 3 == 0, F.concat(
            F.lit('<link rel="canonical" href="'), canon_url, F.lit('">')))
        .when(doc % 3 == 1, F.concat(
            F.lit('<link rel="canonical" href="'), canon_url, F.lit('">')))
        .otherwise(F.lit("<html></html>"))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), url.alias("url"), body.alias("body")
    )
    out = amp_canonical_fold(pages)
    return pages.select("doc_id").join(
        out.withColumn(
            "doc_id",
            F.regexp_extract(F.col("url"), r"p(\d+)$", 1).cast("long"),
        ),
        "doc_id",
    ).select("doc_id", "url", "fold_url", "is_alternate")


ORACLE_AMP_FOLD = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN 'http://w.test/amp/p' || CAST(doc_id AS VARCHAR)
            ELSE 'http://w.test/p' || CAST(doc_id AS VARCHAR) END AS url,
       'http://w.test/p' || CAST(doc_id AS VARCHAR) AS fold_url,
       doc_id % 3 = 0 AS is_alternate
FROM documents
"""


# --------------------------------------------------------------------------
# content_store — content-addressed storage accounting
# --------------------------------------------------------------------------

def q_content_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """content_store_stats over a corpus where content duplicates by
    doc_id%40 (mirror pages): per stored object the ref count and the
    bytes saved vs storing every fetch."""
    doc = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("h:"), (doc % 40).cast("string"))
        .alias("content_hash"),
        (F.lit(1000) + (doc % 40) * 13).cast("long").alias("n_bytes"),
    )
    return content_store_stats(pages)


ORACLE_CONTENT_STORE = """
WITH p AS (
  SELECT 'h:' || CAST(doc_id % 40 AS VARCHAR) AS content_hash,
         1000 + (doc_id % 40) * 13 AS n_bytes
  FROM documents
)
SELECT content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_refs,
       CAST(MIN(n_bytes) AS BIGINT) AS bytes_stored,
       CAST(SUM(n_bytes) - MIN(n_bytes) AS BIGINT) AS bytes_saved
FROM p GROUP BY content_hash
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "feed_discovery": q_feed_discovery,
        "feed_items": q_feed_items,
        "amp_fold": q_amp_fold,
        "content_store": q_content_store,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "feed_discovery": ORACLE_FEED_DISCOVERY,
        "feed_items": ORACLE_FEED_ITEMS,
        "amp_fold": ORACLE_AMP_FOLD,
        "content_store": ORACLE_CONTENT_STORE,
    }
