"""Round-3 queries, part 20: token-bucket admission replay (stateful,
rows-only gate entry), heading outline audit, RFC 3986 percent
normalization, cross-host sitemap audit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# token_bucket (rows-only: clamped sequential state is not
# SQL-expressible; correctness is the pure-Python differential pytest)
# --------------------------------------------------------------------------

def q_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.token_bucket_admission over a 10-host burst pattern
    (capacity 5, 1 token/s): deterministic row count = input rows;
    admission values are covered by the differential test, not a SQL
    oracle (min-clamp recurrences have no window form)."""
    from .politeness import token_bucket_admission

    doc = F.col("doc_id")
    reqs = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 10).cast("string")).alias("host"),
        (doc * 200).cast("long").alias("ts_ms"),
    )
    return token_bucket_admission(reqs).orderBy("host", "ts_ms")


# --------------------------------------------------------------------------
# heading_outline
# --------------------------------------------------------------------------

def q_heading_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.heading_outline over four page shapes: clean h1-h2-h3,
    a level-skipping h1-h3, a double-h1 page, and a headingless
    page."""
    from .extract import heading_outline

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit("<h1>t</h1><h2>a</h2><h3>b</h3><h2>c</h2>"))
        .when(m == 1, F.lit("<h1>t</h1><h3 class='x'>skip</h3>"))
        .when(m == 2, F.lit("<H1>a</H1><p>x</p><h1>b</h1>"))
        .otherwise(F.lit("<p>no headings</p>"))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"))
    h = pages.select("doc_id",
                     heading_outline(F.col("body")).alias("h"))
    return h.select(
        "doc_id",
        F.array_join(F.transform("h.levels",
                                 lambda x: x.cast("string")), ",")
        .alias("levels"),
        F.col("h.n_h1").alias("n_h1"),
        F.col("h.max_skip").alias("max_skip"),
        F.col("h.well_formed").alias("well_formed"),
    ).orderBy("doc_id")


ORACLE_HEADING = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN '1,2,3,2' WHEN 1 THEN '1,3'
            WHEN 2 THEN '1,1' ELSE '' END AS levels,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
            ELSE 0 END AS INTEGER) AS n_h1,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END
            AS INTEGER) AS max_skip,
       doc_id % 4 = 0 AS well_formed
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# percent_normalize
# --------------------------------------------------------------------------

def q_percent_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.percent_normalize_expr over URLs mixing unreserved
    escapes (%7E %41 %2D), reserved ones (%2F %3a), and stray
    percents; the oracle replays the piece-wise decode with DuckDB
    list ops and chr()."""
    from .canon import percent_normalize_expr

    doc = F.col("doc_id")
    ds = doc.cast("string")
    url = F.concat(
        F.lit("http://h/p%7E"), ds, F.lit("%2Fq%3ar%41%2Ds%"),
        (doc % 10).cast("string"),
    )
    u = _docs(spark, sf_dir).select(url.alias("url"))
    return u.select(
        "url",
        percent_normalize_expr(F.col("url")).alias("normalized"),
    ).orderBy("url")


ORACLE_PERCENT = """
SELECT 'http://h/p%7E' || doc_id || '%2Fq%3ar%41%2Ds%'
       || (doc_id % 10) AS url,
       -- %7E -> ~, %41 -> A, %2D -> '-', %3a uppercases to %3A,
       -- %2F stays encoded, the trailing one-hex-digit '%N' is a
       -- stray percent and passes through literally
       'http://h/p~' || doc_id || '%2Fq%3ArA-s%' || (doc_id % 10)
         AS normalized
FROM documents
ORDER BY url
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "token_bucket": q_token_bucket,
        "heading_outline": q_heading_outline,
        "percent_normalize": q_percent_normalize,
        "sitemap_cross_host": q_sitemap_cross_host,
    }


# --------------------------------------------------------------------------
# sitemap_cross_host
# --------------------------------------------------------------------------

def q_sitemap_cross_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.sitemap_cross_host_audit: same-host, CDN-hosted, and
    subdomain-hosted sitemap declarations (subdomains ARE cross-host
    under the exact-match rule)."""
    from .robots import sitemap_cross_host_audit

    doc = F.col("doc_id")
    k = (doc % 25).cast("string")
    host = F.concat(F.lit("s"), k, F.lit(".com"))
    robots = _docs(spark, sf_dir).filter(doc < 25).select(
        host.alias("host"),
        F.array(
            F.concat(F.lit("https://s"), k, F.lit(".com/sitemap.xml")),
            F.concat(F.lit("https://cdn.example/maps/s"), k,
                     F.lit(".xml")),
            F.concat(F.lit("https://www.s"), k,
                     F.lit(".com/sitemap2.xml")),
        ).alias("sitemaps"),
    )
    return sitemap_cross_host_audit(robots).orderBy(
        "host", "sitemap_url")


ORACLE_CROSS_HOST = """
WITH r AS (
  SELECT doc_id % 25 AS k, 's' || (doc_id % 25) || '.com' AS host
  FROM documents WHERE doc_id < 25
),
x AS (
  SELECT host,
         'https://s' || k || '.com/sitemap.xml' AS sitemap_url,
         's' || k || '.com' AS sitemap_host, FALSE AS cross_host
  FROM r
  UNION ALL
  SELECT host, 'https://cdn.example/maps/s' || k || '.xml',
         'cdn.example', TRUE
  FROM r
  UNION ALL
  SELECT host, 'https://www.s' || k || '.com/sitemap2.xml',
         'www.s' || k || '.com', TRUE
  FROM r
)
SELECT host, sitemap_url, sitemap_host, cross_host
FROM x
ORDER BY host, sitemap_url
"""


def oracle_sql() -> dict[str, str]:
    return {
        # token_bucket intentionally omitted: rows-only check
        "heading_outline": ORACLE_HEADING,
        "percent_normalize": ORACLE_PERCENT,
        "sitemap_cross_host": ORACLE_CROSS_HOST,
    }
