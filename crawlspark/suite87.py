"""Round-3 queries, part 37: parquet encoding advisor, WET conversion
records, sitemap shard publishing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# encoding_advisor — cardinality/run signals -> parquet encoding choice
# --------------------------------------------------------------------------

_ADVISOR_COLS = ["cflag", "crun", "cuniq"]


def q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.encoding_advisor over a synthesized table with a UNIQUE
    order key (doc_id) — 50 partitions of 10 rows: a 2-value flag
    column (dictionary), the partition key itself (constant per
    window -> RLE), and a unique column (plain).  The previous lineitem
    fixture was retired: 11k duplicate (orderkey, linenumber) pairs
    made the window order tie-nondeterministic on BOTH engines."""
    from .capacity import encoding_advisor

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        (doc % 50).alias("part"),
        doc.alias("seq"),
        F.when((doc / 250).cast("long") % 2 == 0, "A").otherwise("B")
        .alias("cflag"),
        (doc % 50).cast("string").alias("crun"),
        doc.cast("string").alias("cuniq"),
    )
    return encoding_advisor(
        d, _ADVISOR_COLS, part_col="part", order_col="seq"
    ).orderBy("col_name")


def _advisor_oracle() -> str:
    pieces = []
    for c in _ADVISOR_COLS:
        pieces.append(f"""
  SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
         COUNT(DISTINCT {c}) AS n_distinct,
         SUM(CASE WHEN {c} = prev THEN 1 ELSE 0 END) AS n_rep
  FROM (SELECT {c},
               lag({c}) OVER (PARTITION BY part ORDER BY seq) AS prev
        FROM (SELECT doc_id % 50 AS part, doc_id AS seq,
                     CASE WHEN (doc_id // 250) % 2 = 0 THEN 'A'
                          ELSE 'B' END AS cflag,
                     CAST(doc_id % 50 AS VARCHAR) AS crun,
                     CAST(doc_id AS VARCHAR) AS cuniq
              FROM documents))
  GROUP BY 1
""")
    union = " UNION ALL ".join(pieces)
    return f"""
WITH s AS ({union})
SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST((1000 * n_distinct) // n_rows AS BIGINT) AS distinct_permille,
       CAST((1000 * n_rep) // n_rows AS BIGINT) AS run_permille,
       CASE WHEN (1000 * n_distinct) // n_rows < 100 THEN 'dictionary'
            WHEN (1000 * n_rep) // n_rows > 500 THEN 'rle'
            ELSE 'plain' END AS recommended
FROM s ORDER BY col_name
"""


# --------------------------------------------------------------------------
# wet_records — WARC conversion-record (WET) emit
# --------------------------------------------------------------------------

def q_wet_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """warc.to_wet over synthesized HTML responses — tag strip,
    whitespace collapse, digest, and the full WARC/1.0 conversion
    record; the oracle rebuilds every string including the CRLF header
    block."""
    from .warc import to_wet

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://w.test/p"), doc.cast("string")).alias("url"),
        F.concat(
            F.lit("<html><head><title>T"), doc.cast("string"),
            F.lit("</title></head><body><p>Hello   world "),
            doc.cast("string"), F.lit("</p></body></html>"),
        ).alias("body"),
    )
    return to_wet(d).orderBy("url")


ORACLE_WET = """
WITH w AS (
  SELECT 'https://w.test/p' || CAST(doc_id AS VARCHAR) AS url,
         'T' || CAST(doc_id AS VARCHAR) || ' Hello world ' ||
           CAST(doc_id AS VARCHAR) AS wet_text
  FROM documents
),
d AS (
  SELECT url, wet_text,
         CAST(length(wet_text) AS BIGINT) AS wet_len,
         CAST(('0x' || substr(md5(wet_text), 1, 8)) AS BIGINT) AS wet_digest
  FROM w
)
SELECT url, wet_text, wet_len, wet_digest,
       'WARC/1.0' || E'\\r\\n' || 'WARC-Type: conversion' || E'\\r\\n' ||
       'WARC-Record-ID: <urn:md5p:' ||
       CAST(CAST(('0x' || substr(md5('wet:' || url), 1, 8)) AS BIGINT)
            AS VARCHAR) || '>' || E'\\r\\n' ||
       'WARC-Target-URI: ' || url || E'\\r\\n' ||
       'WARC-Block-Digest: md5p:' || CAST(wet_digest AS VARCHAR) ||
       E'\\r\\n' || 'Content-Type: text/plain' || E'\\r\\n' ||
       'Content-Length: ' || CAST(wet_len AS VARCHAR) ||
       E'\\r\\n\\r\\n' || wet_text AS record
FROM d ORDER BY url
"""


# --------------------------------------------------------------------------
# sitemap_emit — shard-capped sitemap publishing
# --------------------------------------------------------------------------

def q_sitemap_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.sitemap_emit at cap=30 over 5 hosts x ~100 URLs with
    lastmod dates — ~4 shards per host, full XML compared
    byte-for-byte."""
    from .sinks import sitemap_emit

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 5).cast("string")).alias("host"),
        F.concat(F.lit("https://h"), (doc % 5).cast("string"),
                 F.lit(".test/p"), doc.cast("string")).alias("url"),
        F.concat(F.lit("2026-01-"), (10 + doc % 19).cast("string"))
        .alias("lastmod"),
    )
    return sitemap_emit(d, lastmod_col="lastmod", cap=30) \
        .orderBy("host", "shard")


ORACLE_SITEMAP_EMIT = """
WITH u AS (
  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
         'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/p' ||
           CAST(doc_id AS VARCHAR) AS url,
         '2026-01-' || CAST(10 + doc_id % 19 AS VARCHAR) AS lm
  FROM documents
),
r AS (
  SELECT host, url, lm,
         (row_number() OVER (PARTITION BY host ORDER BY url) - 1) // 30
           AS shard
  FROM u
)
SELECT host, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       MIN(url) AS first_url,
       '<?xml version="1.0" encoding="UTF-8"?>' ||
       '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
       string_agg('<url><loc>' || url || '</loc><lastmod>' || lm ||
                  '</lastmod></url>', '' ORDER BY url) ||
       '</urlset>' AS xml
FROM r GROUP BY host, shard ORDER BY host, shard
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "encoding_advisor": q_encoding_advisor,
        "wet_records": q_wet_records,
        "sitemap_emit": q_sitemap_emit,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "encoding_advisor": _advisor_oracle(),
        "wet_records": ORACLE_WET,
        "sitemap_emit": ORACLE_SITEMAP_EMIT,
    }
