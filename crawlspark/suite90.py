"""Round-3 queries, part 40: WARC response-record emit with CDX-ready
offsets, DOM nesting-depth stats.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# warc_emit — framed response records + exact shard byte offsets
# --------------------------------------------------------------------------

def q_warc_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """warc.warc_emit at 4 shards over synthesized responses — the
    oracle replays the full record framing (nested Content-Lengths),
    md5-prefix shard placement, and the per-shard exclusive byte-offset
    window."""
    from .warc import warc_emit

    doc = F.col("doc_id")
    ds = doc.cast("string")
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://a.test/p"), ds).alias("url"),
        F.concat(F.lit("body-"), ds).alias("body"),
    )
    return warc_emit(d, n_shards=4).orderBy("shard", "url")


ORACLE_WARC_EMIT = """
WITH r0 AS (
  SELECT 'https://a.test/p' || CAST(doc_id AS VARCHAR) AS url,
         'body-' || CAST(doc_id AS VARCHAR) AS body
  FROM documents
),
r1 AS (
  SELECT url,
         'HTTP/1.1 200 ' || E'\\r\\n' || 'Content-Length: ' ||
         CAST(length(body) AS VARCHAR) || E'\\r\\n\\r\\n' || body AS http,
         CAST(('0x' || substr(md5(url), 1, 8)) AS BIGINT) % 4 AS shard
  FROM r0
),
r2 AS (
  SELECT shard, url,
         'WARC/1.0' || E'\\r\\n' || 'WARC-Type: response' || E'\\r\\n' ||
         'WARC-Record-ID: <urn:md5p:' ||
         CAST(CAST(('0x' || substr(md5('resp:' || url), 1, 8)) AS BIGINT)
              AS VARCHAR) || '>' || E'\\r\\n' ||
         'WARC-Target-URI: ' || url || E'\\r\\n' ||
         'Content-Type: application/http;msgtype=response' || E'\\r\\n' ||
         'Content-Length: ' || CAST(length(http) AS VARCHAR) ||
         E'\\r\\n\\r\\n' || http || E'\\r\\n\\r\\n' AS record
  FROM r1
)
SELECT shard, url,
       CAST(COALESCE(SUM(length(record)) OVER
         (PARTITION BY shard ORDER BY url
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS "offset",
       CAST(length(record) AS BIGINT) AS record_len,
       record
FROM r2 ORDER BY shard, url
"""


# --------------------------------------------------------------------------
# dom_depth — nesting-depth fold over the tag stream
# --------------------------------------------------------------------------

def q_dom_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.dom_depth_stats over nested / void-element / stray-closer
    / tagless fixtures."""
    from .extract import dom_depth_stats

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit("<div><p>x</p><p><b>y</b></p></div>"))
        .when(m == 1, F.lit('<div><br><img src="x"><div>deep</div></div>'))
        .when(m == 2, F.lit("</p>stray<div>"))
        .otherwise(F.lit("no tags"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    out = d.select("doc_id", dom_depth_stats(F.col("body")).alias("s"))
    return out.select(
        "doc_id", "s.n_tags", "s.max_depth", "s.unbalanced"
    ).orderBy("doc_id")


ORACLE_DOM_DEPTH = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 6 WHEN 2 THEN 2
            ELSE 0 END AS INTEGER) AS n_tags,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1
            ELSE 0 END AS INTEGER) AS max_depth,
       doc_id % 4 = 2 AS unbalanced
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "warc_emit": q_warc_emit,
        "dom_depth": q_dom_depth,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "warc_emit": ORACLE_WARC_EMIT,
        "dom_depth": ORACLE_DOM_DEPTH,
    }
