"""Round-3 queries, part 51: RateLimit header budget inference, RFC
8288 Link header parse.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# ratelimit — server-declared budget -> pacing suggestion
# --------------------------------------------------------------------------

def q_ratelimit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.ratelimit_headers_info: healthy budget (ceil spread),
    exhausted (wait the reset out), absent headers (null fields), and
    the epoch-dialect X-RateLimit-Reset variant converted to a delta
    against the fetch timestamp."""
    from .fetch import ratelimit_headers_info

    doc = F.col("doc_id")
    m = doc % 4
    lim = F.when(m != 2, F.lit(600)).cast("long")
    rem = (
        F.when(m == 0, F.lit(7)).when(m == 1, F.lit(0))
        .when(m == 3, F.lit(5)).cast("long")
    )
    # m==3: absolute epoch seconds (now + 45s window)
    rst = (
        F.when(m == 3, F.lit(1_756_000_045))
        .when(m != 2, F.lit(30)).cast("long")
    )
    now = F.lit(1_756_000_000).cast("long")
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), lim.alias("l"), rem.alias("r"),
        rst.alias("s"), now.alias("now"),
    )
    out = d.select(
        "doc_id",
        ratelimit_headers_info(
            F.col("l"), F.col("r"), F.col("s"), now=F.col("now"))
        .alias("rl"),
    )
    return out.select(
        "doc_id", "rl.limit", "rl.remaining", "rl.reset_s",
        "rl.exhausted", "rl.suggested_delay_ms",
    ).orderBy("doc_id")


ORACLE_RATELIMIT = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 4 <> 2 THEN 600 END AS BIGINT) AS "limit",
       CAST(CASE doc_id % 4 WHEN 0 THEN 7 WHEN 1 THEN 0 WHEN 3 THEN 5
         END AS BIGINT) AS remaining,
       CAST(CASE doc_id % 4 WHEN 0 THEN 30 WHEN 1 THEN 30 WHEN 3 THEN 45
         END AS BIGINT) AS reset_s,
       doc_id % 4 = 1 AS exhausted,
       CAST(CASE doc_id % 4
         WHEN 0 THEN (30 * 1000 + 7 - 1) // 7
         WHEN 1 THEN 30000
         WHEN 3 THEN (45 * 1000 + 5 - 1) // 5 END AS BIGINT)
         AS suggested_delay_ms
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# link_header — RFC 8288 members, multi-rel explode
# --------------------------------------------------------------------------

def q_link_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.parse_link_header over GitHub-style pagination (next+last
    members), a multi-token rel, a rel-less member, and empty."""
    from .fetch import parse_link_header

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 4
    hdr = (
        F.when(m == 0, F.concat(
            F.lit('<https://api.test/items?page='), ds,
            F.lit('&n=2>; rel="next", '
                  '<https://api.test/items?page=9>; rel="last"')))
        .when(m == 1, F.lit(
            '</style.css>; rel="preload prefetch"; as=style'))
        .when(m == 2, F.lit("</bare>"))
        .otherwise(F.lit(""))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("link"))
    out = d.select(
        "doc_id",
        F.posexplode_outer(parse_link_header(F.col("link")))
        .alias("ord", "e"),
    )
    return out.select(
        "doc_id", F.col("ord").cast("long").alias("ord"),
        F.col("e.url").alias("url"), F.col("e.rel").alias("rel"),
    ).orderBy("doc_id", "ord")


ORACLE_LINK_HEADER = """
WITH m AS (
  SELECT doc_id, doc_id % 4 AS k FROM documents
),
e(k, ord, url_t, rel) AS (
  VALUES
   (0, 0, 'PAGE', 'next'),
   (0, 1, 'https://api.test/items?page=9', 'last'),
   (1, 0, '/style.css', 'preload'),
   (1, 1, '/style.css', 'prefetch'),
   (2, 0, '/bare', NULL),
   (3, NULL, NULL, NULL)
)
SELECT m.doc_id, CAST(e.ord AS BIGINT) AS ord,
       CASE WHEN e.url_t = 'PAGE'
         THEN 'https://api.test/items?page=' || CAST(m.doc_id AS VARCHAR)
              || '&n=2'
         ELSE e.url_t END AS url,
       e.rel
FROM m JOIN e ON m.k = e.k
ORDER BY m.doc_id, ord
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ratelimit": q_ratelimit,
        "link_header": q_link_header,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ratelimit": ORACLE_RATELIMIT,
        "link_header": ORACLE_LINK_HEADER,
    }
