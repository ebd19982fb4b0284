"""Round-3 queries, part 16: ordered URL priority rules, SRI audit,
prefix-interval shard rebalancing, EXIF DateTimeOriginal chase.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# priority_rules
# --------------------------------------------------------------------------

def q_priority_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.apply_priority_rules with a 3-rule policy: /product/
    beats ?page= beats the https catch-all, first match wins,
    unmatched URLs default to 0."""
    from .scheduler import apply_priority_rules

    doc = F.col("doc_id")
    m = doc % 4
    ds = doc.cast("string")
    url = (
        F.when(m == 0, F.concat(F.lit("https://s/product/x"), ds,
                                F.lit("?page=2")))
        .when(m == 1, F.concat(F.lit("http://s/list"), ds,
                               F.lit("?page=3")))
        .when(m == 2, F.concat(F.lit("https://s/about"), ds))
        .otherwise(F.concat(F.lit("http://s/misc"), ds))
    )
    urls = _docs(spark, sf_dir).select(url.alias("url"))
    rules = spark.createDataFrame(
        [(1, "/product/", 90), (2, r"\?page=", 10), (3, "^https://", 70)],
        "rule_ord int, pattern string, priority int")
    return apply_priority_rules(urls, rules).orderBy("url")


ORACLE_PRIORITY_RULES = """
WITH u AS (
  SELECT doc_id, doc_id % 4 AS m,
         CASE doc_id % 4
           WHEN 0 THEN 'https://s/product/x' || doc_id || '?page=2'
           WHEN 1 THEN 'http://s/list' || doc_id || '?page=3'
           WHEN 2 THEN 'https://s/about' || doc_id
           ELSE 'http://s/misc' || doc_id
         END AS url
  FROM documents
)
SELECT url,
       CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 END
            AS BIGINT) AS rule_ord,
       CAST(CASE m WHEN 0 THEN 90 WHEN 1 THEN 10 WHEN 2 THEN 70
            ELSE 0 END AS BIGINT) AS priority
FROM u
ORDER BY url
"""


# --------------------------------------------------------------------------
# sri_audit
# --------------------------------------------------------------------------

def q_sri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.sri_audit over pages with 0-3 subresources and mixed
    integrity coverage; algos reported as a sorted comma-joined
    string."""
    from .extract import sri_audit

    doc = F.col("doc_id")
    m = doc % 3
    body = (
        F.when(m == 0, F.lit("<p>plain page</p>"))
        .when(m == 1, F.lit(
            '<script src="/a.js" integrity="sha384-AAA"></script>'
            '<script src="/b.js"></script>'
            '<link rel="stylesheet" href="/c.css">'))
        .otherwise(F.lit(
            '<script src="/d.js" integrity="sha256-BBB"></script>'
            '<link rel="stylesheet" href="/e.css" '
            'integrity="sha512-CCC">'))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"))
    a = pages.select("doc_id", sri_audit(F.col("body")).alias("s"))
    return a.select(
        "doc_id", F.col("s.n_subresources").alias("n_subresources"),
        F.col("s.n_with_sri").alias("n_with_sri"),
        F.array_join(F.col("s.algos"), ",").alias("algos"),
    ).orderBy("doc_id")


ORACLE_SRI = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 2 END
            AS INTEGER) AS n_subresources,
       CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END
            AS INTEGER) AS n_with_sri,
       CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN 'sha384'
            ELSE 'sha256,sha512' END AS algos
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# rebalance
# --------------------------------------------------------------------------

def q_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.rebalance_transfers over 40 shards where every 8th
    holds a hot backlog; the oracle replays the water-level targets,
    both prefix-interval chains and the overlap amounts in window
    SQL."""
    from .scheduler import rebalance_transfers

    doc = F.col("doc_id")
    shards = _docs(spark, sf_dir).filter(doc < 40).select(
        doc.alias("shard_id"),
        F.when(doc % 8 == 0, 1000 + doc).otherwise(50 + doc)
        .cast("long").alias("backlog"),
    )
    return rebalance_transfers(shards).orderBy("from_shard", "to_shard")


ORACLE_REBALANCE = """
WITH s AS (
  SELECT doc_id AS sid,
         CAST(CASE WHEN doc_id % 8 = 0 THEN 1000 + doc_id
              ELSE 50 + doc_id END AS BIGINT) AS bk
  FROM documents WHERE doc_id < 40
),
t AS (SELECT CAST(SUM(bk) AS BIGINT) AS tt, COUNT(*) AS n FROM s),
r AS (
  SELECT sid, bk, tt, n,
         ROW_NUMBER() OVER (ORDER BY sid) AS rk
  FROM s CROSS JOIN t
),
tgt AS (
  SELECT sid, bk,
         tt // n + CASE WHEN rk <= tt % n THEN 1 ELSE 0 END AS target
  FROM r
),
d AS (
  SELECT sid AS from_shard, bk - target AS amt,
         CAST(SUM(bk - target) OVER (ORDER BY sid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS e1
  FROM tgt WHERE bk > target
),
d2 AS (SELECT from_shard, e1 - amt AS e0, e1 FROM d),
x AS (
  SELECT sid AS to_shard, target - bk AS amt,
         CAST(SUM(target - bk) OVER (ORDER BY sid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS d1
  FROM tgt WHERE bk < target
),
x2 AS (SELECT to_shard, d1 - amt AS d0, d1 FROM x)
SELECT from_shard, to_shard,
       CAST(LEAST(e1, d1) - GREATEST(e0, d0) AS BIGINT) AS amount
FROM d2 JOIN x2 ON LEAST(e1, d1) > GREATEST(e0, d0)
ORDER BY from_shard, to_shard
"""


# --------------------------------------------------------------------------
# exif_datetime
# --------------------------------------------------------------------------

def _tiff_dt(le: bool, dt: str | None) -> str:
    e = "<" if le else ">"

    def h(fmt, *v):
        return struct.pack(e + fmt, *v).hex()

    out = ("49492a00" if le else "4d4d002a") + h("I", 8)
    if dt is None:
        # IFD0 with one non-pointer entry, no sub-IFD
        out += h("H", 1) + h("HHI", 0x0112, 3, 1) + h("H", 1) + "0000"
        out += h("I", 0)
        return out
    out += h("H", 1) + h("HHII", 0x8769, 4, 1, 26) + h("I", 0)
    out += h("H", 1) + h("HHII", 0x9003, 2, 20, 44) + h("I", 0)
    return out + (dt.encode() + b"\x00").hex()


_DT_LE = _tiff_dt(True, "2021:07:09 12:34:56")
_DT_BE = _tiff_dt(False, "1999:01:02 03:04:05")
_DT_NONE = _tiff_dt(True, None)


def q_exif_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.exif_datetime_scan over planted TIFF/EXIF payloads:
    little- and big-endian sub-IFD DateTimeOriginal, a TIFF without
    the Exif pointer, and a non-TIFF."""
    from .images import exif_datetime_scan

    doc = F.col("doc_id")
    m = doc % 4
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_DT_LE))
        .when(m == 2, F.lit(_DT_BE))
        .otherwise(F.lit(_DT_NONE))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return exif_datetime_scan(imgs).select(
        "doc_id", "exif_has_subifd", "exif_datetime_original",
        "exif_capture_year",
    ).orderBy("doc_id")


ORACLE_EXIF_DT = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 3 THEN 0
                 ELSE 1 END AS INTEGER) AS exif_has_subifd,
       CASE doc_id % 4 WHEN 1 THEN '2021:07:09 12:34:56'
            WHEN 2 THEN '1999:01:02 03:04:05' END
         AS exif_datetime_original,
       CAST(CASE doc_id % 4 WHEN 1 THEN 2021 WHEN 2 THEN 1999
            END AS INTEGER) AS exif_capture_year
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "priority_rules": q_priority_rules,
        "sri_audit": q_sri_audit,
        "rebalance": q_rebalance,
        "exif_datetime": q_exif_datetime,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "priority_rules": ORACLE_PRIORITY_RULES,
        "sri_audit": ORACLE_SRI,
        "rebalance": ORACLE_REBALANCE,
        "exif_datetime": ORACLE_EXIF_DT,
    }
