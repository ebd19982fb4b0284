"""Round-2 continuation queries, part 10: crawl-snapshot diffing, host
migration detection, host-level boilerplate shingle mining.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import detect_host_migrations
from .checkpoint import crawl_diff
from .textops.quality import boilerplate_shingles


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# crawl_diff — change feed between two crawl snapshots
# --------------------------------------------------------------------------

def q_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: docs with doc%9==8 exist only in the current
    generation (added), doc%9==7 only in the previous (removed),
    doc%5==0 changed hash (modified), the rest unchanged — one
    full-outer join on url."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    url = F.concat(F.lit("http://d.test/p/"), s)
    base = _docs(spark, sf_dir).select(doc.alias("doc_id"), url.alias("url"))
    prev = base.filter(doc % 9 != 8).select(
        "url", F.concat(F.lit("a"), s).alias("content_hash")
    )
    cur = base.filter(doc % 9 != 7).select(
        "url",
        F.when(doc % 5 == 0, F.concat(F.lit("b"), s))
         .otherwise(F.concat(F.lit("a"), s)).alias("content_hash"),
    )
    return crawl_diff(prev, cur)


ORACLE_CRAWL_DIFF = """
WITH d AS (
  SELECT doc_id, 'http://d.test/p/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
)
SELECT url,
       CASE WHEN doc_id % 9 <> 8 THEN 'a' || CAST(doc_id AS VARCHAR) END
         AS prev_hash,
       CASE WHEN doc_id % 9 <> 7 THEN
         CASE WHEN doc_id % 5 = 0 THEN 'b' ELSE 'a' END
           || CAST(doc_id AS VARCHAR) END AS cur_hash,
       CASE WHEN doc_id % 9 = 8 THEN 'added'
            WHEN doc_id % 9 = 7 THEN 'removed'
            WHEN doc_id % 5 = 0 THEN 'modified'
            ELSE 'unchanged' END AS change
FROM d
"""


# --------------------------------------------------------------------------
# host_migration — whole-host 301 aggregation
# --------------------------------------------------------------------------

def q_host_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect_host_migrations over a redirect log: old0/old1 redirect
    wholesale to new0/new1 (migrated); old2 splits 70/30 between new2
    and alt2 (share below 900 — not migrated); old3 has only 4
    permanent redirects (below the count floor); 302s and self-redirects
    are excluded by construction."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    h = doc % 6
    src_host = F.concat(F.lit("old"), h.cast("string"))
    dst_host = (
        F.when(h <= 1, F.concat(F.lit("new"), h.cast("string")))
        .when(h == 2, F.when(doc % 10 < 7, F.lit("new2"))
                       .otherwise(F.lit("alt2")))
        .when(h == 3, F.lit("new3"))
        .when(h == 4, F.lit("new4"))
        .otherwise(src_host)  # h==5: self-redirect, excluded
    )
    status = (
        F.when(h == 4, 302)  # temporary: excluded
        .when((h == 3) & (doc >= 24), 302)  # cap old3's permanent count
        .otherwise(301)
    ).cast("int")
    redirects = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://"), src_host, F.lit(".test/p/"), s)
        .alias("src_url"),
        F.concat(F.lit("http://"), dst_host, F.lit(".test/p/"), s)
        .alias("dst_url"),
        status.alias("status"),
    )
    return detect_host_migrations(redirects)


ORACLE_HOST_MIGRATION = """
WITH r AS (
  SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS h FROM documents
),
perm AS (
  SELECT 'old' || CAST(h AS VARCHAR) || '.test' AS src_host,
         CASE WHEN h <= 1 THEN 'new' || CAST(h AS VARCHAR)
              WHEN h = 2 THEN CASE WHEN doc_id % 10 < 7
                                   THEN 'new2' ELSE 'alt2' END
              WHEN h = 3 THEN 'new3' END || '.test' AS dst_host
  FROM r
  WHERE h <= 3 AND NOT (h = 3 AND doc_id >= 24)
),
pair AS (
  SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_redirects
  FROM perm GROUP BY src_host, dst_host
),
tot AS (
  SELECT src_host, CAST(SUM(n_redirects) AS BIGINT) AS host_redirects
  FROM pair GROUP BY src_host
)
SELECT p.src_host, p.dst_host, p.n_redirects, t.host_redirects,
       CAST((1000 * p.n_redirects) // t.host_redirects AS BIGINT)
         AS share_permille,
       p.n_redirects >= 5
         AND (1000 * p.n_redirects) // t.host_redirects >= 900 AS migrated
FROM pair p JOIN tot t USING (src_host)
"""


# --------------------------------------------------------------------------
# boilerplate — host-template shingles
# --------------------------------------------------------------------------

def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """boilerplate_shingles over 4 hosts whose every page shares a
    4-word nav header plus unique tail words: exactly the two header
    trigrams flag per host at share 1000; shingles touching the unique
    words never cross the threshold."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    text = F.concat(
        F.lit("nav home about contact u"), s, F.lit(" v"), s
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 4).cast("string")).alias("host"),
        doc.alias("doc_id"),
        text.alias("text"),
    )
    return boilerplate_shingles(d)


ORACLE_BOILERPLATE = """
WITH hosts AS (
  SELECT 'h' || CAST(doc_id % 4 AS VARCHAR) AS host,
         CAST(COUNT(*) AS BIGINT) AS host_docs
  FROM documents GROUP BY doc_id % 4
)
SELECT host, s.shingle, host_docs AS n_docs_with, host_docs,
       CAST(1000 AS BIGINT) AS share_permille
FROM hosts
CROSS JOIN (VALUES ('nav home about'), ('home about contact')) AS s(shingle)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_diff": q_crawl_diff,
        "host_migration": q_host_migration,
        "boilerplate": q_boilerplate,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_diff": ORACLE_CRAWL_DIFF,
        "host_migration": ORACLE_HOST_MIGRATION,
        "boilerplate": ORACLE_BOILERPLATE,
    }
