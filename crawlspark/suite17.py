"""Round-2 continuation queries, part 15: the composed URL identity
chain (alias collapse) and the corpus freshness histogram.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import full_canonical
from .scheduler import freshness_histogram


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# alias_collapse — full per-row canonical chain over 8 alias shapes
# --------------------------------------------------------------------------

def q_alias_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """full_canonical over 8 alias variants of each logical resource
    (case+default-port, ./ and ../ segments, tracking params, encoded
    unreserved octet, fragment, mixed query): seven of the eight
    collapse to ONE canonical string, the content-bearing-query variant
    keeps its sorted surviving param — the per-row half of the identity
    layer that decides seen-set size at 10^10 URLs."""
    doc = F.col("doc_id")
    r = (doc - doc % 8).cast("string")
    v = doc % 8
    url = (
        F.when(v == 0, F.concat(F.lit("http://site.test/a/b/p"), r))
        .when(v == 1, F.concat(F.lit("HTTP://SITE.test:80/a/b/p"), r))
        .when(v == 2, F.concat(F.lit("http://site.test/a/./b/p"), r))
        .when(v == 3, F.concat(F.lit("http://site.test/a/x/../b/p"), r))
        .when(v == 4, F.concat(F.lit("http://site.test/a/b/p"), r,
                               F.lit("?utm_source=x")))
        .when(v == 5, F.concat(F.lit("http://site.test/a/b/%70"), r))
        .when(v == 6, F.concat(F.lit("http://site.test/a/b/p"), r,
                               F.lit("#frag")))
        .otherwise(F.concat(F.lit("http://site.test/a/b/p"), r,
                            F.lit("?z=1&utm_campaign=c")))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), url.alias("url"))
    return d.select(
        "doc_id", "url", full_canonical(F.col("url")).alias("canonical")
    )


ORACLE_ALIAS_COLLAPSE = """
WITH d AS (
  SELECT doc_id,
         CAST(doc_id - doc_id % 8 AS VARCHAR) AS r,
         CAST(doc_id % 8 AS INTEGER) AS v
  FROM documents
)
SELECT doc_id,
       CASE v
         WHEN 0 THEN 'http://site.test/a/b/p' || r
         WHEN 1 THEN 'HTTP://SITE.test:80/a/b/p' || r
         WHEN 2 THEN 'http://site.test/a/./b/p' || r
         WHEN 3 THEN 'http://site.test/a/x/../b/p' || r
         WHEN 4 THEN 'http://site.test/a/b/p' || r || '?utm_source=x'
         WHEN 5 THEN 'http://site.test/a/b/%70' || r
         WHEN 6 THEN 'http://site.test/a/b/p' || r || '#frag'
         ELSE 'http://site.test/a/b/p' || r || '?z=1&utm_campaign=c'
       END AS url,
       CASE WHEN v = 7 THEN 'http://site.test/a/b/p' || r || '?z=1'
            ELSE 'http://site.test/a/b/p' || r END AS canonical
FROM d
"""


# --------------------------------------------------------------------------
# freshness_hist — power-of-two age buckets
# --------------------------------------------------------------------------

_FH_NOW = 1_000_000


def q_freshness_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """freshness_histogram over last-fetch ages 1..100k s: log2 buckets
    with permille shares; the oracle replays FLOOR(LOG2) and the
    broadcast total."""
    doc = F.col("doc_id")
    corpus = _docs(spark, sf_dir).select(
        (F.lit(_FH_NOW) - (F.lit(1) + (doc * 37) % 100_000)).cast("long")
        .alias("last_fetch_ts"),
    )
    return freshness_histogram(corpus, now_ts=_FH_NOW)


ORACLE_FRESHNESS_HIST = """
WITH a AS (
  SELECT GREATEST(1 + (doc_id * 37) % 100000, 1) AS age FROM documents
),
b AS (
  SELECT CAST(FLOOR(LOG2(CAST(age AS DOUBLE))) AS INTEGER) AS age_bucket,
         CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM a GROUP BY 1
),
t AS (SELECT CAST(SUM(n_pages) AS BIGINT) AS tot FROM b)
SELECT age_bucket, n_pages,
       CAST((1000 * n_pages) // tot AS BIGINT) AS share_permille
FROM b, t
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "alias_collapse": q_alias_collapse,
        "freshness_hist": q_freshness_hist,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "alias_collapse": ORACLE_ALIAS_COLLAPSE,
        "freshness_hist": ORACLE_FRESHNESS_HIST,
    }
