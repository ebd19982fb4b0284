"""Round-3 queries, part 33: access-barrier detection (challenge /
paywall / consent / RTA) and outlink rel rollups.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# access_barriers
# --------------------------------------------------------------------------

def q_access_barriers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.access_barriers over a clean article, a Cloudflare
    challenge shell, a declared paywall, a OneTrust CMP page, and an
    RTA-rated page."""
    from .extract import access_barriers

    doc = F.col("doc_id")
    m = doc % 5
    body = (
        F.when(m == 0, F.lit("<article>useful words</article>"))
        .when(m == 1, F.lit('<div id="challenge-platform">'
                            "checking your browser</div>"))
        .when(m == 2, F.lit('<script type="application/ld+json">'
                            '{"isAccessibleForFree": "false"}'
                            "</script><p>preview…</p>"))
        .when(m == 3, F.lit('<script src="https://cdn.cookielaw.org/'
                            'scripttemplates/otSDKStub.js"></script>'))
        .otherwise(F.lit('<meta name="rating" content='
                         '"RTA-5042-1996-1400-1577-RTA">'))
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    b = pages.select("doc_id",
                     access_barriers(F.col("body")).alias("b"))
    return b.select(
        "doc_id", "b.challenge", "b.paywall", "b.consent_cmp",
        "b.rta_rated", "b.clean",
    ).orderBy("doc_id")


ORACLE_BARRIERS = """
SELECT doc_id,
       doc_id % 5 = 1 AS challenge,
       doc_id % 5 = 2 AS paywall,
       doc_id % 5 = 3 AS consent_cmp,
       doc_id % 5 = 4 AS rta_rated,
       doc_id % 5 = 0 AS clean
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# link_rels
# --------------------------------------------------------------------------

def q_link_rels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.link_rel_rollup: an editorial page (plain links), a
    comment section (ugc+nofollow), an advertorial (sponsored), and a
    linkless page."""
    from .extract import link_rel_rollup

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit('<a href="/a">x</a><a href="/b">y</a>'
                             '<a rel="nofollow" href="/c">z</a>'))
        .when(m == 1, F.lit('<a rel="ugc nofollow" href="/u1">c</a>'
                            '<a rel="UGC" href="/u2">d</a>'))
        .when(m == 2, F.lit('<a rel="sponsored" href="/ad">buy</a>'))
        .otherwise(F.lit("<p>no links at all</p>"))
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    r = pages.select("doc_id",
                     link_rel_rollup(F.col("body")).alias("r"))
    return r.select(
        "doc_id", "r.n_links", "r.n_nofollow", "r.n_ugc",
        "r.n_sponsored", "r.followed_permille",
    ).orderBy("doc_id")


ORACLE_LINK_RELS = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1
            ELSE 0 END AS INTEGER) AS n_links,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 ELSE 0 END
            AS INTEGER) AS n_nofollow,
       CAST(CASE doc_id % 4 WHEN 1 THEN 2 ELSE 0 END AS INTEGER)
         AS n_ugc,
       CAST(CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS INTEGER)
         AS n_sponsored,
       CAST(CASE doc_id % 4 WHEN 0 THEN 666 WHEN 1 THEN 0 WHEN 2 THEN 0
            END AS BIGINT) AS followed_permille
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "access_barriers": q_access_barriers,
        "link_rels": q_link_rels,
        "crawl_scale_plan": q_crawl_scale_plan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "access_barriers": ORACLE_BARRIERS,
        "link_rels": ORACLE_LINK_RELS,
        "crawl_scale_plan": ORACLE_SCALE_PLAN,
    }


# --------------------------------------------------------------------------
# crawl_scale_plan
# --------------------------------------------------------------------------

def q_crawl_scale_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.crawl_scale_plan at the north-rule scale: 10^10
    frontier rows on 1000 x 4-core executors with the measured 80%
    prefilter exchange cut; the oracle restates the stage arithmetic
    closed-form."""
    from .capacity import crawl_scale_plan

    return crawl_scale_plan(spark, 10_000_000_000).orderBy("stage")


ORACLE_SCALE_PLAN = """
WITH s(stage, rows, bytes, shuffles, shuffle_bytes) AS (
  VALUES
    ('expand', 40000000000, 960000000000, 1, 960000000000),
    ('dedup_min', 40000000000, 960000000000, 0, 0),
    ('seen_antijoin', 10000000000, 160000000000, 1, 32000000000),
    ('global_rank', 10000000000, 240000000000, 1, 240000000000),
    ('politeness_wave', 10000000000, 480000000000, 1, 480000000000),
    ('fetch_results', 10000000000, 655360000000000, 0, 0),
    ('image_validate', 10000000000, 655360000000000, 0, 0),
    ('sink_append', 10000000000, 655360000000000, 0, 0)
)
SELECT stage, CAST(rows AS BIGINT) AS rows, CAST(bytes AS BIGINT)
         AS bytes,
       CAST(shuffles AS INTEGER) AS shuffles,
       CAST(shuffle_bytes AS BIGINT) AS shuffle_bytes,
       CAST(GREATEST(4000, CASE WHEN shuffle_bytes > 0
              THEN (shuffle_bytes + 134217727) // 134217728
              ELSE 4000 END) AS BIGINT) AS n_partitions,
       CAST((GREATEST(4000, CASE WHEN shuffle_bytes > 0
              THEN (shuffle_bytes + 134217727) // 134217728
              ELSE 4000 END) + 3999) // 4000 AS BIGINT)
         AS partitions_per_core_wave
FROM s
ORDER BY stage
"""
