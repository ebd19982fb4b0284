"""Round-3 queries, part 17: headless-render budget triage, caption
vs filename agreement, NXDOMAIN negative caching, robots-meta image
usage policy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# render_budget
# --------------------------------------------------------------------------

_RB_BODIES = [
    "<html><body><h1>Title</h1><p>This is a server rendered article "
    "with plenty of visible text content for readers.</p></body></html>",
    '<html><body><div id="root"> </div>'
    '<script src="/bundle.js"></script></body></html>',
    '<html><body><script src="/a.js"></script>'
    '<script src="/b.js"></script><script src="/c.js"></script>'
    "<div>hi</div></body></html>",
    '<html><body><script src="/a.js"></script>'
    '<script src="/b.js"></script><p>small</p></body></html>',
]


def q_render_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """browser.render_budget_classifier over four fixed page shapes:
    text-rich static, empty SPA mount, script-heavy thin shell
    (flagged), and a 2-script page under the script threshold (not
    flagged); the oracle states the measured signal constants."""
    from .browser import render_budget_classifier

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit(_RB_BODIES[0]))
        .when(m == 1, F.lit(_RB_BODIES[1]))
        .when(m == 2, F.lit(_RB_BODIES[2]))
        .otherwise(F.lit(_RB_BODIES[3]))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"))
    return render_budget_classifier(pages).select(
        "doc_id", "empty_mount", "n_script_srcs", "text_permille",
        "needs_render",
    ).orderBy("doc_id")


ORACLE_RENDER_BUDGET = """
SELECT doc_id,
       doc_id % 4 = 1 AS empty_mount,
       CAST(CASE doc_id % 4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
            ELSE 2 END AS BIGINT) AS n_script_srcs,
       CAST(CASE doc_id % 4 WHEN 0 THEN 682 WHEN 1 THEN 0 WHEN 2 THEN 15
            ELSE 52 END AS BIGINT) AS text_permille,
       doc_id % 4 IN (1, 2) AS needs_render
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# caption_filename
# --------------------------------------------------------------------------

def q_caption_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.caption_filename_agreement over full/partial/zero
    keyword overlap plus a digits-only filename (no usable tokens ->
    NULL permille)."""
    from .mmcurate import caption_filename_agreement

    doc = F.col("doc_id")
    m = doc % 4
    ds = doc.cast("string")
    url = (
        F.when(m == 0, F.concat(F.lit("http://h/p"), ds,
                                F.lit("/red-fox-snow.jpg")))
        .when(m == 1, F.concat(F.lit("http://h/p"), ds,
                               F.lit("/fox-portrait.png")))
        .when(m == 2, F.concat(F.lit("http://h/p"), ds,
                               F.lit("/sunset.webp")))
        .otherwise(F.concat(F.lit("http://h/p"), ds,
                            F.lit("/12345.jpg")))
    )
    caption = (
        F.when(m == 0, F.lit("a red fox in deep snow"))
        .when(m == 1, F.lit("portrait of a cat"))
        .when(m == 2, F.lit("a red fox again"))
        .otherwise(F.lit("numeric name"))
    )
    imgs = _docs(spark, sf_dir).select(url.alias("image_url"),
                                       caption.alias("caption"))
    return caption_filename_agreement(imgs).orderBy("image_url")


ORACLE_CAPTION_FILENAME = """
WITH u AS (
  SELECT doc_id, doc_id % 4 AS m,
         CASE doc_id % 4
           WHEN 0 THEN 'http://h/p' || doc_id || '/red-fox-snow.jpg'
           WHEN 1 THEN 'http://h/p' || doc_id || '/fox-portrait.png'
           WHEN 2 THEN 'http://h/p' || doc_id || '/sunset.webp'
           ELSE 'http://h/p' || doc_id || '/12345.jpg'
         END AS image_url,
         CASE doc_id % 4
           WHEN 0 THEN 'a red fox in deep snow'
           WHEN 1 THEN 'portrait of a cat'
           WHEN 2 THEN 'a red fox again'
           ELSE 'numeric name'
         END AS caption
  FROM documents
)
SELECT image_url, caption,
       CAST(CASE m WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 0 END
            AS BIGINT) AS n_file_tokens,
       CAST(CASE m WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS BIGINT)
         AS n_overlap,
       CAST(CASE m WHEN 0 THEN 1000 WHEN 1 THEN 500 WHEN 2 THEN 0 END
            AS BIGINT) AS overlap_permille,
       m IN (0, 1) AS agreement
FROM u
ORDER BY image_url
"""


# --------------------------------------------------------------------------
# nxdomain_cache
# --------------------------------------------------------------------------

def q_nxdomain_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.nxdomain_cache_plan over a synthetic lookup log (15
    hosts, every 5th lookup NXDOMAIN, 300 s negative TTL); the oracle
    replays the conditional running max per host."""
    from .politeness import nxdomain_cache_plan

    doc = F.col("doc_id")
    log = _docs(spark, sf_dir).select(
        F.concat(F.lit("d"), (doc % 15).cast("string")).alias("host"),
        doc.cast("long").alias("ts"),
        F.when(doc % 5 == 0, F.lit("nxdomain"))
        .otherwise(F.lit("noerror")).alias("rcode"),
    )
    return nxdomain_cache_plan(log).orderBy("host")


ORACLE_NXDOMAIN = """
WITH l AS (
  SELECT 'd' || (doc_id % 15) AS host, doc_id AS ts,
         CASE WHEN doc_id % 5 = 0 THEN 'nxdomain'
              ELSE 'noerror' END AS rcode
  FROM documents
),
w AS (
  SELECT host, ts, rcode,
         MAX(CASE WHEN rcode = 'nxdomain' THEN ts END) OVER (
             PARTITION BY host ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_nx
  FROM l
),
s AS (
  SELECT host, rcode,
         last_nx IS NOT NULL AND ts - last_nx <= 300 AND ts > last_nx
           AS sup
  FROM w
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_lookups,
       CAST(SUM(CASE WHEN rcode = 'nxdomain' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nxdomain,
       CAST(SUM(CASE WHEN sup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suppressed,
       CAST((1000 * SUM(CASE WHEN sup THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT) AS saved_permille
FROM s
GROUP BY host
ORDER BY host
"""


# --------------------------------------------------------------------------
# robots_meta
# --------------------------------------------------------------------------

def q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.robots_meta_image_policy over six meta shapes incl. the
    'none' shorthand, preview:none, and a negative max-snippet."""
    from .robots import robots_meta_image_policy

    doc = F.col("doc_id")
    m = doc % 6
    body = (
        F.when(m == 0, F.lit("<html><p>no meta</p></html>"))
        .when(m == 1, F.lit('<meta name="robots" '
                            'content="noindex, nofollow">'))
        .when(m == 2, F.lit('<META NAME="robots" CONTENT="noimageindex,'
                            ' max-image-preview:large">'))
        .when(m == 3, F.lit('<meta name="robots" content='
                            '"max-image-preview:none, max-snippet:20">'))
        .when(m == 4, F.lit('<meta name="robots" '
                            'content="noarchive, max-snippet:-1">'))
        .otherwise(F.lit('<meta name="robots" content="none">'))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"))
    return robots_meta_image_policy(pages).select(
        "doc_id", "noindex", "noimageindex", "noarchive",
        "max_image_preview", "max_snippet", "image_usable",
    ).orderBy("doc_id")


ORACLE_ROBOTS_META = """
SELECT doc_id,
       doc_id % 6 IN (1, 5) AS noindex,
       doc_id % 6 = 2 AS noimageindex,
       doc_id % 6 = 4 AS noarchive,
       CASE doc_id % 6 WHEN 2 THEN 'large' WHEN 3 THEN 'none' END
         AS max_image_preview,
       CAST(CASE doc_id % 6 WHEN 3 THEN 20 WHEN 4 THEN -1 END AS BIGINT)
         AS max_snippet,
       doc_id % 6 IN (0, 4) AS image_usable
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "render_budget": q_render_budget,
        "caption_filename": q_caption_filename,
        "nxdomain_cache": q_nxdomain_cache,
        "robots_meta": q_robots_meta,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "render_budget": ORACLE_RENDER_BUDGET,
        "caption_filename": ORACLE_CAPTION_FILENAME,
        "nxdomain_cache": ORACLE_NXDOMAIN,
        "robots_meta": ORACLE_ROBOTS_META,
    }
