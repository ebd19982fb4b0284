"""Round-2 continuation queries, part 4: HITS hub/authority scores over
the crawl link graph, HTTP conditional revalidation over the response
cache, overlapping token-window chunking, and the per-host reputation
rollup that seeds frontier priority.

House rules as everywhere: deterministic fixtures derived from the
parquet tables, DuckDB oracles replaying the identical computation in
ANSI SQL, aligned column names/types on both sides, all arithmetic
integer-exact so results are partitioning-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .linkgraph import hits, hits_oracle_sql
from .scheduler import host_reputation
from .sinks import revalidation_outcomes, revalidation_plan
from .textops.curate import chunk_tokens, chunk_tokens_oracle_sql


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# hits_scores — integer-exact HITS over the formula link graph
# --------------------------------------------------------------------------

def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact HITS (2 iterations, L1-normalized in 10^9 units)
    over the same formula link graph as q:pagerank — authorities rank
    fetch-worthy content pages, hubs rank link-discovery pages.  The
    oracle unrolls both half-iterations per round as chained CTEs."""
    n = _docs(spark, sf_dir).count()
    return hits(spark, n, iters=2).orderBy("doc")


# --------------------------------------------------------------------------
# http_revalidate — conditional-GET revalidation over the response cache
# --------------------------------------------------------------------------

_REVAL_NOW = 2_000_000
_REVAL_TTL = 3_600


def q_http_revalidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache revalidation end to end: a cached-response table (ETag /
    Last-Modified validators by doc_id shape) -> revalidation_plan
    (fresh / revalidate / refetch + conditional header) -> origin state
    join -> 304/200 classification.  Extends the reference's TTL-only
    FileCache (Cache/FileCache.php:16,46) with RFC 9111 validators;
    both stages are narrow maps + one equi-join, SQL-replayed exactly."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    cache = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("http://h"), (doc % 20).cast("string"),
                 F.lit(".test/p/"), s).alias("url"),
        F.when(doc % 3 == 0,
               F.concat(F.lit("e"), (doc % 17).cast("string"))).alias("etag"),
        F.when(doc % 3 <= 1,
               (F.lit(1_000_000) + (doc % 97) * 100).cast("long")
               ).alias("last_modified_ts"),
        (F.lit(_REVAL_NOW) - (doc % 5000)).cast("long").alias("fetched_ts"),
    )
    plan = revalidation_plan(
        cache.select("url", "etag", "last_modified_ts", "fetched_ts"),
        now_ts=_REVAL_NOW, ttl_s=_REVAL_TTL,
    )
    server = cache.select(
        "url",
        F.when(doc % 2 == 0,
               F.concat(F.lit("e"), (doc % 17).cast("string"))
               ).otherwise(F.lit("changed")).alias("cur_etag"),
        (F.lit(1_000_000) + (doc % 97) * 100
         + F.when(doc % 4 == 0, F.lit(0)).otherwise(F.lit(50))
         ).cast("long").alias("cur_modified_ts"),
    )
    out = revalidation_outcomes(plan, server, now_ts=_REVAL_NOW)
    return plan.join(out.select("url", "status"), "url", "left").select(
        "url", "age_s", "action", "cond_header", "cond_value", "status"
    )


ORACLE_HTTP_REVALIDATE = f"""
WITH cache AS (
  SELECT doc_id,
    'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.test/p/' ||
      CAST(doc_id AS VARCHAR) AS url,
    CASE WHEN doc_id % 3 = 0
         THEN 'e' || CAST(doc_id % 17 AS VARCHAR) END AS etag,
    CASE WHEN doc_id % 3 <= 1
         THEN 1000000 + (doc_id % 97) * 100 END AS last_modified_ts,
    {_REVAL_NOW} - (doc_id % 5000) AS fetched_ts
  FROM documents
),
plan AS (
  SELECT doc_id, url,
    CAST({_REVAL_NOW} - fetched_ts AS BIGINT) AS age_s,
    CASE WHEN {_REVAL_NOW} - fetched_ts < {_REVAL_TTL} THEN 'fresh'
         WHEN etag IS NOT NULL OR last_modified_ts IS NOT NULL
           THEN 'revalidate'
         ELSE 'refetch' END AS action,
    CASE WHEN {_REVAL_NOW} - fetched_ts >= {_REVAL_TTL} AND etag IS NOT NULL
           THEN 'If-None-Match'
         WHEN {_REVAL_NOW} - fetched_ts >= {_REVAL_TTL}
              AND last_modified_ts IS NOT NULL
           THEN 'If-Modified-Since' END AS cond_header,
    CASE WHEN {_REVAL_NOW} - fetched_ts >= {_REVAL_TTL} AND etag IS NOT NULL
           THEN etag
         WHEN {_REVAL_NOW} - fetched_ts >= {_REVAL_TTL}
              AND last_modified_ts IS NOT NULL
           THEN CAST(last_modified_ts AS VARCHAR) END AS cond_value,
    etag, last_modified_ts
  FROM cache
),
server AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0
         THEN 'e' || CAST(doc_id % 17 AS VARCHAR)
         ELSE 'changed' END AS cur_etag,
    1000000 + (doc_id % 97) * 100 +
      CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 50 END AS cur_modified_ts
  FROM cache
),
outc AS (
  SELECT p.url,
    CASE WHEN (CASE WHEN p.cond_header = 'If-None-Match'
                    THEN s.cur_etag IS NOT NULL AND s.cur_etag = p.cond_value
                    ELSE s.cur_modified_ts <= CAST(p.cond_value AS BIGINT)
               END)
         THEN 304 ELSE 200 END AS status
  FROM plan p JOIN server s USING (doc_id)
  WHERE p.action = 'revalidate'
)
SELECT p.url, p.age_s, p.action, p.cond_header, p.cond_value,
       CAST(o.status AS INTEGER) AS status
FROM plan p LEFT JOIN outc o ON o.url = p.url
"""


# --------------------------------------------------------------------------
# chunk_overlap — overlapping token-window chunking
# --------------------------------------------------------------------------

def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking of the documents table: 32-token chunks at
    stride 24 (8 tokens of overlap) — sequence/posexplode/slice higher-
    order functions only, one narrow map over the scan.  The oracle
    replays it with generate_series + list_slice."""
    return chunk_tokens(
        _docs(spark, sf_dir).select("doc_id", "text"),
        chunk_size=32, stride=24,
    )


# --------------------------------------------------------------------------
# host_reputation — per-host prior for frontier priority
# --------------------------------------------------------------------------

def q_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host reputation rollup over a synthetic fetched-page table (37
    hosts; quality/error/dup/trap signals by doc_id arithmetic) — ONE
    map-side-combined groupBy, integer permille arithmetic replayed by
    the oracle."""
    doc = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 37).cast("string")).alias("host"),
        ((doc * 7) % 1000).alias("quality_permille"),
        (doc % 11 == 0).alias("is_error"),
        (doc % 6 == 0).alias("is_dup"),
        (doc % 29 == 0).alias("is_trap"),
    )
    return host_reputation(pages)


ORACLE_HOST_REPUTATION = """
WITH pages AS (
  SELECT 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
         (doc_id * 7) % 1000 AS q,
         CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS e,
         CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS d,
         CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 0 END AS t
  FROM documents
),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(q) AS BIGINT) AS q_sum,
         CAST(SUM(e) AS BIGINT) AS n_err,
         CAST(SUM(d) AS BIGINT) AS n_dup,
         CAST(SUM(t) AS BIGINT) AS n_trap
  FROM pages GROUP BY host
)
SELECT host, n_pages,
       CAST(q_sum // n_pages AS BIGINT) AS mean_quality_permille,
       CAST((1000 * n_err) // n_pages AS BIGINT) AS error_permille,
       CAST((1000 * n_dup) // n_pages AS BIGINT) AS dup_permille,
       CAST((1000 * n_trap) // n_pages AS BIGINT) AS trap_permille,
       CAST(GREATEST(0,
         q_sum // n_pages
         - (300 * ((1000 * n_err) // n_pages)) // 1000
         - (300 * ((1000 * n_dup) // n_pages)) // 1000
         - (400 * ((1000 * n_trap) // n_pages)) // 1000
       ) AS BIGINT) AS reputation_permille
FROM agg
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hits_scores": q_hits_scores,
        "http_revalidate": q_http_revalidate,
        "chunk_overlap": q_chunk_overlap,
        "host_reputation": q_host_reputation,
        "img_srcset": q_img_srcset,
        "sitemap_images": q_sitemap_images,
        "image_mime_sniff": q_image_mime_sniff,
        "priority_fusion": q_priority_fusion,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hits_scores": hits_oracle_sql(iters=2),
        "http_revalidate": ORACLE_HTTP_REVALIDATE,
        "chunk_overlap": chunk_tokens_oracle_sql(chunk_size=32, stride=24),
        "host_reputation": ORACLE_HOST_REPUTATION,
        "img_srcset": ORACLE_IMG_SRCSET,
        "sitemap_images": ORACLE_SITEMAP_IMAGES,
        "image_mime_sniff": ORACLE_IMAGE_MIME,
        "priority_fusion": ORACLE_PRIORITY_FUSION,
    }


# --------------------------------------------------------------------------
# img_srcset — <img srcset> candidate selection under a pixel budget
# --------------------------------------------------------------------------

def q_img_srcset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page <img> parse + srcset candidate pick at max_width=800 over
    an arithmetic HTML corpus: every page has a 3-candidate srcset image
    (320/640/1280w -> picks 640), every 3rd page a bare relative src
    (resolved against the page directory), every 4th a too-big srcset
    (1600/2000w -> picks the smallest, 1600).  The oracle states the
    expected selection arithmetically (house style for parser fixtures,
    as in q:robots_parse)."""
    from .extract import img_srcset_candidates

    doc = F.col("doc_id")
    s = doc.cast("string")
    page_url = F.concat(
        F.lit("http://h"), (doc % 20).cast("string"),
        F.lit(".test/d/"), s, F.lit("/page.html"),
    )
    img_a = F.concat(
        F.lit('<img src="/i/a'), s, F.lit('.jpg" srcset="/i/a'), s,
        F.lit('-320.jpg 320w, /i/a'), s, F.lit('-640.jpg 640w, /i/a'), s,
        F.lit('-1280.jpg 1280w">'),
    )
    img_b = F.when(
        doc % 3 == 0,
        F.concat(F.lit('<img src="b'), (doc % 7).cast("string"),
                 F.lit('.png">')),
    ).otherwise(F.lit(""))
    img_c = F.when(
        doc % 4 == 0,
        F.concat(F.lit('<img src="/i/c.jpg" srcset="/i/c'), s,
                 F.lit('-1600.jpg 1600w, /i/c'), s,
                 F.lit('-2000.jpg 2000w">')),
    ).otherwise(F.lit(""))
    body = F.concat(F.lit("<html><body>"), img_a, img_b, img_c,
                    F.lit("</body></html>"))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), page_url.alias("page_url")
    )
    picked = d.select(
        "doc_id",
        F.explode(
            img_srcset_candidates(F.col("body"), F.col("page_url"),
                                  max_width=800)
        ).alias("img"),
    )
    return picked.select(
        "doc_id",
        F.col("img.img_ord").alias("img_ord"),
        F.col("img.chosen_url").alias("chosen_url"),
        F.col("img.chosen_w").alias("chosen_w"),
        F.col("img.n_candidates").alias("n_candidates"),
    )


ORACLE_IMG_SRCSET = """
WITH d AS (SELECT doc_id FROM documents),
a AS (
  SELECT doc_id, 0 AS img_ord,
         '/i/a' || CAST(doc_id AS VARCHAR) || '-640.jpg' AS rel,
         CAST(640 AS BIGINT) AS chosen_w, 3 AS n_candidates
  FROM d
),
b AS (
  SELECT doc_id, 1 AS img_ord,
         'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.test/d/' ||
           CAST(doc_id AS VARCHAR) || '/b' || CAST(doc_id % 7 AS VARCHAR)
           || '.png' AS abs_url,
         CAST(NULL AS BIGINT) AS chosen_w, 1 AS n_candidates
  FROM d WHERE doc_id % 3 = 0
),
c AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS img_ord,
         '/i/c' || CAST(doc_id AS VARCHAR) || '-1600.jpg' AS rel,
         CAST(1600 AS BIGINT) AS chosen_w, 2 AS n_candidates
  FROM d WHERE doc_id % 4 = 0
),
uni AS (
  SELECT doc_id, img_ord,
         'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.test' || rel
           AS chosen_url,
         chosen_w, n_candidates
  FROM a
  UNION ALL
  SELECT doc_id, img_ord, abs_url, chosen_w, n_candidates FROM b
  UNION ALL
  SELECT doc_id, img_ord,
         'http://h' || CAST(doc_id % 20 AS VARCHAR) || '.test' || rel,
         chosen_w, n_candidates
  FROM c
)
SELECT doc_id, CAST(img_ord AS INTEGER) AS img_ord, chosen_url, chosen_w,
       CAST(n_candidates AS INTEGER) AS n_candidates
FROM uni
"""


# --------------------------------------------------------------------------
# sitemap_images — Google image-sitemap (page, image, caption) rows
# --------------------------------------------------------------------------

def q_sitemap_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-sitemap extraction: every doc is a sitemap with one <url>
    block (1 image) plus, for even docs, a second block with 2 images —
    pairing of each page's <loc> with ITS OWN images is the point (flat
    xpath would misalign on variable image counts)."""
    from .extract import sitemap_image_entries

    doc = F.col("doc_id")
    s = doc.cast("string")
    page1 = F.concat(F.lit("http://s"), (doc % 10).cast("string"),
                     F.lit(".test/p"), s)
    block1 = F.concat(
        F.lit("<url><loc>"), page1, F.lit("</loc><image:image><image:loc>"),
        F.lit("http://img.test/i"), s, F.lit(".jpg</image:loc>"),
        F.lit("<image:caption>cap "), (doc % 13).cast("string"),
        F.lit("</image:caption></image:image></url>"),
    )
    page2 = F.concat(F.lit("http://s"), (doc % 10).cast("string"),
                     F.lit(".test/q"), s)
    block2 = F.when(
        doc % 2 == 0,
        F.concat(
            F.lit("<url><loc>"), page2, F.lit("</loc>"),
            F.lit("<image:image><image:loc>http://img.test/j"), s,
            F.lit("a.png</image:loc><image:caption>left</image:caption>"
                  "</image:image>"),
            F.lit("<image:image><image:loc>http://img.test/j"), s,
            F.lit("b.png</image:loc><image:caption>right</image:caption>"
                  "</image:image></url>"),
        ),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'), block1, block2,
        F.lit("</urlset>"),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id",
        F.explode(sitemap_image_entries(F.col("body"))).alias("e"),
    ).select(
        "doc_id",
        F.col("e.page_url").alias("page_url"),
        F.col("e.image_url").alias("image_url"),
        F.col("e.caption").alias("caption"),
    )


ORACLE_SITEMAP_IMAGES = """
WITH d AS (SELECT doc_id FROM documents)
SELECT doc_id,
       'http://s' || CAST(doc_id % 10 AS VARCHAR) || '.test/p' ||
         CAST(doc_id AS VARCHAR) AS page_url,
       'http://img.test/i' || CAST(doc_id AS VARCHAR) || '.jpg' AS image_url,
       'cap ' || CAST(doc_id % 13 AS VARCHAR) AS caption
FROM d
UNION ALL
SELECT doc_id,
       'http://s' || CAST(doc_id % 10 AS VARCHAR) || '.test/q' ||
         CAST(doc_id AS VARCHAR),
       'http://img.test/j' || CAST(doc_id AS VARCHAR) || 'a.png', 'left'
FROM d WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id,
       'http://s' || CAST(doc_id % 10 AS VARCHAR) || '.test/q' ||
         CAST(doc_id AS VARCHAR),
       'http://img.test/j' || CAST(doc_id AS VARCHAR) || 'b.png', 'right'
FROM d WHERE doc_id % 2 = 0
"""


# --------------------------------------------------------------------------
# image_mime_sniff — magic-byte format check before decode
# --------------------------------------------------------------------------

def q_image_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte sniff vs declared format over synthesized binaries:
    declared fmt cycles png/jpeg/webp by doc_id%3; every 5th row's bytes
    actually carry a GIF header (the corrupt case an image crawler must
    quarantine before decode).  Bytes are built with unhex() from the
    real magic constants; output has no binary columns (gate rule)."""
    from .images import sniff_image_format

    doc = F.col("doc_id")
    declared = (
        F.when(doc % 3 == 0, F.lit("png"))
        .when(doc % 3 == 1, F.lit("jpeg"))
        .otherwise(F.lit("webp"))
    )
    good_hex = (
        F.when(doc % 3 == 0, F.lit("89504E470D0A1A0A0000000D49484452"))
        .when(doc % 3 == 1, F.lit("FFD8FFE000104A46494600010100000100"))
        .otherwise(F.lit("524946462A000000574542505650382A"))
    )
    hexes = F.when(doc % 5 == 0, F.lit("474946383961AA00BB00000000000000")
                   ).otherwise(good_hex)
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        declared.alias("fmt_declared"),
        F.unhex(hexes).alias("bytes"),
    )
    sniffed = sniff_image_format(F.col("bytes"))
    return d.select(
        "doc_id",
        "fmt_declared",
        sniffed.alias("fmt_sniffed"),
        (sniffed == F.col("fmt_declared")).alias("magic_ok"),
    )


ORACLE_IMAGE_MIME = """
WITH d AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END
           AS fmt_declared,
         CASE WHEN doc_id % 5 = 0 THEN 'gif'
              ELSE CASE CAST(doc_id % 3 AS INTEGER)
                     WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END
         END AS fmt_sniffed
  FROM documents
)
SELECT doc_id, fmt_declared, fmt_sniffed,
       fmt_sniffed = fmt_declared AS magic_ok
FROM d
"""


# --------------------------------------------------------------------------
# priority_fusion — host prior + page score -> frontier wave
# --------------------------------------------------------------------------

def q_priority_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed prioritization chain: page-level score (arithmetic
    stand-in for PageRank permille) + the host_reputation prior (hosts
    below the evidence floor fall back to the 500-permille default tier)
    -> fused priority -> select_wave global top-200 (per-host window +
    two-phase exact global rank).  The whole chain replays in SQL."""
    doc = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("h"), (doc % 37).cast("string")).alias("host"),
        ((doc * 7) % 1000).alias("quality_permille"),
        (doc % 11 == 0).alias("is_error"),
        (doc % 6 == 0).alias("is_dup"),
        (doc % 29 == 0).alias("is_trap"),
    )
    rep = host_reputation(pages).select("host", "reputation_permille")
    frontier = pages.select(
        "doc_id", "host",
        F.concat(F.lit("http://"), F.col("host"), F.lit(".test/n/"),
                 doc.cast("string")).alias("url"),
        ((doc * 13) % 1000).cast("long").alias("page_score"),
        (doc % 101).cast("long").alias("crawl_ts"),
    )
    fused = frontier.join(F.broadcast(rep), "host").select(
        "doc_id", "host", "url", "crawl_ts",
        F.expr(
            "page_score + coalesce(reputation_permille, 500L) div 2"
        ).alias("priority"),
    )
    from .scheduler import select_wave

    wave = select_wave(fused, budgets=None, wave_size=200)
    return wave.select(
        "doc_id", "host", "url", "priority", "host_seq", "wave_rank"
    )


ORACLE_PRIORITY_FUSION = """
WITH pages AS (
  SELECT doc_id, 'h' || CAST(doc_id % 37 AS VARCHAR) AS host,
         (doc_id * 7) % 1000 AS q,
         CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END AS e,
         CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END AS du,
         CASE WHEN doc_id % 29 = 0 THEN 1 ELSE 0 END AS t
  FROM documents
),
agg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(q) AS BIGINT) AS q_sum, CAST(SUM(e) AS BIGINT) AS n_err,
         CAST(SUM(du) AS BIGINT) AS n_dup, CAST(SUM(t) AS BIGINT) AS n_trap
  FROM pages GROUP BY host
),
rep AS (
  SELECT host,
         CAST(GREATEST(0,
           q_sum // n_pages
           - (300 * ((1000 * n_err) // n_pages)) // 1000
           - (300 * ((1000 * n_dup) // n_pages)) // 1000
           - (400 * ((1000 * n_trap) // n_pages)) // 1000
         ) AS BIGINT) AS reputation_permille
  FROM agg
),
fused AS (
  SELECT p.doc_id, p.host,
         'http://' || p.host || '.test/n/' || CAST(p.doc_id AS VARCHAR)
           AS url,
         CAST((p.doc_id * 13) % 1000
              + COALESCE(r.reputation_permille, 500) // 2 AS BIGINT)
           AS priority,
         CAST(p.doc_id % 101 AS BIGINT) AS crawl_ts
  FROM pages p JOIN rep r USING (host)
),
ranked AS (
  SELECT doc_id, host, url, priority,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY host ORDER BY priority DESC, crawl_ts, url)
           AS BIGINT) AS host_seq,
         CAST(ROW_NUMBER() OVER (
           ORDER BY priority DESC, crawl_ts, url) AS BIGINT) AS wave_rank
  FROM fused
)
SELECT doc_id, host, url, priority, host_seq, wave_rank
FROM ranked WHERE wave_rank <= 200
"""
