"""Round-2 continuation queries, part 5: byte-budgeted wave selection,
hreflang language-variant clustering, and URL blocklist classification.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation, aligned names/types,
integer-exact arithmetic throughout.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import url_category
from .extract import extract_hreflang
from .scheduler import select_wave_by_bytes


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# wave_bytes — byte-budgeted frontier wave (image crawls are bandwidth-bound)
# --------------------------------------------------------------------------

_HOST_BYTES = 50_000
_GLOBAL_BYTES = 1_000_000


def q_wave_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select_wave_by_bytes over a synthetic frontier (23 hosts, size
    estimates 1000..9999): per-host inclusive byte cut at 50 kB with
    first-row admission, then the fleet-wide 1 MB cut via the two-phase
    global prefix sum.  The oracle replays both windows in SQL."""
    doc = F.col("doc_id")
    frontier = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("h"), (doc % 23).cast("string")).alias("host"),
        F.concat(F.lit("http://h"), (doc % 23).cast("string"),
                 F.lit(".test/o/"), doc.cast("string")).alias("url"),
        ((doc * 13) % 1000).cast("long").alias("priority"),
        (doc % 89).cast("long").alias("crawl_ts"),
        (F.lit(1000) + (doc * 37) % 9000).cast("long").alias("est_bytes"),
    )
    wave = select_wave_by_bytes(
        frontier, host_byte_budget=_HOST_BYTES,
        global_byte_budget=_GLOBAL_BYTES,
    )
    return wave.select(
        "doc_id", "host", "url", "priority", "est_bytes",
        "host_bytes_before", "wave_bytes_before",
    )


ORACLE_WAVE_BYTES = f"""
WITH frontier AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
         'http://h' || CAST(doc_id % 23 AS VARCHAR) || '.test/o/' ||
           CAST(doc_id AS VARCHAR) AS url,
         CAST((doc_id * 13) % 1000 AS BIGINT) AS priority,
         CAST(doc_id % 89 AS BIGINT) AS crawl_ts,
         CAST(1000 + (doc_id * 37) % 9000 AS BIGINT) AS est_bytes
  FROM documents
),
hostcut AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
         CAST(COALESCE(SUM(est_bytes) OVER
           (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS host_bytes_before
  FROM frontier
  WINDOW w AS (PARTITION BY host ORDER BY priority DESC, crawl_ts, url)
),
admitted AS (
  SELECT * FROM hostcut
  WHERE seq = 1 OR host_bytes_before + est_bytes <= {_HOST_BYTES}
),
globalcut AS (
  SELECT *,
         CAST(COALESCE(SUM(est_bytes) OVER
           (ORDER BY priority DESC, crawl_ts, url
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS wave_bytes_before
  FROM admitted
)
SELECT doc_id, host, url, priority, est_bytes, host_bytes_before,
       wave_bytes_before
FROM globalcut
WHERE wave_bytes_before = 0
   OR wave_bytes_before + est_bytes <= {_GLOBAL_BYTES}
"""


# --------------------------------------------------------------------------
# hreflang_clusters — language-variant grouping, one canonical per cluster
# --------------------------------------------------------------------------

def q_hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages paired (2k, 2k+1) as en/de editions; each page's body
    declares BOTH alternates via <link rel="alternate" hreflang>.  The
    cluster key is the lexicographic min of the declared alternate set
    (content-derived — works even when an edition is not yet crawled);
    the canonical flag picks one edition per cluster to keep for
    training data."""
    doc = F.col("doc_id")
    pair = (doc - doc % 2).cast("string")
    url_en = F.concat(F.lit("http://x.test/en/"), pair)
    url_de = F.concat(F.lit("http://x.test/de/"), pair)
    own = F.when(doc % 2 == 0, url_en).otherwise(url_de)
    body = F.concat(
        F.lit('<html><head><link rel="alternate" hreflang="en" href="'),
        url_en,
        F.lit('"><link rel="alternate" hreflang="de" href="'),
        url_de,
        F.lit('"></head><body>p</body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), own.alias("page_url"), body.alias("body")
    )
    alts = extract_hreflang(F.col("body"))
    alt_urls = F.transform(alts, lambda a: a["url"])
    cluster = F.array_min(F.concat(alt_urls, F.array(F.col("page_url"))))
    return pages.select(
        "doc_id",
        "page_url",
        F.size(alts).cast("int").alias("n_alternates"),
        cluster.alias("cluster_key"),
        (F.col("page_url") == cluster).alias("is_canonical"),
    )


ORACLE_HREFLANG = """
WITH d AS (
  SELECT doc_id,
         CAST(doc_id - doc_id % 2 AS VARCHAR) AS pair,
         doc_id % 2 AS side
  FROM documents
)
SELECT doc_id,
       CASE WHEN side = 0 THEN 'http://x.test/en/' || pair
            ELSE 'http://x.test/de/' || pair END AS page_url,
       CAST(2 AS INTEGER) AS n_alternates,
       'http://x.test/de/' || pair AS cluster_key,
       side = 1 AS is_canonical
FROM d
"""


# --------------------------------------------------------------------------
# url_blocklist — pre-fetch category gate (UT1 / RefinedWeb style)
# --------------------------------------------------------------------------

_BLOCK_DOMAINS = {"example.com": "ads", "tracker.io": "tracking"}
_BLOCK_KEYWORDS = {"casino": "gambling"}


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL category over a mixed corpus: blocked registrable domains
    (subdomains of example.com / tracker.io), a path keyword (casino),
    and clean hosts; domain verdicts win over keyword hits (doc%7==0 AND
    doc%5==0 rows prove the precedence)."""
    doc = F.col("doc_id")
    host = (
        F.when(doc % 7 == 0, F.lit("ads.example.com"))
        .when(doc % 7 == 1, F.lit("cdn.tracker.io"))
        .otherwise(F.concat(F.lit("ok"), (doc % 11).cast("string"),
                            F.lit(".clean.test")))
    )
    path = F.when(doc % 5 == 0, F.lit("/casino/page")).otherwise(F.lit("/p"))
    url = F.concat(F.lit("http://"), host, path, F.lit("/"),
                   doc.cast("string"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), url.alias("url"))
    return d.select(
        "doc_id", "url",
        url_category(F.col("url"), _BLOCK_DOMAINS, _BLOCK_KEYWORDS)
        .alias("category"),
    )


ORACLE_URL_BLOCKLIST = """
SELECT doc_id,
       'http://' ||
       CASE WHEN doc_id % 7 = 0 THEN 'ads.example.com'
            WHEN doc_id % 7 = 1 THEN 'cdn.tracker.io'
            ELSE 'ok' || CAST(doc_id % 11 AS VARCHAR) || '.clean.test' END ||
       CASE WHEN doc_id % 5 = 0 THEN '/casino/page' ELSE '/p' END ||
       '/' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 7 = 0 THEN 'ads'
            WHEN doc_id % 7 = 1 THEN 'tracking'
            WHEN doc_id % 5 = 0 THEN 'gambling'
            ELSE 'ok' END AS category
FROM documents
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wave_bytes": q_wave_bytes,
        "hreflang_clusters": q_hreflang_clusters,
        "url_blocklist": q_url_blocklist,
        "robots_meta_gate": q_robots_meta_gate,
        "phash_incremental": q_phash_incremental,
        "frontier_health": q_frontier_health,
        "robots_fetch_policy": q_robots_fetch_policy,
        "sitemap_index": q_sitemap_index,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "wave_bytes": ORACLE_WAVE_BYTES,
        "hreflang_clusters": ORACLE_HREFLANG,
        "url_blocklist": ORACLE_URL_BLOCKLIST,
        "robots_meta_gate": ORACLE_ROBOTS_META,
        "phash_incremental": ORACLE_PHASH_INCREMENTAL,
        "frontier_health": ORACLE_FRONTIER_HEALTH,
        "robots_fetch_policy": ORACLE_ROBOTS_POLICY,
        "sitemap_index": ORACLE_SITEMAP_INDEX,
    }


# --------------------------------------------------------------------------
# robots_meta_gate — page-level robots directives drive store/expand gating
# --------------------------------------------------------------------------

def q_robots_meta_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-meta + X-Robots-Tag gating over a 4-shape corpus: generic
    noindex,nofollow / bot-specific override (specific tag REPLACES the
    generic one, directives are not merged) / meta-less with an
    occasional noarchive header / content="none" shorthand.  Every page
    carries 3 outlinks, one rel=nofollow; pages under page-level
    nofollow expand 0 links, others 2."""
    from .robots import nofollow_outlinks, robots_meta_directives

    doc = F.col("doc_id")
    s = doc.cast("string")
    meta = (
        F.when(doc % 4 == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(doc % 4 == 1,
              F.lit('<meta name="crawlspark" content="noindex">'
                    '<meta name="robots" content="nofollow">'))
        .when(doc % 4 == 2, F.lit(""))
        .otherwise(F.lit('<meta name="robots" content="none">'))
    )
    links = F.concat(
        F.lit('<a href="/n/'), s, F.lit('a">x</a>'),
        F.lit('<a rel="nofollow" href="/n/'), s, F.lit('b">y</a>'),
        F.lit('<a href="/n/'), s, F.lit('c">z</a>'),
    )
    body = F.concat(F.lit("<html><head>"), meta, F.lit("</head><body>"),
                    links, F.lit("</body></html>"))
    header = F.when(doc % 6 == 0, F.lit("noarchive"))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), header.alias("xrt")
    )
    dirs = robots_meta_directives(F.col("body"), F.col("xrt"))
    all_links = F.regexp_extract_all(
        F.col("body"), F.lit(r'(?i)<a\s[^>]*href\s*=\s*"([^"]*)"'), 1
    )
    nf = nofollow_outlinks(F.col("body"))
    n_follow = F.when(
        dirs["nofollow"], F.lit(0)
    ).otherwise(F.size(F.array_except(all_links, nf))).cast("int")
    return d.select(
        "doc_id",
        dirs["noindex"].alias("noindex"),
        dirs["nofollow"].alias("nofollow"),
        dirs["noarchive"].alias("noarchive"),
        (~dirs["noindex"]).alias("stored"),
        n_follow.alias("n_follow_links"),
    )


ORACLE_ROBOTS_META = """
WITH d AS (
  SELECT doc_id,
         CAST(doc_id % 4 AS INTEGER) AS shape,
         doc_id % 6 = 0 AS has_hdr
  FROM documents
)
SELECT doc_id,
       shape IN (0, 1, 3) AS noindex,
       shape IN (0, 3) AS nofollow,
       has_hdr AS noarchive,
       NOT (shape IN (0, 1, 3)) AS stored,
       CAST(CASE WHEN shape IN (0, 3) THEN 0 ELSE 2 END AS INTEGER)
         AS n_follow_links
FROM d
"""


# --------------------------------------------------------------------------
# phash_incremental — standing image LSH index probed by a new crawl batch
# --------------------------------------------------------------------------

def q_phash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image near-dup: the archive's phash band index stands;
    the new batch (planted flipped copies of every doc%5==0 image, same
    fixture arithmetic as q:image_near_dup) bands only itself and probes
    the index.  Expected pairs = exactly the planted (dup-d, img-d) set
    — identical to the batch operator's answer, through the incremental
    path."""
    from . import images as _images

    imgs = _images.generate_images(spark, sf_dir).select("image_id", "phash")
    d = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long")
    copies = (
        imgs.filter(d % 5 == 0)
        .select(F.col("phash"), d.alias("d"))
        .withColumn("p1", (F.col("d") % 64).cast("int"))
        .withColumn("p2", ((F.col("p1") + 1 + (F.col("d") % 63).cast("int"))
                           % 64).cast("int"))
        .select(
            F.concat(F.lit("dup-"), F.col("d").cast("string"))
             .alias("image_id"),
            F.col("phash").bitwiseXOR(
                F.expr("shiftleft(CAST(1 AS BIGINT), p1)").bitwiseXOR(
                    F.when(
                        F.col("d") % 2 == 1,
                        F.expr("shiftleft(CAST(1 AS BIGINT), p2)"),
                    ).otherwise(F.lit(0).cast("long"))
                )
            ).alias("phash"),
        )
    )
    index = _images.phash_band_index(imgs, max_dist=6)
    pairs = _images.phash_incremental_pairs(index, copies, max_dist=6)
    return pairs.select("id_a", "id_b",
                        F.col("hamming").cast("long").alias("hamming"))


ORACLE_PHASH_INCREMENTAL = """
SELECT 'dup-' || CAST(doc_id AS VARCHAR) AS id_a,
       'img-' || CAST(doc_id AS VARCHAR) AS id_b,
       CAST(1 + doc_id % 2 AS BIGINT) AS hamming
FROM documents WHERE doc_id % 5 = 0
"""


# --------------------------------------------------------------------------
# frontier_health — per-host ops rollup (backlog, age, starvation)
# --------------------------------------------------------------------------

_HEALTH_NOW = 1_000_000


def q_frontier_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frontier_health over a 19-host synthetic backlog with enqueue ages
    up to ~200k s (starvation threshold 86400 s) — ONE map-side-combined
    aggregate, SQL-replayed."""
    from .scheduler import frontier_health

    doc = F.col("doc_id")
    frontier = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 19).cast("string")).alias("host"),
        (F.lit(_HEALTH_NOW) - (doc * 131) % 200_000).cast("long")
        .alias("enqueued_ts"),
        ((doc * 7) % 1000).cast("long").alias("priority"),
    )
    return frontier_health(frontier, now_ts=_HEALTH_NOW)


ORACLE_FRONTIER_HEALTH = f"""
WITH f AS (
  SELECT 'h' || CAST(doc_id % 19 AS VARCHAR) AS host,
         {_HEALTH_NOW} - (doc_id * 131) % 200000 AS enqueued_ts,
         (doc_id * 7) % 1000 AS priority
  FROM documents
),
agg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS backlog,
         CAST(MIN(enqueued_ts) AS BIGINT) AS oldest,
         CAST(SUM(priority) AS BIGINT) AS psum
  FROM f GROUP BY host
)
SELECT host, backlog,
       CAST({_HEALTH_NOW} - oldest AS BIGINT) AS oldest_age_s,
       CAST(psum // backlog AS BIGINT) AS mean_priority,
       {_HEALTH_NOW} - oldest > 86400 AS starved
FROM agg
"""


# --------------------------------------------------------------------------
# robots_fetch_policy — RFC 9309 §2.3.1 outcome handling
# --------------------------------------------------------------------------

def q_robots_fetch_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective robots policy per fetch outcome: 200/301/404/403/500/
    network-error statuses crossed with an occasional cached copy —
    unavailable (4xx, incl. 403) allows all, unreachable (5xx/error)
    disallows all unless a <30-day cached copy exists."""
    from .robots import robots_fetch_policy

    doc = F.col("doc_id")
    status = (
        F.when(doc % 6 == 0, 200).when(doc % 6 == 1, 301)
        .when(doc % 6 == 2, 404).when(doc % 6 == 3, 403)
        .when(doc % 6 == 4, 500).otherwise(0)
    ).cast("int")
    cache_age = F.when(doc % 2 == 0,
                       ((doc * 977) % 5_000_000).cast("long"))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), status.alias("status"),
        cache_age.alias("cache_age_s"),
    )
    return d.select(
        "doc_id", "status", "cache_age_s",
        robots_fetch_policy(F.col("status"), F.col("cache_age_s"))
        .alias("policy"),
    )


ORACLE_ROBOTS_POLICY = """
WITH d AS (
  SELECT doc_id,
         CAST(CASE CAST(doc_id % 6 AS INTEGER)
           WHEN 0 THEN 200 WHEN 1 THEN 301 WHEN 2 THEN 404
           WHEN 3 THEN 403 WHEN 4 THEN 500 ELSE 0 END AS INTEGER) AS status,
         CASE WHEN doc_id % 2 = 0 THEN (doc_id * 977) % 5000000 END
           AS cache_age_s
  FROM documents
)
SELECT doc_id, status, cache_age_s,
       CASE WHEN status >= 200 AND status < 300 THEN 'parse'
            WHEN status >= 300 AND status < 400 THEN 'follow_redirect'
            WHEN status >= 400 AND status < 500 THEN 'allow_all'
            WHEN cache_age_s IS NOT NULL AND cache_age_s < 2592000
              THEN 'use_cached'
            ELSE 'disallow_all' END AS policy
FROM d
"""


# --------------------------------------------------------------------------
# sitemap_index — two-level sitemapindex -> child sitemap -> page URLs
# --------------------------------------------------------------------------

def q_sitemap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-index recursion as ONE corpus equi-join (no driver loop):
    every 10th doc is a <sitemapindex> listing the next two docs' child
    sitemaps; children are <urlset> docs with two page locs.  Children
    past the corpus edge simply don't join (inner-join semantics, the
    oracle bounds them the same way)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    sm_url = F.concat(F.lit("http://sm.test/s"), s, F.lit(".xml"))
    child1 = F.concat(F.lit("http://sm.test/s"), (doc + 1).cast("string"),
                      F.lit(".xml"))
    child2 = F.concat(F.lit("http://sm.test/s"), (doc + 2).cast("string"),
                      F.lit(".xml"))
    idx_body = F.concat(
        F.lit("<sitemapindex><sitemap><loc>"), child1,
        F.lit("</loc></sitemap><sitemap><loc>"), child2,
        F.lit("</loc></sitemap></sitemapindex>"),
    )
    child_body = F.concat(
        F.lit("<urlset><url><loc>http://p.test/p"), s,
        F.lit("a</loc></url><url><loc>http://p.test/p"), s,
        F.lit("b</loc></url></urlset>"),
    )
    corpus = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), sm_url.alias("sm_url"),
        idx_body.alias("idx_body"), child_body.alias("child_body"),
    )
    indexes = corpus.filter(doc % 10 == 0).select(
        F.col("sm_url").alias("index_url"),
        F.explode(
            F.regexp_extract_all(
                F.col("idx_body"),
                F.lit(r"(?s)<sitemap>\s*<loc>\s*(.*?)\s*</loc>"), 1)
        ).alias("child_url"),
    )
    children = corpus.select(
        F.col("sm_url").alias("child_url"), F.col("child_body")
    )
    from .extract import sitemap_locs_xpath

    resolved = indexes.join(children, "child_url")
    return resolved.select(
        "index_url", "child_url",
        F.explode(sitemap_locs_xpath(F.col("child_body"))).alias("page_url"),
    )


ORACLE_SITEMAP_INDEX = """
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
idx AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
pairs AS (
  SELECT i.doc_id AS idoc, i.doc_id + k.k AS cdoc
  FROM idx i CROSS JOIN (VALUES (1), (2)) AS k(k), mx
  WHERE i.doc_id + k.k <= mx.m
),
locs AS (
  SELECT idoc, cdoc, s.suffix
  FROM pairs CROSS JOIN (VALUES ('a'), ('b')) AS s(suffix)
)
SELECT 'http://sm.test/s' || CAST(idoc AS VARCHAR) || '.xml' AS index_url,
       'http://sm.test/s' || CAST(cdoc AS VARCHAR) || '.xml' AS child_url,
       'http://p.test/p' || CAST(cdoc AS VARCHAR) || suffix AS page_url
FROM locs
"""
