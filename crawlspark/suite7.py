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
    }


def oracle_sql() -> dict[str, str]:
    return {
        "wave_bytes": ORACLE_WAVE_BYTES,
        "hreflang_clusters": ORACLE_HREFLANG,
        "url_blocklist": ORACLE_URL_BLOCKLIST,
        "robots_meta_gate": ORACLE_ROBOTS_META,
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
