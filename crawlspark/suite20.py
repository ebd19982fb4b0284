"""Round-2 continuation queries, part 18: sitemap-vs-crawl coverage
gap, keep-alive connection churn, link-exchange detection.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# coverage_gap — sitemap declarations vs what actually got crawled
# --------------------------------------------------------------------------

def q_coverage_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer accounting of a host's sitemap vs its crawl results:
    declared-and-crawled, declared-never-crawled (the crawl misses the
    site advertises), crawled-but-undeclared (discovered via links only
    — the site's sitemap is stale).  One full-outer join on url."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    url = F.concat(F.lit("http://s.test/p/"), s)
    sitemap = _docs(spark, sf_dir).filter(doc % 7 != 3).select(
        url.alias("url")
    )
    crawled = _docs(spark, sf_dir).filter(doc % 5 != 0).select(
        url.alias("url")
    )
    j = sitemap.withColumn("__s", F.lit(True)).join(
        crawled.withColumn("__c", F.lit(True)), "url", "full_outer"
    )
    status = (
        F.when(F.col("__s").isNotNull() & F.col("__c").isNotNull(),
               F.lit("both"))
        .when(F.col("__s").isNotNull(), F.lit("declared_only"))
        .otherwise(F.lit("crawled_only"))
    )
    return j.select("url", status.alias("status"))


ORACLE_COVERAGE_GAP = """
SELECT 'http://s.test/p/' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 7 <> 3 AND doc_id % 5 <> 0 THEN 'both'
            WHEN doc_id % 7 <> 3 THEN 'declared_only'
            ELSE 'crawled_only' END AS status
FROM documents
WHERE doc_id % 7 <> 3 OR doc_id % 5 <> 0
"""


# --------------------------------------------------------------------------
# keepalive — connection-churn estimate from the wave schedule
# --------------------------------------------------------------------------

def q_keepalive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keepalive_connections at a 5 s timeout over a synthetic
    schedule: hosts whose politeness gap exceeds keep-alive churn a
    connection per fetch (1000 permille), tightly-paced hosts reuse
    one."""
    from .politeness import keepalive_connections

    doc = F.col("doc_id")
    # hosts h0..h3: 1 s gaps (reuse); h4..h7: 9 s gaps (churn)
    host_id = doc % 8
    seq = F.expr("doc_id div 8")
    gap_ms = F.when(host_id <= 3, 1_000).otherwise(9_000)
    start = (seq * (gap_ms + 500)).cast("long")
    sched = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), host_id.cast("string")).alias("host"),
        start.alias("fetch_start_ms"),
        (start + 500).cast("long").alias("fetch_end_ms"),
    )
    return keepalive_connections(sched, keepalive_ms=5_000)


ORACLE_KEEPALIVE = """
WITH s AS (
  SELECT 'h' || CAST(doc_id % 8 AS VARCHAR) AS host,
         (doc_id // 8) *
           (CASE WHEN doc_id % 8 <= 3 THEN 1000 ELSE 9000 END + 500)
           AS st
  FROM documents
),
g AS (
  SELECT host, st,
         LAG(st + 500) OVER (PARTITION BY host ORDER BY st) AS prev_end
  FROM s
),
n AS (
  SELECT host,
         CASE WHEN prev_end IS NULL OR st - prev_end > 5000
              THEN 1 ELSE 0 END AS nc
  FROM g
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(nc) AS BIGINT) AS n_connections,
       CAST((1000 * SUM(nc)) // COUNT(*) AS BIGINT) AS churn_permille
FROM n GROUP BY host
"""


# --------------------------------------------------------------------------
# link_exchange — reciprocal linking schemes at host granularity
# --------------------------------------------------------------------------

def q_link_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect_link_exchange over a host graph: the (x0, x1) pair trades
    symmetric heavy traffic (~100 edges each way), (c, d) sits exactly
    at the 5-edge floor with perfect symmetry (flags — the boundary is
    inclusive), and the heavy one-way (a -> b) pair never reaches the
    output at all (no reverse direction, the inner join drops it)."""
    from .linkgraph import detect_link_exchange

    doc = F.col("doc_id")
    src = (
        F.when(doc % 10 <= 1, F.lit("x0")).when(doc % 10 <= 3, F.lit("x1"))
        .when(doc % 10 <= 6, F.lit("a"))
        .when(doc % 10 == 7, F.lit("c")).otherwise(F.lit("d"))
    )
    dst = (
        F.when(doc % 10 <= 1, F.lit("x1")).when(doc % 10 <= 3, F.lit("x0"))
        .when(doc % 10 <= 6, F.lit("b"))
        .when((doc % 10 == 7) & (doc % 100 != 7), F.lit("z"))
        .when(doc % 10 == 7, F.lit("d"))
        .when((doc % 10 > 7) & (doc % 100 != 98), F.lit("z"))
        .otherwise(F.lit("c"))
    )
    edges = _docs(spark, sf_dir).select(
        src.alias("src_host"), dst.alias("dst_host")
    )
    return detect_link_exchange(edges)


ORACLE_LINK_EXCHANGE = """
WITH e AS (
  SELECT CASE WHEN doc_id % 10 <= 1 THEN 'x0'
              WHEN doc_id % 10 <= 3 THEN 'x1'
              WHEN doc_id % 10 <= 6 THEN 'a'
              WHEN doc_id % 10 = 7 THEN 'c' ELSE 'd' END AS s,
         CASE WHEN doc_id % 10 <= 1 THEN 'x1'
              WHEN doc_id % 10 <= 3 THEN 'x0'
              WHEN doc_id % 10 <= 6 THEN 'b'
              WHEN doc_id % 10 = 7 AND doc_id % 100 <> 7 THEN 'z'
              WHEN doc_id % 10 = 7 THEN 'd'
              WHEN doc_id % 10 > 7 AND doc_id % 100 <> 98 THEN 'z'
              ELSE 'c' END AS d
  FROM documents
),
pair AS (
  SELECT s, d, CAST(COUNT(*) AS BIGINT) AS n
  FROM e WHERE s <> d GROUP BY s, d
),
j AS (
  SELECT p.s, p.d, p.n, r.n AS n_rev
  FROM pair p JOIN pair r ON p.s = r.d AND p.d = r.s
  WHERE p.s < p.d
)
SELECT s AS host_a, d AS host_b, n AS a_to_b, n_rev AS b_to_a,
       CAST((1000 * LEAST(n, n_rev)) // GREATEST(n, n_rev) AS BIGINT)
         AS symmetry_permille,
       n >= 5 AND n_rev >= 5
         AND (1000 * LEAST(n, n_rev)) // GREATEST(n, n_rev) >= 800
         AS exchange
FROM j
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "coverage_gap": q_coverage_gap,
        "keepalive": q_keepalive,
        "link_exchange": q_link_exchange,
        "harvest_roi": q_harvest_roi,
        "bpe_fertility": q_bpe_fertility,
        "split_leakage": q_split_leakage,
        "url_decontamination": q_url_decontamination,
        "robots_size_cap": q_robots_size_cap,
        "mime_consistency": q_mime_consistency,
        "sitemap_videos": q_sitemap_videos,
        "podcast_enclosures": q_podcast_enclosures,
        "media_frontier": q_media_frontier,
        "cas_gc": q_cas_gc,
        "spam_propagation": q_spam_propagation,
        "pagerank_warm": q_pagerank_warm,
        "seen_hit_rate": q_seen_hit_rate,
        "declared_charset": q_declared_charset,
        "data_uri_images": q_data_uri_images,
        "paginate_synthesis": q_paginate_synthesis,
        "picture_source": q_picture_source,
        "open_redirects": q_open_redirects,
        "lazy_images": q_lazy_images,
        "shard_integrity": q_shard_integrity,
        "snippets": q_snippets,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "coverage_gap": ORACLE_COVERAGE_GAP,
        "keepalive": ORACLE_KEEPALIVE,
        "link_exchange": ORACLE_LINK_EXCHANGE,
        "harvest_roi": ORACLE_HARVEST_ROI,
        "bpe_fertility": _oracle_bpe_fertility(),
        "split_leakage": ORACLE_SPLIT_LEAKAGE,
        "url_decontamination": ORACLE_URL_DECON,
        "robots_size_cap": ORACLE_ROBOTS_SIZE_CAP,
        "mime_consistency": ORACLE_MIME_CONSISTENCY,
        "sitemap_videos": ORACLE_SITEMAP_VIDEOS,
        "podcast_enclosures": ORACLE_PODCAST_ENCLOSURES,
        "media_frontier": ORACLE_MEDIA_FRONTIER,
        "cas_gc": ORACLE_CAS_GC,
        "spam_propagation": ORACLE_SPAM_PROPAGATION,
        "pagerank_warm": _oracle_pagerank_warm(),
        "seen_hit_rate": ORACLE_SEEN_HIT_RATE,
        "declared_charset": ORACLE_DECLARED_CHARSET,
        "data_uri_images": ORACLE_DATA_URI,
        "paginate_synthesis": ORACLE_PAGINATE_SYNTH,
        "picture_source": ORACLE_PICTURE_SOURCE,
        "open_redirects": ORACLE_OPEN_REDIRECTS,
        "lazy_images": ORACLE_LAZY_IMAGES,
        "shard_integrity": ORACLE_SHARD_INTEGRITY,
        "snippets": ORACLE_SNIPPETS,
    }


# --------------------------------------------------------------------------
# harvest_roi — value per fetch by host (caption pairs per kilofetch)
# --------------------------------------------------------------------------

def q_harvest_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-budget ROI: per host, fetches spent vs caption pairs
    harvested -> pairs per 1000 fetches — the number that reorders
    host budgets next wave (a host yielding nothing per fetch is
    politeness budget burned).  Fixture: galleries (doc%4==0 hosts
    yield 3 pairs/fetch), articles (1), link hubs (0)."""
    doc = F.col("doc_id")
    host = F.concat(F.lit("h"), (doc % 12).cast("string"))
    pairs = (
        F.when(doc % 12 < 4, 3).when(doc % 12 < 8, 1).otherwise(0)
    )
    fetches = _docs(spark, sf_dir).select(
        host.alias("host"), pairs.cast("long").alias("n_pairs")
    )
    agg = fetches.groupBy("host").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum("n_pairs").cast("long").alias("n_pairs"),
    )
    return agg.select(
        "host", "n_fetches", "n_pairs",
        F.expr("(1000 * n_pairs) div n_fetches").cast("long")
        .alias("pairs_per_kilofetch"),
    )


ORACLE_HARVEST_ROI = """
WITH f AS (
  SELECT 'h' || CAST(doc_id % 12 AS VARCHAR) AS host,
         CASE WHEN doc_id % 12 < 4 THEN 3
              WHEN doc_id % 12 < 8 THEN 1 ELSE 0 END AS n_pairs
  FROM documents
),
a AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
         CAST(SUM(n_pairs) AS BIGINT) AS n_pairs
  FROM f GROUP BY host
)
SELECT host, n_fetches, n_pairs,
       CAST((1000 * n_pairs) // n_fetches AS BIGINT)
         AS pairs_per_kilofetch
FROM a
"""


# --------------------------------------------------------------------------
# bpe_fertility — chars per BPE token by language slice
# --------------------------------------------------------------------------

def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: chars div BPE tokens per lang
    slice (milli-chars-per-token) under the frozen merge table — the
    multilingual-tokenizer health metric (a language with low fertility
    pays more tokens per character of content, skewing compute and
    context budgets).  Composes the frozen-table encoder with a
    two-level aggregation."""
    from .suite5 import _BPE_ROUNDS, FROZEN_MERGES
    from .textops.bpe import bpe_encode_col

    toks = bpe_encode_col(F.col("text"), FROZEN_MERGES, rounds=_BPE_ROUNDS)
    d = _docs(spark, sf_dir).select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_toks"),
    )
    return d.groupBy("lang").agg(
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.expr("(1000 * sum(n_chars)) div sum(n_toks)").cast("long")
        .alias("milli_chars_per_token"),
    )


def _oracle_bpe_fertility() -> str:
    from .suite5 import _BPE_ROUNDS, FROZEN_MERGES
    from .textops.bpe import bpe_encode_oracle_sql

    expr = bpe_encode_oracle_sql("text", FROZEN_MERGES, rounds=_BPE_ROUNDS)
    return f"""
WITH t AS (
  SELECT lang, length(text) AS n_chars, len({expr}) AS n_toks
  FROM documents
)
SELECT lang,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST((1000 * SUM(n_chars)) // SUM(n_toks) AS BIGINT)
         AS milli_chars_per_token
FROM t GROUP BY lang
"""


# --------------------------------------------------------------------------
# split_leakage — near-dup pairs straddling train/test splits
# --------------------------------------------------------------------------

def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-hygiene check the split alone can't give you: near-dup
    PAIRS whose members landed in different splits leak training
    signal into eval.  Planted pairs (doc, doc+1 for doc%6==0) cross
    the hash-split boundary whenever the salt assigns the two ids
    different splits; the report counts pairs per (split_a, split_b)
    combination — the (train, test) row is the leak to fix by
    moving WHOLE dedup clusters, not documents, between splits."""
    from .textops.curate import train_val_test_split

    doc = F.col("doc_id")
    ids = _docs(spark, sf_dir).select("doc_id")
    split = train_val_test_split(ids).select("doc_id", "split")
    pairs = _docs(spark, sf_dir).filter(doc % 6 == 0).select(
        doc.alias("id_a"), (doc + 1).alias("id_b")
    ).join(ids.select(F.col("doc_id").alias("id_b")), "id_b", "semi")
    a = split.select(F.col("doc_id").alias("id_a"),
                     F.col("split").alias("split_a"))
    b = split.select(F.col("doc_id").alias("id_b"),
                     F.col("split").alias("split_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    return j.groupBy("split_a", "split_b").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


ORACLE_SPLIT_LEAKAGE = """
WITH s AS (
  SELECT doc_id,
         CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id,
               CAST(('0x' || substr(md5('split1' ||
                 CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS b
        FROM documents)
),
p AS (
  SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents
  WHERE doc_id % 6 = 0
    AND doc_id + 1 IN (SELECT doc_id FROM documents)
)
SELECT sa.split AS split_a, sb.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p JOIN s sa ON sa.doc_id = p.id_a
       JOIN s sb ON sb.doc_id = p.id_b
GROUP BY sa.split, sb.split
"""


# --------------------------------------------------------------------------
# url_decontamination — eval-set URL overlap removal accounting
# --------------------------------------------------------------------------

def q_url_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level decontamination (the cheap first pass before the
    n-gram overlap check): canonical training URLs anti-joined against
    the eval set's source URLs; the report keeps counts honest —
    every 13th training URL is an eval source and must drop."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    train = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("http://corpus.test/d/"), s).alias("url"),
    )
    evalset = _docs(spark, sf_dir).filter(doc % 13 == 0).select(
        F.concat(F.lit("http://corpus.test/d/"), s).alias("url")
    )
    kept = train.join(evalset, "url", "left_anti")
    return kept.select("doc_id", "url")


ORACLE_URL_DECON = """
SELECT doc_id, 'http://corpus.test/d/' || CAST(doc_id AS VARCHAR) AS url
FROM documents WHERE doc_id % 13 <> 0
"""


# --------------------------------------------------------------------------
# robots_size_cap — RFC 9309 oversized-robots truncation
# --------------------------------------------------------------------------

def q_robots_size_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cap_robots_body at a 40-byte cap (fixture-scaled stand-in for
    the 500 KiB spec floor) composed into the robots parser: the
    in-cap Disallow survives, the rule starting past the cap vanishes,
    and the cut backs up to the last newline so no half-directive
    parses as a shorter (wrong) rule."""
    from .robots import cap_robots_body, parse_robots_txt

    doc = F.col("doc_id")
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /keep"), (doc % 9).cast("string"),
        F.lit("\nDisallow: /dropped-rule-"), doc.cast("string"),
        F.lit("\n"),
    )
    texts = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), doc.cast("string")).alias("host"),
        cap_robots_body(body, cap_bytes=40).alias("body"),
    )
    rules = parse_robots_txt(texts)
    return rules.select(
        "host", "user_agent",
        F.concat_ws("|", F.col("disallow_prefixes")).alias("disallow"),
    )


ORACLE_ROBOTS_SIZE_CAP = """
SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
       '*' AS user_agent,
       '/keep' || CAST(doc_id % 9 AS VARCHAR) AS disallow
FROM documents
"""


# --------------------------------------------------------------------------
# mime_consistency — extension vs Content-Type vs magic bytes
# --------------------------------------------------------------------------

def q_mime_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-source MIME consensus per fetched object: URL extension,
    declared Content-Type, magic-byte sniff — 2-of-3 majority names the
    outlier source; three-way disagreement is a conflict row routed to
    quarantine.  Four fixture shapes exercise each outcome."""
    doc = F.col("doc_id")
    v = doc % 4
    ext = F.when(v == 3, F.lit("png")).otherwise(F.lit("jpeg"))
    declared = F.when(v == 1, F.lit("webp")).otherwise(
        F.when(v == 3, F.lit("gif")).otherwise(F.lit("jpeg")))
    sniffed = F.when(v == 2, F.lit("png")).otherwise(
        F.when(v == 3, F.lit("webp")).otherwise(F.lit("jpeg")))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), ext.alias("ext_type"),
        declared.alias("declared_type"), sniffed.alias("sniffed_type"),
    )
    e, c, s = (F.col("ext_type"), F.col("declared_type"),
               F.col("sniffed_type"))
    consensus = (
        F.when((e == c) & (c == s), e)
        .when(e == c, e).when(c == s, c).when(e == s, e)
        .otherwise(F.lit("conflict"))
    )
    outlier = (
        F.when((e == c) & (c == s), F.lit(None).cast("string"))
        .when(e == c, F.lit("sniffed"))
        .when(c == s, F.lit("ext"))
        .when(e == s, F.lit("declared"))
    )
    return d.select(
        "doc_id", "ext_type", "declared_type", "sniffed_type",
        consensus.alias("consensus"), outlier.alias("outlier"),
    )


ORACLE_MIME_CONSISTENCY = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 3 THEN 'png' ELSE 'jpeg' END AS ext_type,
       CASE WHEN doc_id % 4 = 1 THEN 'webp'
            WHEN doc_id % 4 = 3 THEN 'gif' ELSE 'jpeg' END
         AS declared_type,
       CASE WHEN doc_id % 4 = 2 THEN 'png'
            WHEN doc_id % 4 = 3 THEN 'webp' ELSE 'jpeg' END
         AS sniffed_type,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'jpeg' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'jpeg'
         ELSE 'conflict' END AS consensus,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 1 THEN 'declared' WHEN 2 THEN 'sniffed' END AS outlier
FROM documents
"""


# --------------------------------------------------------------------------
# sitemap_videos — video-sitemap extension entries
# --------------------------------------------------------------------------

def q_sitemap_videos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sitemap_video_entries over sitemaps with one video per page plus
    a second two-video page on even docs (variable per-page counts are
    the alignment hazard, as with image sitemaps)."""
    from .extract import sitemap_video_entries

    doc = F.col("doc_id")
    s = doc.cast("string")
    p1 = F.concat(F.lit("http://v.test/w"), s)
    block1 = F.concat(
        F.lit("<url><loc>"), p1,
        F.lit("</loc><video:video><video:content_loc>http://m.test/v"), s,
        F.lit(".mp4</video:content_loc><video:title>t"),
        (doc % 13).cast("string"),
        F.lit("</video:title><video:duration>"),
        (F.lit(30) + doc % 600).cast("string"),
        F.lit("</video:duration></video:video></url>"),
    )
    p2 = F.concat(F.lit("http://v.test/x"), s)
    block2 = F.when(doc % 2 == 0, F.concat(
        F.lit("<url><loc>"), p2, F.lit("</loc>"),
        F.lit("<video:video><video:content_loc>http://m.test/a"), s,
        F.lit(".mp4</video:content_loc><video:title>a</video:title>"
              "<video:duration>60</video:duration></video:video>"),
        F.lit("<video:video><video:content_loc>http://m.test/b"), s,
        F.lit(".mp4</video:content_loc><video:title>b</video:title>"
              "<video:duration>90</video:duration></video:video></url>"),
    )).otherwise(F.lit(""))
    body = F.concat(F.lit("<urlset>"), block1, block2, F.lit("</urlset>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id",
        F.explode(sitemap_video_entries(F.col("body"))).alias("e"),
    ).select(
        "doc_id",
        F.col("e.page_url").alias("page_url"),
        F.col("e.video_url").alias("video_url"),
        F.col("e.title").alias("title"),
        F.col("e.duration_s").alias("duration_s"),
    )


ORACLE_SITEMAP_VIDEOS = """
SELECT doc_id,
       'http://v.test/w' || CAST(doc_id AS VARCHAR) AS page_url,
       'http://m.test/v' || CAST(doc_id AS VARCHAR) || '.mp4' AS video_url,
       't' || CAST(doc_id % 13 AS VARCHAR) AS title,
       CAST(30 + doc_id % 600 AS BIGINT) AS duration_s
FROM documents
UNION ALL
SELECT doc_id, 'http://v.test/x' || CAST(doc_id AS VARCHAR),
       'http://m.test/a' || CAST(doc_id AS VARCHAR) || '.mp4', 'a',
       CAST(60 AS BIGINT)
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 'http://v.test/x' || CAST(doc_id AS VARCHAR),
       'http://m.test/b' || CAST(doc_id AS VARCHAR) || '.mp4', 'b',
       CAST(90 AS BIGINT)
FROM documents WHERE doc_id % 2 = 0
"""


# --------------------------------------------------------------------------
# podcast_enclosures — RSS media payloads
# --------------------------------------------------------------------------

def q_podcast_enclosures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """feed_enclosures over podcast-style RSS: one audio enclosure per
    item (type/length declared), plus an enclosure-less item every 3rd
    doc that contributes nothing."""
    from .extract import feed_enclosures

    doc = F.col("doc_id")
    s = doc.cast("string")
    item1 = F.concat(
        F.lit("<item><link>http://p.test/ep"), s,
        F.lit('</link><enclosure url="http://cdn.test/ep'), s,
        F.lit('.mp3" type="audio/mpeg" length="'),
        (F.lit(1_000_000) + (doc % 97) * 1000).cast("string"),
        F.lit('"/></item>'),
    )
    item2 = F.when(doc % 3 == 0, F.concat(
        F.lit("<item><link>http://p.test/note"), s,
        F.lit("</link><title>no media</title></item>"))).otherwise(F.lit(""))
    body = F.concat(F.lit("<rss><channel>"), item1, item2,
                    F.lit("</channel></rss>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", F.explode(feed_enclosures(F.col("body"))).alias("e")
    ).select(
        "doc_id",
        F.col("e.item_url").alias("item_url"),
        F.col("e.media_url").alias("media_url"),
        F.col("e.media_type").alias("media_type"),
        F.col("e.length_bytes").alias("length_bytes"),
    )


ORACLE_PODCAST_ENCLOSURES = """
SELECT doc_id,
       'http://p.test/ep' || CAST(doc_id AS VARCHAR) AS item_url,
       'http://cdn.test/ep' || CAST(doc_id AS VARCHAR) || '.mp3'
         AS media_url,
       'audio/mpeg' AS media_type,
       CAST(1000000 + (doc_id % 97) * 1000 AS BIGINT) AS length_bytes
FROM documents
"""


# --------------------------------------------------------------------------
# media_frontier — unified media discovery across all source channels
# --------------------------------------------------------------------------

def q_media_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified media frontier: image-sitemap entries, video-sitemap
    entries and podcast enclosures union into one (media_url, kind,
    page_url, est_bytes, priority) relation — images carry no declared
    size (estimated at the corpus default), videos estimate from
    duration, enclosures declare bytes exactly; a media URL discovered
    through MULTIPLE channels keeps one row (the byte-richest source
    wins: enclosure > video > image).  This is the relation
    select_wave_by_bytes consumes for the payload crawl."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    # images: every doc; videos: doc%2==0; enclosures: doc%3==0.
    # doc%6==0 URLs appear in BOTH video sitemap and enclosure channels.
    img = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://m.test/i"), s, F.lit(".jpg"))
        .alias("media_url"),
        F.lit("image").alias("kind"),
        F.concat(F.lit("http://v.test/p"), s).alias("page_url"),
        F.lit(200_000).cast("long").alias("est_bytes"),
        F.lit(1).alias("rank_src"),
    )
    vid = _docs(spark, sf_dir).filter(doc % 2 == 0).select(
        F.concat(F.lit("http://m.test/av"), s, F.lit(".mp4"))
        .alias("media_url"),
        F.lit("video").alias("kind"),
        F.concat(F.lit("http://v.test/p"), s).alias("page_url"),
        ((F.lit(30) + doc % 600) * 250_000).cast("long").alias("est_bytes"),
        F.lit(2).alias("rank_src"),
    )
    enc = _docs(spark, sf_dir).filter(doc % 3 == 0).select(
        F.when(doc % 6 == 0,
               F.concat(F.lit("http://m.test/av"), s, F.lit(".mp4")))
        .otherwise(F.concat(F.lit("http://m.test/pod"), s, F.lit(".mp3")))
        .alias("media_url"),
        F.when(doc % 6 == 0, F.lit("video")).otherwise(F.lit("audio"))
        .alias("kind"),
        F.concat(F.lit("http://p.test/ep"), s).alias("page_url"),
        (F.lit(900_000) + (doc % 97) * 1000).cast("long")
        .alias("est_bytes"),
        F.lit(3).alias("rank_src"),
    )
    from pyspark.sql import Window

    allm = img.unionByName(vid).unionByName(enc)
    w = Window.partitionBy("media_url")
    best = (
        allm.withColumn("n_sources", F.count("*").over(w).cast("long"))
        .withColumn(
            "__r",
            F.row_number().over(w.orderBy(F.desc("rank_src"), "page_url")),
        )
        .filter(F.col("__r") == 1)
    )
    return best.select(
        "media_url", "kind", "page_url", "est_bytes", "n_sources"
    )


ORACLE_MEDIA_FRONTIER = """
WITH img AS (
  SELECT 'http://m.test/i' || CAST(doc_id AS VARCHAR) || '.jpg' AS media_url,
         'image' AS kind,
         'http://v.test/p' || CAST(doc_id AS VARCHAR) AS page_url,
         CAST(200000 AS BIGINT) AS est_bytes, 1 AS rank_src
  FROM documents
),
vid AS (
  SELECT 'http://m.test/av' || CAST(doc_id AS VARCHAR) || '.mp4',
         'video', 'http://v.test/p' || CAST(doc_id AS VARCHAR),
         CAST((30 + doc_id % 600) * 250000 AS BIGINT), 2
  FROM documents WHERE doc_id % 2 = 0
),
enc AS (
  SELECT CASE WHEN doc_id % 6 = 0
              THEN 'http://m.test/av' || CAST(doc_id AS VARCHAR) || '.mp4'
              ELSE 'http://m.test/pod' || CAST(doc_id AS VARCHAR) || '.mp3'
         END,
         CASE WHEN doc_id % 6 = 0 THEN 'video' ELSE 'audio' END,
         'http://p.test/ep' || CAST(doc_id AS VARCHAR),
         CAST(900000 + (doc_id % 97) * 1000 AS BIGINT), 3
  FROM documents WHERE doc_id % 3 = 0
),
allm AS (
  SELECT * FROM img UNION ALL SELECT * FROM vid UNION ALL SELECT * FROM enc
),
r AS (
  SELECT media_url, kind, page_url, est_bytes,
         CAST(COUNT(*) OVER (PARTITION BY media_url) AS BIGINT)
           AS n_sources,
         ROW_NUMBER() OVER (PARTITION BY media_url
                            ORDER BY rank_src DESC, page_url) AS rn
  FROM allm
)
SELECT media_url, kind, page_url, est_bytes, n_sources
FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------------
# cas_gc — delete eligibility: retention tombstones x CAS refcounts
# --------------------------------------------------------------------------

def q_cas_gc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-condition storage GC: a payload blob is deletable only
    when EVERY capture referencing its hash is past retention — a blob
    shared by a tombstoned capture AND a live one must stay.  Composes
    retention_sweep (keep-last-2 per URL) with a per-hash all-dropped
    check; fixture shares every doc%5==0 hash across two URLs with
    different capture depths so both outcomes occur."""
    from .checkpoint import retention_sweep

    doc = F.col("doc_id")
    s = doc.cast("string")
    # URL A: 3 captures of hash H(doc); URL B (doc%5==0): 1 capture of
    # the SAME hash -> B's capture stays in retention, blocking the GC
    # of the blob even though A's oldest capture tombstones.
    caps_a = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://g.test/a/"), s).alias("url"),
        F.explode(F.array(F.lit(100), F.lit(200), F.lit(300)))
        .alias("fetch_ts"),
        F.concat(F.lit("H"), s).alias("content_hash"),
    ).select("url", F.col("fetch_ts").cast("long").alias("fetch_ts"),
             "content_hash")
    caps_b = _docs(spark, sf_dir).filter(doc % 5 == 0).select(
        F.concat(F.lit("http://g.test/b/"), s).alias("url"),
        F.lit(150).cast("long").alias("fetch_ts"),
        F.concat(F.lit("H"), s).alias("content_hash"),
    )
    swept = retention_sweep(caps_a.unionByName(caps_b), keep_last=2)
    per_hash = swept.groupBy("content_hash").agg(
        F.count("*").cast("long").alias("n_captures"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("n_live"),
    )
    return per_hash.select(
        "content_hash", "n_captures", "n_live",
        (F.col("n_live") == 0).alias("deletable"),
    )


ORACLE_CAS_GC = """
WITH caps AS (
  SELECT 'http://g.test/a/' || CAST(doc_id AS VARCHAR) AS url,
         ts.t AS fetch_ts, 'H' || CAST(doc_id AS VARCHAR) AS content_hash
  FROM documents CROSS JOIN (VALUES (100), (200), (300)) AS ts(t)
  UNION ALL
  SELECT 'http://g.test/b/' || CAST(doc_id AS VARCHAR), 150,
         'H' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 5 = 0
),
r AS (
  SELECT content_hash,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY fetch_ts DESC)
           AS capture_rank
  FROM caps
)
SELECT content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_captures,
       CAST(SUM(CASE WHEN capture_rank <= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_live,
       SUM(CASE WHEN capture_rank <= 2 THEN 1 ELSE 0 END) = 0 AS deletable
FROM r GROUP BY content_hash
"""


# --------------------------------------------------------------------------
# spam_propagation — one-hop guilt by association over host inlinks
# --------------------------------------------------------------------------

def q_spam_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank-lite, one hop: hosts receiving >= 60% of their inlinks
    from seed-spam hosts become suspects (spam networks link densely to
    each other; honest hosts get a trickle at most).  One aggregate
    over the host edge list + a broadcast seed join; fixture: victims
    v0/v1 get spam-majority inlinks, mixed/clean hosts stay below."""
    doc = F.col("doc_id")
    src = (
        F.when(doc % 10 <= 3, F.concat(F.lit("spam"),
                                       (doc % 2).cast("string")))
        .otherwise(F.concat(F.lit("ok"), (doc % 7).cast("string")))
    )
    dst = (
        F.when(doc % 10 <= 2, F.concat(F.lit("v"), (doc % 2).cast("string")))
        .when(doc % 10 == 3, F.lit("mixed"))
        .when(doc % 10 <= 6, F.lit("mixed"))
        .otherwise(F.concat(F.lit("clean"), (doc % 3).cast("string")))
    )
    edges = _docs(spark, sf_dir).select(
        src.alias("src_host"), dst.alias("dst_host")
    )
    seeds = spark.createDataFrame([("spam0",), ("spam1",)], "host STRING")
    tagged = edges.join(
        F.broadcast(seeds.select(F.col("host").alias("src_host"),
                                 F.lit(True).alias("__spam"))),
        "src_host", "left",
    )
    agg = tagged.groupBy("dst_host").agg(
        F.count("*").cast("long").alias("n_inlinks"),
        F.sum(F.when(F.col("__spam"), 1).otherwise(0)).cast("long")
        .alias("n_spam_inlinks"),
    )
    share = F.expr("(1000 * n_spam_inlinks) div n_inlinks")
    return agg.select(
        "dst_host", "n_inlinks", "n_spam_inlinks",
        share.cast("long").alias("spam_share_permille"),
        (share >= 600).alias("suspect"),
    )


ORACLE_SPAM_PROPAGATION = """
WITH e AS (
  SELECT CASE WHEN doc_id % 10 <= 3
              THEN 'spam' || CAST(doc_id % 2 AS VARCHAR)
              ELSE 'ok' || CAST(doc_id % 7 AS VARCHAR) END AS s,
         CASE WHEN doc_id % 10 <= 2
              THEN 'v' || CAST(doc_id % 2 AS VARCHAR)
              WHEN doc_id % 10 <= 6 THEN 'mixed'
              ELSE 'clean' || CAST(doc_id % 3 AS VARCHAR) END AS d
  FROM documents
),
a AS (
  SELECT d AS dst_host,
         CAST(COUNT(*) AS BIGINT) AS n_inlinks,
         CAST(SUM(CASE WHEN s IN ('spam0', 'spam1') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_spam_inlinks
  FROM e GROUP BY d
)
SELECT dst_host, n_inlinks, n_spam_inlinks,
       CAST((1000 * n_spam_inlinks) // n_inlinks AS BIGINT)
         AS spam_share_permille,
       (1000 * n_spam_inlinks) // n_inlinks >= 600 AS suspect
FROM a
"""


# --------------------------------------------------------------------------
# pagerank_warm — incremental warm-start iteration equivalence
# --------------------------------------------------------------------------

def q_pagerank_warm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start PageRank: 3 iterations, checkpoint the ranks, then
    ONE more iteration resumed from them — the incremental-recompute
    path a nightly graph refresh uses.  The oracle is the plain
    4-iteration unroll: bit-identical results prove warm start loses
    nothing (integer arithmetic has no drift to hide)."""
    from .linkgraph import pagerank

    n = _docs(spark, sf_dir).count()
    warm = pagerank(spark, n, iters=3)
    cont = pagerank(
        spark, n, iters=1,
        init_ranks=warm.select("doc", F.col("rank_scaled").alias("r")),
    )
    return cont.orderBy("doc")


def _oracle_pagerank_warm() -> str:
    from .linkgraph import pagerank_oracle_sql

    return pagerank_oracle_sql(iters=4)


# --------------------------------------------------------------------------
# seen_hit_rate — dedup efficiency per discovery wave
# --------------------------------------------------------------------------

def q_seen_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set hit rate per wave: of the URLs each wave discovers, how
    many were already crawled — the number that says when a crawl is
    saturating its seed neighborhood (hit rate climbing toward 1000
    permille) vs still expanding.  Fixture: later waves rediscover
    progressively more of the seen set."""
    doc = F.col("doc_id")
    wave = (doc % 5).alias("wave_no")
    # wave w rediscovers known URLs at roughly w/5 rate
    known = (doc % 5) > (doc % 7 % 5)
    discoveries = _docs(spark, sf_dir).select(
        wave, known.alias("already_seen")
    )
    agg = discoveries.groupBy("wave_no").agg(
        F.count("*").cast("long").alias("n_discovered"),
        F.sum(F.when(F.col("already_seen"), 1).otherwise(0)).cast("long")
        .alias("n_known"),
    )
    return agg.select(
        F.col("wave_no").cast("int").alias("wave_no"),
        "n_discovered", "n_known",
        F.expr("(1000 * n_known) div n_discovered").cast("long")
        .alias("hit_permille"),
    )


ORACLE_SEEN_HIT_RATE = """
WITH d AS (
  SELECT CAST(doc_id % 5 AS INTEGER) AS wave_no,
         doc_id % 5 > (doc_id % 7) % 5 AS already_seen
  FROM documents
),
a AS (
  SELECT wave_no, CAST(COUNT(*) AS BIGINT) AS n_discovered,
         CAST(SUM(CASE WHEN already_seen THEN 1 ELSE 0 END) AS BIGINT)
           AS n_known
  FROM d GROUP BY wave_no
)
SELECT wave_no, n_discovered, n_known,
       CAST((1000 * n_known) // n_discovered AS BIGINT) AS hit_permille
FROM a
"""


# --------------------------------------------------------------------------
# declared_charset — meta charset / http-equiv content-type extraction
# --------------------------------------------------------------------------

def q_declared_charset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-charset extraction for the decode step: HTML5
    <meta charset="...">, legacy http-equiv Content-Type with a charset
    parameter, both lowercased; pages declaring nothing fall back to
    utf-8 (the WHATWG default in practice)."""
    doc = F.col("doc_id")
    body = (
        F.when(doc % 4 == 0, F.lit('<meta charset="UTF-8">'))
        .when(doc % 4 == 1,
              F.lit('<meta http-equiv="Content-Type" '
                    'content="text/html; charset=ISO-8859-1">'))
        .when(doc % 4 == 2, F.lit('<meta CHARSET="windows-1251">'))
        .otherwise(F.lit("<html><body>none</body></html>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    m1 = F.regexp_extract(
        F.col("body"), r'(?i)<meta\s+charset\s*=\s*"([^"]+)"', 1)
    m2 = F.regexp_extract(
        F.col("body"),
        r'(?i)<meta\s[^>]*content\s*=\s*"[^"]*charset=([^";\s]+)', 1)
    charset = F.lower(
        F.when(m1 != "", m1).when(m2 != "", m2).otherwise(F.lit("utf-8"))
    )
    return d.select(
        "doc_id", charset.alias("charset"),
        ((m1 != "") | (m2 != "")).alias("declared"),
    )


ORACLE_DECLARED_CHARSET = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
         WHEN 2 THEN 'windows-1251' ELSE 'utf-8' END AS charset,
       doc_id % 4 <> 3 AS declared
FROM documents
"""


# --------------------------------------------------------------------------
# data_uri_images — inline base64 images (already in hand, never fetch)
# --------------------------------------------------------------------------

def q_data_uri_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline data-URI image accounting: pages embedding
    data:image/...;base64 payloads already delivered those bytes — the
    frontier must NOT queue them as fetches, and the decoded size
    estimate (3/4 of the base64 length) feeds storage planning.  One
    regexp_extract_all + HOF arithmetic."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    b64len = (F.lit(400) + (doc % 50) * 4)
    body = F.concat(
        F.lit('<img src="data:image/png;base64,'),
        F.repeat(F.lit("A"), b64len.cast("int")), F.lit('">'),
        F.when(doc % 3 == 0, F.concat(
            F.lit('<img src="data:image/jpeg;base64,'),
            F.repeat(F.lit("B"), 120), F.lit('">'))).otherwise(F.lit("")),
        F.lit('<img src="/real/'), s, F.lit('.png">'),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    uris = F.regexp_extract_all(
        F.col("body"),
        F.lit(r'data:image/([a-z]+);base64,([A-Za-z0-9+/=]+)'), 0,
    )
    entries = F.transform(
        uris,
        lambda u: F.struct(
            F.regexp_extract(u, r"data:image/([a-z]+);", 1).alias("fmt"),
            ((F.length(F.substring_index(u, ",", -1)) * 3) / 4)
            .cast("long").alias("est_bytes"),
        ),
    )
    return d.select(
        "doc_id", F.posexplode(entries).alias("idx", "e")
    ).select(
        "doc_id", F.col("idx").cast("int").alias("idx"),
        F.col("e.fmt").alias("fmt"),
        F.col("e.est_bytes").alias("est_bytes"),
    )


ORACLE_DATA_URI = """
SELECT doc_id, CAST(0 AS INTEGER) AS idx, 'png' AS fmt,
       CAST(((400 + (doc_id % 50) * 4) * 3) // 4 AS BIGINT) AS est_bytes
FROM documents
UNION ALL
SELECT doc_id, 1, 'jpeg', CAST((120 * 3) // 4 AS BIGINT)
FROM documents WHERE doc_id % 3 = 0
"""


# --------------------------------------------------------------------------
# paginate_synthesis — page=N families expand without fetching
# --------------------------------------------------------------------------

def q_paginate_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination synthesis: a URL carrying page=N spawns candidates
    N+1..N+3 (capped) without waiting for each page to link the next —
    the frontier shortcut for known-paginated families (synthesized
    rows carry provenance so a 404 on page N+1 stops the family).
    Pure HOF sequence fan-out."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    page_no = (doc % 7 + 1)
    url = F.concat(F.lit("http://l.test/list"), (doc % 20).cast("string"),
                   F.lit("?page="), page_no.cast("string"))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), url.alias("url"),
        page_no.cast("int").alias("page_no"),
    )
    nxt = F.transform(
        F.sequence(F.col("page_no") + 1, F.col("page_no") + 3),
        lambda p: F.concat(
            F.regexp_replace(F.col("url"), r"page=\d+$", ""),
            F.lit("page="), p.cast("string"),
        ),
    )
    return d.select(
        "doc_id", "url", F.explode(nxt).alias("candidate_url")
    )


ORACLE_PAGINATE_SYNTH = """
SELECT doc_id,
       'http://l.test/list' || CAST(doc_id % 20 AS VARCHAR) || '?page=' ||
         CAST(doc_id % 7 + 1 AS VARCHAR) AS url,
       'http://l.test/list' || CAST(doc_id % 20 AS VARCHAR) || '?page=' ||
         CAST(doc_id % 7 + 1 + k.generate_series AS VARCHAR)
         AS candidate_url
FROM documents, generate_series(1, 3) AS k
"""


# --------------------------------------------------------------------------
# picture_source — modern responsive-image format preference
# --------------------------------------------------------------------------

def q_picture_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<picture> element handling: prefer the AVIF <source>, then WebP,
    else the <img> fallback — the format-negotiation dance a modern
    image crawler replays offline (fetching the JPEG fallback when an
    AVIF exists wastes 40% of the bytes).  Pure regexp over picture
    blocks."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    avif = F.when(doc % 3 == 0, F.concat(
        F.lit('<source type="image/avif" srcset="/a'), s,
        F.lit('.avif">'))).otherwise(F.lit(""))
    webp = F.when(doc % 2 == 0, F.concat(
        F.lit('<source type="image/webp" srcset="/w'), s,
        F.lit('.webp">'))).otherwise(F.lit(""))
    body = F.concat(
        F.lit("<picture>"), avif, webp,
        F.lit('<img src="/f'), s, F.lit('.jpg"></picture>'),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    pick_avif = F.regexp_extract(
        F.col("body"),
        r'(?i)<source\s[^>]*type\s*=\s*"image/avif"[^>]*srcset\s*=\s*"([^"]+)"',
        1)
    pick_webp = F.regexp_extract(
        F.col("body"),
        r'(?i)<source\s[^>]*type\s*=\s*"image/webp"[^>]*srcset\s*=\s*"([^"]+)"',
        1)
    fallback = F.regexp_extract(
        F.col("body"), r'(?i)<img\s[^>]*src\s*=\s*"([^"]+)"', 1)
    chosen = (
        F.when(pick_avif != "", pick_avif)
        .when(pick_webp != "", pick_webp)
        .otherwise(fallback)
    )
    fmt = (
        F.when(pick_avif != "", F.lit("avif"))
        .when(pick_webp != "", F.lit("webp")).otherwise(F.lit("jpeg"))
    )
    return d.select("doc_id", chosen.alias("chosen_url"),
                    fmt.alias("chosen_fmt"))


ORACLE_PICTURE_SOURCE = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
              THEN '/a' || CAST(doc_id AS VARCHAR) || '.avif'
            WHEN doc_id % 2 = 0
              THEN '/w' || CAST(doc_id AS VARCHAR) || '.webp'
            ELSE '/f' || CAST(doc_id AS VARCHAR) || '.jpg' END
         AS chosen_url,
       CASE WHEN doc_id % 3 = 0 THEN 'avif'
            WHEN doc_id % 2 = 0 THEN 'webp' ELSE 'jpeg' END AS chosen_fmt
FROM documents
"""


# --------------------------------------------------------------------------
# open_redirects — redirect-param URLs pointing off-domain
# --------------------------------------------------------------------------

def q_open_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-redirect detection: URLs whose redirect/url/next query param
    carries an ABSOLUTE target on a different registrable domain — the
    links spammers plant to launder their targets through a reputable
    host, and a frontier following them credits the wrong site.
    Same-domain and relative-path targets stay clean."""
    from .canon import host_expr, registrable_domain

    doc = F.col("doc_id")
    s = doc.cast("string")
    target = (
        F.when(doc % 4 == 0, F.lit("http%3A%2F%2Fevil.test%2Fx"))
        .when(doc % 4 == 1, F.lit("http%3A%2F%2Fgood.test%2Fy"))
        .when(doc % 4 == 2, F.lit("%2Flocal%2Fpath"))
        .otherwise(F.lit(""))
    )
    url = F.when(
        doc % 4 == 3,
        F.concat(F.lit("http://good.test/p/"), s),
    ).otherwise(
        F.concat(F.lit("http://good.test/go?redirect="), target,
                 F.lit("&id="), s)
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), url.alias("url"))
    raw = F.regexp_extract(
        F.col("url"), r"[?&](?:redirect|url|next)=([^&#]+)", 1)
    # minimal %-decode for the scheme/host probe (:/ are enough here)
    decoded = F.replace(
        F.replace(F.lower(raw), F.lit("%3a"), F.lit(":")),
        F.lit("%2f"), F.lit("/"),
    )
    is_abs = decoded.startswith("http://") | decoded.startswith("https://")
    tgt_dom = registrable_domain(host_expr(decoded))
    own_dom = registrable_domain(host_expr(F.col("url")))
    flagged = (raw != "") & is_abs & (tgt_dom != own_dom)
    return d.select(
        "doc_id", "url",
        F.when(raw != "", decoded).alias("redirect_target"),
        flagged.alias("open_redirect"),
    )


ORACLE_OPEN_REDIRECTS = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 3
            THEN 'http://good.test/p/' || CAST(doc_id AS VARCHAR)
            ELSE 'http://good.test/go?redirect=' ||
              CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 'http%3A%2F%2Fevil.test%2Fx'
                WHEN 1 THEN 'http%3A%2F%2Fgood.test%2Fy'
                ELSE '%2Flocal%2Fpath' END
              || '&id=' || CAST(doc_id AS VARCHAR) END AS url,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'http://evil.test/x'
         WHEN 1 THEN 'http://good.test/y'
         WHEN 2 THEN '/local/path' END AS redirect_target,
       doc_id % 4 = 0 AS open_redirect
FROM documents
"""


# --------------------------------------------------------------------------
# lazy_images — data-src / noscript fallbacks hiding the real image URL
# --------------------------------------------------------------------------

def q_lazy_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy-loading extraction: JS-lazyloaded images carry a 1px
    placeholder in src and the REAL URL in data-src (or a <noscript>
    twin) — a crawler reading only src harvests placeholders.  Per
    img: effective_url = data-src if present else src, plus where it
    came from; the noscript twin corroborates (n_sources)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    lazy = F.when(doc % 2 == 0, F.concat(
        F.lit('<img src="/1px.gif" data-src="/real/'), s,
        F.lit('.jpg" loading="lazy">'
              '<noscript><img src="/real/'), s,
        F.lit('.jpg"></noscript>'))).otherwise(
        F.concat(F.lit('<img src="/plain/'), s, F.lit('.jpg">')))
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), lazy.alias("body")
    )
    data_src = F.regexp_extract(
        F.col("body"), r'(?i)<img\s[^>]*data-src\s*=\s*"([^"]+)"', 1)
    plain_src = F.regexp_extract(
        F.col("body"), r'(?i)<img\s(?![^>]*data-src)[^>]*src\s*=\s*"([^"]+)"',
        1)
    noscript = F.regexp_extract(
        F.col("body"),
        r'(?is)<noscript>.*?<img\s[^>]*src\s*=\s*"([^"]+)".*?</noscript>', 1)
    effective = F.when(data_src != "", data_src).otherwise(plain_src)
    source = F.when(data_src != "", F.lit("data-src")).otherwise(F.lit("src"))
    corroborated = (noscript != "") & (noscript == effective)
    return d.select(
        "doc_id", effective.alias("effective_url"), source.alias("source"),
        corroborated.alias("noscript_corroborated"),
    )


ORACLE_LAZY_IMAGES = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0
            THEN '/real/' || CAST(doc_id AS VARCHAR) || '.jpg'
            ELSE '/plain/' || CAST(doc_id AS VARCHAR) || '.jpg' END
         AS effective_url,
       CASE WHEN doc_id % 2 = 0 THEN 'data-src' ELSE 'src' END AS source,
       doc_id % 2 = 0 AS noscript_corroborated
FROM documents
"""


# --------------------------------------------------------------------------
# shard_integrity — no document may land in two shards
# --------------------------------------------------------------------------

def q_shard_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard integrity invariant: a document assigned to more
    than one shard would be seen twice per epoch (silent upsampling).
    The fixture plants doc%50==0 ids into a second shard; the report
    lists every violator with its shard set — an empty result is the
    healthy state the delivery gate asserts."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    a = _docs(spark, sf_dir).select(
        F.concat(F.lit("d"), s).alias("doc"),
        F.concat(F.lit("shard-"), (doc % 16).cast("string")).alias("shard"),
    )
    b = _docs(spark, sf_dir).filter(doc % 50 == 0).select(
        F.concat(F.lit("d"), s).alias("doc"),
        F.concat(F.lit("shard-"), ((doc + 1) % 16).cast("string"))
        .alias("shard"),
    )
    assigned = a.unionByName(b)
    dup = assigned.groupBy("doc").agg(
        F.countDistinct("shard").cast("long").alias("n_shards"),
        F.concat_ws("|", F.sort_array(F.collect_set("shard")))
        .alias("shards"),
    )
    return dup.filter(F.col("n_shards") > 1)


ORACLE_SHARD_INTEGRITY = """
WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0)
SELECT 'd' || CAST(doc_id AS VARCHAR) AS doc,
       CAST(2 AS BIGINT) AS n_shards,
       CASE WHEN doc_id % 16 < (doc_id + 1) % 16
            THEN 'shard-' || CAST(doc_id % 16 AS VARCHAR) || '|shard-' ||
                 CAST((doc_id + 1) % 16 AS VARCHAR)
            ELSE 'shard-' || CAST((doc_id + 1) % 16 AS VARCHAR) ||
                 '|shard-' || CAST(doc_id % 16 AS VARCHAR) END AS shards
FROM v
"""


# --------------------------------------------------------------------------
# snippets — word-boundary truncated index snippets
# --------------------------------------------------------------------------

def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERP-style snippet generation: the first words of each document
    up to an 80-char budget, cut at a WORD boundary with an ellipsis
    (mid-word cuts read broken); in-budget docs pass whole.  Pure HOF
    fold over the token array."""
    doc = F.col("doc_id")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    # longest prefix of tokens whose joined length stays <= 80
    prefix = F.aggregate(
        toks,
        F.struct(F.lit("").alias("acc"), F.lit(False).alias("stop")),
        lambda st, w: F.when(
            st["stop"]
            | ((F.length(st["acc"]) + F.length(w) + 1) > 80),
            F.struct(st["acc"].alias("acc"), F.lit(True).alias("stop")),
        ).otherwise(
            F.struct(
                F.when(st["acc"] == "", w)
                .otherwise(F.concat(st["acc"], F.lit(" "), w)).alias("acc"),
                F.lit(False).alias("stop"),
            )
        ),
    )
    snippet = F.when(
        prefix["stop"], F.concat(prefix["acc"], F.lit(" ..."))
    ).otherwise(prefix["acc"])
    return _docs(spark, sf_dir).select(
        doc.alias("doc_id"), snippet.alias("snippet"),
        prefix["stop"].alias("truncated"),
    )


ORACLE_SNIPPETS = """
WITH t AS (
  SELECT doc_id,
         list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
w AS (
  SELECT doc_id, k.generate_series AS pos,
         toks[k.generate_series] AS word
  FROM t, generate_series(1, 4096) AS k
  WHERE k.generate_series <= len(toks)
),
c AS (
  SELECT doc_id, pos,
         SUM(length(word)) OVER (PARTITION BY doc_id ORDER BY pos)
           + pos - 1 AS joined_len
  FROM w
),
k AS (
  SELECT t.doc_id,
         COALESCE((SELECT MAX(pos) FROM c
                   WHERE c.doc_id = t.doc_id AND joined_len <= 80), 0) AS k,
         len(t.toks) AS n, t.toks
  FROM t
)
SELECT doc_id,
       COALESCE(list_aggregate(list_slice(toks, 1, k), 'string_agg', ' '),
                '')
         || CASE WHEN k < n THEN ' ...' ELSE '' END AS snippet,
       k < n AS truncated
FROM k
"""
