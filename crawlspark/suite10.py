"""Round-2 continuation queries, part 8: crawl-quality traps (soft-404,
link farms) and caption-aware image dedup representative selection.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops.quality import link_farm_signals, soft404_signals


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# soft404 — 200-status error pages
# --------------------------------------------------------------------------

def q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection over a 4-shape corpus x status mix: tiny
    phrase page (flags), long phrase page with a 404 title (flags via
    title), tiny clean page and long clean page (pass); real 404s
    (doc%7==0) never flag regardless of content."""
    doc = F.col("doc_id")
    status = F.when(doc % 7 == 0, 404).otherwise(200).cast("int")
    pad = F.repeat(F.lit("content word "), 60)  # 780 chars
    body = (
        F.when(doc % 4 == 0,
               F.lit("<html><body>Page Not Found</body></html>"))
        .when(doc % 4 == 1, F.concat(
            F.lit("<html><title>404 Not Found</title><body>"), pad,
            F.lit("this page does not exist</body></html>")))
        .when(doc % 4 == 2, F.lit("<html><body>short ok page</body></html>"))
        .otherwise(F.concat(F.lit("<html><body>"), pad,
                            F.lit("fine article</body></html>")))
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), status.alias("status"), body.alias("body")
    )
    return soft404_signals(d).select(
        "doc_id", "status", "has_phrase", "tiny_body", "title_404",
        "soft404",
    )


ORACLE_SOFT404 = """
WITH d AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INTEGER)
           AS status,
         CAST(doc_id % 4 AS INTEGER) AS shape
  FROM documents
)
SELECT doc_id, status,
       shape IN (0, 1) AS has_phrase,
       shape IN (0, 2) AS tiny_body,
       shape = 1 AS title_404,
       status = 200 AND shape IN (0, 1) AS soft404
FROM d
"""


# --------------------------------------------------------------------------
# link_farm — SEO-spam flag from per-page link statistics
# --------------------------------------------------------------------------

def q_link_farm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """link_farm_signals over arithmetic per-page link stats: the flag
    requires many links AND low host diversity AND thin text per link —
    hub pages failing only one test stay clean."""
    doc = F.col("doc_id")
    stats = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        (F.lit(10) + (doc % 100) * 2).cast("long").alias("n_links"),
        (F.lit(1) + doc % 15).cast("long").alias("n_link_hosts"),
        ((doc % 50) * 30).cast("long").alias("n_chars"),
    )
    return link_farm_signals(stats)


ORACLE_LINK_FARM = """
WITH s AS (
  SELECT doc_id,
         10 + (doc_id % 100) * 2 AS n_links,
         1 + doc_id % 15 AS n_link_hosts,
         (doc_id % 50) * 30 AS n_chars
  FROM documents
)
SELECT doc_id,
       CAST(n_links AS BIGINT) AS n_links,
       CAST((1000 * n_link_hosts) // GREATEST(n_links, 1) AS BIGINT)
         AS host_diversity_permille,
       CAST(n_chars // GREATEST(n_links, 1) AS BIGINT) AS chars_per_link,
       n_links >= 50
         AND (1000 * n_link_hosts) // GREATEST(n_links, 1) <= 100
         AND n_chars // GREATEST(n_links, 1) < 20
         AS is_link_farm
FROM s
"""


# --------------------------------------------------------------------------
# image_pair_keep_best — caption-aware representative per phash group
# --------------------------------------------------------------------------

def q_image_pair_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dedup drop policy with caption quality: the planted phash
    near-dup groups (dup-d, img-d for doc%5==0) keep the member with the
    LONGER caption (the original's real 10-word caption vs the copy's
    stub), ties to the lexicographically smaller id.  Components via the
    distributed CC; the oracle recomputes both caption lengths from the
    documents text."""
    from . import images as _images
    from .textops import dedup as _dedup

    imgs = _images.generate_images(spark, sf_dir).select(
        "image_id", "phash", "caption"
    )
    d = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long")
    copies = imgs.filter(d % 5 == 0).select(
        F.concat(F.lit("dup-"), d.cast("string")).alias("image_id"),
        F.col("phash"),
        F.concat(F.lit("copy "), d.cast("string")).alias("caption"),
    )
    both = imgs.filter(d % 5 == 0).unionByName(copies)
    pairs = both.select(
        F.regexp_replace("image_id", "^(img|dup)-", "").cast("long")
        .alias("g"),
        "image_id",
    )
    edges = (
        pairs.groupBy("g")
        .agg(F.min("image_id").alias("id_a"), F.max("image_id").alias("id_b"))
        .select("id_a", "id_b")
    )
    cc = _dedup.connected_components(edges, src="id_a", dst="id_b")
    scored = both.join(cc, both["image_id"] == cc["node"]).select(
        "image_id", "component",
        F.length("caption").cast("long").alias("cap_len"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.desc("cap_len"), F.asc("image_id")
    )
    return scored.withColumn(
        "keep", F.row_number().over(w) == 1
    ).select("image_id", "component", "cap_len", "keep")


ORACLE_IMAGE_PAIR_KEEP_BEST = """
WITH d AS (
  SELECT doc_id,
         length(COALESCE(list_aggregate(
           list_slice(
             list_filter(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
                         x -> x <> ''),
             1, 10),
           'string_agg', ' '), '')) AS orig_len,
         length('copy ' || CAST(doc_id AS VARCHAR)) AS copy_len
  FROM documents WHERE doc_id % 5 = 0
),
members AS (
  SELECT doc_id, 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         orig_len AS cap_len FROM d
  UNION ALL
  SELECT doc_id, 'dup-' || CAST(doc_id AS VARCHAR), copy_len FROM d
),
ranked AS (
  SELECT doc_id, image_id, cap_len,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cap_len DESC, image_id) AS r
  FROM members
)
SELECT image_id,
       'dup-' || CAST(doc_id AS VARCHAR) AS component,
       CAST(cap_len AS BIGINT) AS cap_len,
       r = 1 AS keep
FROM ranked
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "soft404": q_soft404,
        "link_farm": q_link_farm,
        "image_pair_keep_best": q_image_pair_keep_best,
        "percent_normalize_rfc": q_percent_normalize,
        "dot_segments": q_dot_segments,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "soft404": ORACLE_SOFT404,
        "link_farm": ORACLE_LINK_FARM,
        "image_pair_keep_best": ORACLE_IMAGE_PAIR_KEEP_BEST,
        "percent_normalize_rfc": ORACLE_PERCENT_NORMALIZE,
        "dot_segments": ORACLE_DOT_SEGMENTS,
    }


# --------------------------------------------------------------------------
# percent_normalize — RFC 3986 §6.2.2 percent-encoding normalization
# --------------------------------------------------------------------------

def q_percent_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-encoding normalization over 4 URL shapes: encoded
    unreserved chars decode (%41->A, %7e->~), reserved escapes uppercase
    (%3f->%3F), %2F stays escaped (reserved), malformed escapes pass
    through.  The oracle replays the same split/decode-or-upper fold
    with chr() + hex casts."""
    from .canon import normalize_percent_encoding

    doc = F.col("doc_id")
    s = doc.cast("string")
    url = (
        F.when(doc % 4 == 0, F.concat(
            F.lit("http://h.test/%41bc/p"), s, F.lit("?q=%3f")))
        .when(doc % 4 == 1, F.concat(
            F.lit("http://h.test/a%2Fb%7e/"), s))
        .when(doc % 4 == 2, F.concat(
            F.lit("http://h.test/%zz/"), s))
        .otherwise(F.concat(F.lit("http://h.test/plain/"), s))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), url.alias("url"))
    return d.select(
        "doc_id", "url",
        normalize_percent_encoding(F.col("url")).alias("url_norm"),
    )


ORACLE_PERCENT_NORMALIZE = """
WITH d AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 'http://h.test/%41bc/p' || CAST(doc_id AS VARCHAR)
                       || '?q=%3f'
           WHEN 1 THEN 'http://h.test/a%2Fb%7e/' || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN 'http://h.test/%zz/' || CAST(doc_id AS VARCHAR)
           ELSE 'http://h.test/plain/' || CAST(doc_id AS VARCHAR)
         END AS url
  FROM documents
)
SELECT doc_id, url,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'http://h.test/Abc/p' || CAST(doc_id AS VARCHAR)
                     || '?q=%3F'
         WHEN 1 THEN 'http://h.test/a%2Fb~/' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN 'http://h.test/%zz/' || CAST(doc_id AS VARCHAR)
         ELSE 'http://h.test/plain/' || CAST(doc_id AS VARCHAR)
       END AS url_norm
FROM d
"""


# --------------------------------------------------------------------------
# dot_segments — RFC 3986 §5.2.4 path normalization
# --------------------------------------------------------------------------

def q_dot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dot-segment removal over 6 path shapes (./ collapse, one- and
    two-level .., trailing .., above-root .., clean).  The expected
    outputs are stated arithmetically — the Spark side's negative-
    lookahead regexes have no RE2 (DuckDB) equivalent, so the oracle is
    the RFC result itself, not a regex replay."""
    from .canon import remove_dot_segments

    doc = F.col("doc_id")
    s = doc.cast("string")
    path = (
        F.when(doc % 6 == 0, F.concat(F.lit("/a/./b/../c"), s))
        .when(doc % 6 == 1, F.concat(F.lit("/a/b/../../c"), s))
        .when(doc % 6 == 2, F.concat(F.lit("/x"), s, F.lit("/y/..")))
        .when(doc % 6 == 3, F.concat(F.lit("/../up"), s))
        .when(doc % 6 == 4, F.concat(F.lit("/./lead"), s))
        .otherwise(F.concat(F.lit("/clean/"), s))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), path.alias("path"))
    return d.select(
        "doc_id", "path",
        remove_dot_segments(F.col("path")).alias("path_norm"),
    )


ORACLE_DOT_SEGMENTS = """
SELECT doc_id,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN '/a/./b/../c' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN '/a/b/../../c' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN '/x' || CAST(doc_id AS VARCHAR) || '/y/..'
         WHEN 3 THEN '/../up' || CAST(doc_id AS VARCHAR)
         WHEN 4 THEN '/./lead' || CAST(doc_id AS VARCHAR)
         ELSE '/clean/' || CAST(doc_id AS VARCHAR)
       END AS path,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN '/a/c' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN '/c' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN '/x' || CAST(doc_id AS VARCHAR) || '/'
         WHEN 3 THEN '/up' || CAST(doc_id AS VARCHAR)
         WHEN 4 THEN '/lead' || CAST(doc_id AS VARCHAR)
         ELSE '/clean/' || CAST(doc_id AS VARCHAR)
       END AS path_norm
FROM documents
"""
