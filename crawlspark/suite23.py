"""Round-3 queries, part 3: news sitemaps, EXIF orientation planning,
URL path-template mining, DNS resolver-cache planning.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the construction (not the implementation's regexes),
integer-exact columns, sequential recurrences unrolled step-by-step in
SQL (the aimd/pagerank house pattern).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# sitemap_news — Google News sitemap extension
# --------------------------------------------------------------------------

_LANGS = ("en", "de", "fr", "ja")


def q_sitemap_news(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.sitemap_news_entries over news sitemaps: one news-tagged
    article per doc plus a news-less second <url> block on doc%3==0
    (the alignment hazard — blocks without <news:news> children must
    contribute nothing, as with image/video sitemaps)."""
    from .extract import sitemap_news_entries

    doc = F.col("doc_id")
    s = doc.cast("string")
    lang = (
        F.when(doc % 4 == 0, _LANGS[0])
        .when(doc % 4 == 1, _LANGS[1])
        .when(doc % 4 == 2, _LANGS[2])
        .otherwise(_LANGS[3])
    )
    block1 = F.concat(
        F.lit("<url><loc>http://n.test/a"), s,
        F.lit("</loc><news:news><news:publication><news:name>Pub"),
        (doc % 5).cast("string"),
        F.lit("</news:name><news:language>"), lang,
        F.lit("</news:language></news:publication>"
              "<news:publication_date>2026-08-"),
        F.lpad((doc % 28 + 1).cast("string"), 2, "0"),
        F.lit("</news:publication_date><news:title>headline "), s,
        F.lit("</news:title></news:news></url>"),
    )
    block2 = F.when(
        doc % 3 == 0,
        F.concat(F.lit("<url><loc>http://n.test/plain"), s,
                 F.lit("</loc></url>")),
    ).otherwise(F.lit(""))
    body = F.concat(F.lit("<urlset>"), block1, block2, F.lit("</urlset>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id",
        F.explode(sitemap_news_entries(F.col("body"))).alias("e"),
    ).select(
        "doc_id",
        F.col("e.page_url").alias("page_url"),
        F.col("e.publication").alias("publication"),
        F.col("e.language").alias("language"),
        F.col("e.pub_date").alias("pub_date"),
        F.col("e.title").alias("title"),
    )


ORACLE_SITEMAP_NEWS = """
SELECT doc_id,
       'http://n.test/a' || CAST(doc_id AS VARCHAR) AS page_url,
       'Pub' || CAST(doc_id % 5 AS VARCHAR) AS publication,
       CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
            WHEN 2 THEN 'fr' ELSE 'ja' END AS language,
       '2026-08-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         AS pub_date,
       'headline ' || CAST(doc_id AS VARCHAR) AS title
FROM documents
"""


# --------------------------------------------------------------------------
# exif_orientation — upright-normalization plan
# --------------------------------------------------------------------------

def q_exif_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.exif_orientation_plan over tags doc%9 (0..8 — 0 exercises
    the out-of-range -> identity path); dims w=100+doc%50, h=80+doc%40
    so the tag-5..8 dimension swap is visible per row."""
    from .images import exif_orientation_plan

    doc = F.col("doc_id")
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        (doc % 9).cast("int").alias("exif_orientation"),
        (100 + doc % 50).cast("long").alias("w"),
        (80 + doc % 40).cast("long").alias("h"),
    )
    return exif_orientation_plan(imgs).select(
        "image_id", "transform", "swaps_dims", "out_w", "out_h",
        "needs_rewrite",
    )


ORACLE_EXIF_ORIENTATION = """
WITH i AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         doc_id % 9 AS tag,
         CAST(100 + doc_id % 50 AS BIGINT) AS w,
         CAST(80 + doc_id % 40 AS BIGINT) AS h
  FROM documents
)
SELECT image_id,
       CASE tag WHEN 2 THEN 'flip_h' WHEN 3 THEN 'rot180'
            WHEN 4 THEN 'flip_v' WHEN 5 THEN 'transpose'
            WHEN 6 THEN 'rot90_cw' WHEN 7 THEN 'transverse'
            WHEN 8 THEN 'rot270_cw' ELSE 'identity' END AS transform,
       tag IN (5, 6, 7, 8) AS swaps_dims,
       CASE WHEN tag IN (5, 6, 7, 8) THEN h ELSE w END AS out_w,
       CASE WHEN tag IN (5, 6, 7, 8) THEN w ELSE h END AS out_h,
       tag NOT IN (0, 1) AS needs_rewrite
FROM i
"""


# --------------------------------------------------------------------------
# path_templates — crawl-space generator mining
# --------------------------------------------------------------------------

_TPL_MIN = 20

_UUID_SQL = (
    "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '-' || "
    "substr(md5(CAST(doc_id AS VARCHAR)), 9, 4) || '-' || "
    "substr(md5(CAST(doc_id AS VARCHAR)), 13, 4) || '-' || "
    "substr(md5(CAST(doc_id AS VARCHAR)), 17, 4) || '-' || "
    "substr(md5(CAST(doc_id AS VARCHAR)), 21, 12)"
)


def q_path_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.mine_path_templates over three constructed URL families per
    host h(doc%7).test: /product/<id>/view on every doc (folds to {n};
    dense -> generator at min_count=20), /session/<md5-hex> on doc%3==0
    ({hex}), /u/<uuid-from-md5> on doc%5==0 ({uuid}; sparse -> below the
    generator bar).  The oracle states each family's template from the
    construction — a fold-regex bug cannot hide."""
    from .canon import mine_path_templates

    doc = F.col("doc_id")
    s = doc.cast("string")
    m = F.md5(s)
    host = F.concat(F.lit("https://h"), (doc % 7).cast("string"),
                    F.lit(".test"))
    fam_a = F.concat(host, F.lit("/product/"), s, F.lit("/view"))
    fam_b = F.when(doc % 3 == 0, F.concat(host, F.lit("/session/"), m))
    fam_c = F.when(
        doc % 5 == 0,
        F.concat(
            host, F.lit("/u/"),
            F.substring(m, 1, 8), F.lit("-"), F.substring(m, 9, 4),
            F.lit("-"), F.substring(m, 13, 4), F.lit("-"),
            F.substring(m, 17, 4), F.lit("-"), F.substring(m, 21, 12),
        ),
    )
    urls = (
        _docs(spark, sf_dir)
        .select(F.explode(F.array(fam_a, fam_b, fam_c)).alias("url"))
        .filter(F.col("url").isNotNull())
    )
    return mine_path_templates(urls, min_count=_TPL_MIN)


ORACLE_PATH_TEMPLATES = f"""
WITH u AS (
  SELECT 'h' || (doc_id % 7) || '.test' AS host,
         '/product/{{n}}/view' AS template,
         'https://h' || (doc_id % 7) || '.test/product/' || doc_id
           || '/view' AS url
  FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 7) || '.test', '/session/{{hex}}',
         'https://h' || (doc_id % 7) || '.test/session/'
           || md5(CAST(doc_id AS VARCHAR))
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'h' || (doc_id % 7) || '.test', '/u/{{uuid}}',
         'https://h' || (doc_id % 7) || '.test/u/' || {_UUID_SQL}
  FROM documents WHERE doc_id % 5 = 0
)
SELECT host, template, COUNT(DISTINCT url) AS n_urls,
       MIN(url) AS example_url,
       COUNT(DISTINCT url) >= {_TPL_MIN} AS is_generator
FROM u GROUP BY host, template
"""


# --------------------------------------------------------------------------
# dns_cache_plan — TTL resolver-cache hit modeling
# --------------------------------------------------------------------------

_DNS_HOSTS = 24
_DNS_STEPS = 10
_DNS_TTL = 1000


def q_dns_cache_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.dns_cache_plan over a 24-host x 10-lookup fixture with
    per-host stride (hn%4+1)*300 ms and TTL 1000 ms; the oracle unrolls
    the miss-re-anchors-expiry recurrence step by step."""
    from .politeness import dns_cache_plan

    doc = F.col("doc_id")
    lookups = (
        _docs(spark, sf_dir)
        .filter(doc < _DNS_HOSTS * _DNS_STEPS)
        .select(
            F.concat(F.lit("h"), (doc % _DNS_HOSTS).cast("string"))
            .alias("host"),
            (
                F.expr(f"doc_id div {_DNS_HOSTS}")
                * ((doc % _DNS_HOSTS) % 4 + 1) * 300
            ).cast("long").alias("ts_ms"),
        )
    )
    return dns_cache_plan(lookups, ttl_ms=_DNS_TTL).orderBy("host")


def _oracle_dns() -> str:
    steps = []
    prev = "s0"
    for k in range(1, _DNS_STEPS):
        cur = f"s{k}"
        ts = f"({k} * (hn % 4 + 1) * 300)"
        steps.append(
            f"{cur} AS (SELECT hn, "
            f"misses + CASE WHEN {ts} >= expiry THEN 1 ELSE 0 END AS misses, "
            f"CASE WHEN {ts} >= expiry THEN {ts} + {_DNS_TTL} "
            f"ELSE expiry END AS expiry FROM {prev})"
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
WITH h AS (SELECT unnest(generate_series(0, {_DNS_HOSTS - 1})) AS hn),
s0 AS (SELECT hn, 1 AS misses, {_DNS_TTL} AS expiry FROM h),
{chain}
SELECT 'h' || hn AS host, CAST({_DNS_STEPS} AS BIGINT) AS n_lookups,
       CAST(misses AS BIGINT) AS n_resolves,
       CAST({_DNS_STEPS} - misses AS BIGINT) AS n_hits
FROM {prev} ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sitemap_news": q_sitemap_news,
        "exif_orientation": q_exif_orientation,
        "path_templates": q_path_templates,
        "dns_cache_plan": q_dns_cache_plan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "sitemap_news": ORACLE_SITEMAP_NEWS,
        "exif_orientation": ORACLE_EXIF_ORIENTATION,
        "path_templates": ORACLE_PATH_TEMPLATES,
        "dns_cache_plan": _oracle_dns(),
    }
