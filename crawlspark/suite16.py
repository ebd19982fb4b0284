"""Round-2 continuation queries, part 14: URL language hints,
meta-refresh redirects, page-kind routing.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import url_lang_hint
from .extract import meta_refresh
from .textops.quality import classify_page_kind


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# url_lang — zero-fetch language routing hint
# --------------------------------------------------------------------------

def q_url_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """url_lang_hint over 5 URL shapes: /de/ path segment, fr.
    subdomain, .jp ccTLD (maps to ja), a path segment that is NOT a
    language code (/xx/ -> falls through to the ccTLD), and a plain
    .test URL (und)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    url = (
        F.when(doc % 5 == 0, F.concat(
            F.lit("http://site.test/de/p/"), s))
        .when(doc % 5 == 1, F.concat(
            F.lit("http://fr.site.test/p/"), s))
        .when(doc % 5 == 2, F.concat(
            F.lit("http://shop.example.jp/p/"), s))
        .when(doc % 5 == 3, F.concat(
            F.lit("http://site.de/xx/p/"), s))
        .otherwise(F.concat(F.lit("http://plain.test/p/"), s))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), url.alias("url"))
    return d.select("doc_id", "url", url_lang_hint(F.col("url")).alias("lang_hint"))


ORACLE_URL_LANG = """
SELECT doc_id,
       CASE CAST(doc_id % 5 AS INTEGER)
         WHEN 0 THEN 'http://site.test/de/p/' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'http://fr.site.test/p/' || CAST(doc_id AS VARCHAR)
         WHEN 2 THEN 'http://shop.example.jp/p/' || CAST(doc_id AS VARCHAR)
         WHEN 3 THEN 'http://site.de/xx/p/' || CAST(doc_id AS VARCHAR)
         ELSE 'http://plain.test/p/' || CAST(doc_id AS VARCHAR)
       END AS url,
       CASE CAST(doc_id % 5 AS INTEGER)
         WHEN 0 THEN 'de' WHEN 1 THEN 'fr' WHEN 2 THEN 'ja'
         WHEN 3 THEN 'de' ELSE 'und'
       END AS lang_hint
FROM documents
"""


# --------------------------------------------------------------------------
# meta_refresh_redirects — the third redirect mechanism
# --------------------------------------------------------------------------

def q_meta_refresh_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """meta_refresh over 4 shapes: instant redirect, delayed quoted-url
    redirect, reload-only (url null), no tag (whole struct null)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    body = (
        F.when(doc % 4 == 0, F.concat(
            F.lit('<meta http-equiv="refresh" content="0;url=/go/'), s,
            F.lit('">')))
        .when(doc % 4 == 1, F.concat(
            F.lit('<meta content="5; URL=\'http://n.test/d/'), s,
            F.lit('\'" http-equiv="REFRESH">')))
        .when(doc % 4 == 2,
              F.lit('<meta http-equiv="refresh" content="30">'))
        .otherwise(F.lit("<html><body>none</body></html>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    mr = meta_refresh(F.col("body"))
    return d.select(
        "doc_id",
        mr["delay_s"].alias("delay_s"),
        mr["url"].alias("refresh_url"),
        mr.isNotNull().alias("has_refresh"),
    )


ORACLE_META_REFRESH = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 0 WHEN 1 THEN 5 WHEN 2 THEN 30 END AS delay_s,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN '/go/' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'http://n.test/d/' || CAST(doc_id AS VARCHAR)
       END AS refresh_url,
       doc_id % 4 <> 3 AS has_refresh
FROM documents
"""


# --------------------------------------------------------------------------
# page_kinds — extraction-count routing
# --------------------------------------------------------------------------

def q_page_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """classify_page_kind over an arithmetic count mix covering all
    four kinds, including the gallery-vs-article precedence row
    (image-heavy AND word-heavy -> article wins: words >= 150 preempts
    the gallery rule only when imgs < 8... the fixture pins the exact
    rule order)."""
    doc = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.when(doc % 4 == 0, 12).when(doc % 4 == 1, 2)
        .when(doc % 4 == 2, 1).otherwise(10).cast("long").alias("n_imgs"),
        F.when(doc % 4 == 0, 40).when(doc % 4 == 1, 400)
        .when(doc % 4 == 2, 30).otherwise(200).cast("long")
        .alias("n_words"),
        F.when(doc % 4 == 2, 50).otherwise(5).cast("long").alias("n_links"),
    )
    return classify_page_kind(pages)


ORACLE_PAGE_KINDS = """
WITH p AS (
  SELECT doc_id,
         CAST(CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 12 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 10 END
           AS BIGINT) AS n_imgs,
         CAST(CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 40 WHEN 1 THEN 400 WHEN 2 THEN 30 ELSE 200 END
           AS BIGINT) AS n_words,
         CAST(CASE WHEN doc_id % 4 = 2 THEN 50 ELSE 5 END AS BIGINT)
           AS n_links
  FROM documents
)
SELECT doc_id, n_imgs, n_words, n_links,
       CASE WHEN n_imgs >= 8 AND n_words < 150 THEN 'gallery'
            WHEN n_words >= 150 THEN 'article'
            WHEN n_links >= 30 THEN 'nav'
            ELSE 'stub' END AS page_kind
FROM p
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_lang": q_url_lang,
        "meta_refresh_redirects": q_meta_refresh_redirects,
        "page_kinds": q_page_kinds,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "url_lang": ORACLE_URL_LANG,
        "meta_refresh_redirects": ORACLE_META_REFRESH,
        "page_kinds": ORACLE_PAGE_KINDS,
    }
