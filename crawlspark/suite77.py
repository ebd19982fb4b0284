"""Round-3 queries, part 27: ads.txt records, web-app-manifest icons,
windowed type-token ratio, llms.txt ingestion manifests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# ads_txt
# --------------------------------------------------------------------------

def q_ads_txt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.parse_ads_txt over bodies mixing valid DIRECT/RESELLER
    records, comments, variable lines, and malformed rows."""
    from .robots import parse_ads_txt

    doc = F.col("doc_id")
    k = doc % 20
    body = F.concat(
        F.lit("# ads.txt for host\n"
              "google.com, pub-"), k.cast("string"),
        F.lit(", DIRECT, f08c47fec0942fa0\n"
              "OPENX.COM, 5399"), k.cast("string"),
        F.lit(", reseller\n"
              "contact=ads@example.com\n"
              "brokenline-without-commas\n"
              "onlytwo, fields\n"),
    )
    files = _docs(spark, sf_dir).filter(doc < 20).select(
        F.concat(F.lit("a"), k.cast("string"), F.lit(".com"))
        .alias("host"),
        body.alias("body"),
    )
    return parse_ads_txt(files).orderBy("host", "ad_system")


ORACLE_ADS_TXT = """
WITH r AS (
  SELECT doc_id % 20 AS k, 'a' || (doc_id % 20) || '.com' AS host
  FROM documents WHERE doc_id < 20
)
SELECT host, 'google.com' AS ad_system,
       'pub-' || k AS publisher_id, 'DIRECT' AS relationship,
       TRUE AS has_cert
FROM r
UNION ALL
SELECT host, 'openx.com', '5399' || k, 'RESELLER', FALSE
FROM r
ORDER BY host, ad_system
"""


# --------------------------------------------------------------------------
# webmanifest
# --------------------------------------------------------------------------

def q_webmanifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.webmanifest_icons over manifests with sized icons,
    an unsized icon set, and unparseable JSON."""
    from .extract import webmanifest_icons

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 3
    manifest = (
        F.when(m == 0, F.concat(
            F.lit('{"name": "App'), ds,
            F.lit('", "icons": [{"src": "/i192.png", "sizes": '
                  '"192x192"}, {"src": "/i512.png", "sizes": '
                  '"512x512"}, {"src": "/i48.png", "sizes": '
                  '"48x48"}]}')))
        .when(m == 1, F.concat(
            F.lit('{"name": "Bare'), ds,
            F.lit('", "icons": [{"src": "/any.svg"}]}')))
        .otherwise(F.lit("not json at all"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                    manifest.alias("manifest"))
    w = d.select("doc_id",
                 webmanifest_icons(F.col("manifest")).alias("w"))
    return w.select(
        "doc_id", "w.name", "w.n_icons", "w.best_icon_src",
        "w.best_icon_px",
    ).orderBy("doc_id")


ORACLE_WEBMANIFEST = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'App' || doc_id
            WHEN 1 THEN 'Bare' || doc_id END AS name,
       CAST(CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1
            ELSE 0 END AS INTEGER) AS n_icons,
       CASE doc_id % 3 WHEN 0 THEN '/i512.png' WHEN 1 THEN '/any.svg'
       END AS best_icon_src,
       CAST(CASE doc_id % 3 WHEN 0 THEN 512 END AS BIGINT)
         AS best_icon_px
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# ttr
# --------------------------------------------------------------------------

def q_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.ttr_windowed (window 50) over documents.text;
    the oracle replays the non-overlapping window slices and the
    integer permille mean in SQL list ops."""
    from .textops.quality import ttr_windowed

    return ttr_windowed(_docs(spark, sf_dir)).orderBy("id")


ORACLE_TTR = """
WITH base AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM documents
),
w AS (
  SELECT id, CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(len(t) // 50 AS BIGINT) AS n_windows,
         list_transform(range(1, len(t) // 50 + 1),
                        i -> CAST(length(list_distinct(
                                 list_slice(t, (i-1)*50 + 1, i*50)))
                             * 1000 // 50 AS BIGINT)) AS pm
  FROM base
)
SELECT id, n_tokens, n_windows,
       CASE WHEN n_windows > 0 THEN
         CAST(list_sum(pm) // n_windows AS BIGINT)
       END AS mattr_permille
FROM w
ORDER BY id
"""


# --------------------------------------------------------------------------
# llms_txt
# --------------------------------------------------------------------------

def q_llms_txt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.parse_llms_txt over a full manifest (title, summary,
    two sections incl. Optional), a minimal title-only file, and a
    plain robots-ish body (absent)."""
    from .robots import parse_llms_txt

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 3
    body = (
        F.when(m == 0, F.concat(
            F.lit("# Site"), ds,
            F.lit("\n\n> A summary line\n\n## Docs\n"
                  "- [Guide](https://s/guide)\n"
                  "- [API](https://s/api)\n\n## Optional\n"
                  "- [Changelog](https://s/log)\n")))
        .when(m == 1, F.concat(F.lit("# Tiny"), ds, F.lit("\n")))
        .otherwise(F.lit("User-agent: *\nDisallow: /\n"))
    )
    files = _docs(spark, sf_dir).select(
        F.concat(F.lit("m"), ds, F.lit(".com")).alias("host"),
        body.alias("body"),
    )
    # nullable boolean hashes differently in the driver compare
    # (repo gotcha) -> has_summary as 0/1 int
    return parse_llms_txt(files).withColumn(
        "has_summary", F.col("has_summary").cast("int")
    ).orderBy("host")


ORACLE_LLMS_TXT = """
WITH r AS (
  SELECT doc_id, doc_id % 3 AS m, 'm' || doc_id || '.com' AS host
  FROM documents
)
SELECT host,
       CASE m WHEN 0 THEN 'Site' || doc_id
            WHEN 1 THEN 'Tiny' || doc_id END AS title,
       CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN 0 END AS INTEGER)
         AS has_summary,
       CAST(CASE m WHEN 0 THEN 2 WHEN 1 THEN 0 END AS BIGINT)
         AS n_sections,
       CAST(CASE m WHEN 0 THEN 3 WHEN 1 THEN 0 END AS BIGINT)
         AS n_links,
       CAST(CASE m WHEN 0 THEN 1 WHEN 1 THEN 0 END AS BIGINT)
         AS n_optional_links,
       m IN (0, 1) AS present
FROM r
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ads_txt": q_ads_txt,
        "webmanifest": q_webmanifest,
        "ttr_windowed": q_ttr,
        "llms_txt": q_llms_txt,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ads_txt": ORACLE_ADS_TXT,
        "webmanifest": ORACLE_WEBMANIFEST,
        "ttr_windowed": ORACLE_TTR,
        "llms_txt": ORACLE_LLMS_TXT,
    }
