"""Round-3 queries, part 28: web-asset magic sniffing, DAU/MAU
stickiness, emoji density, per-host title-template mining.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# asset_sniff
# --------------------------------------------------------------------------

def q_asset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.web_asset_sniff over woff2/woff/ttf/otf/wasm/gzip magic
    bytes, a css-ish text payload, and a binary blob."""
    from .media import web_asset_sniff

    doc = F.col("doc_id")
    m = doc % 8
    hexstr = (
        F.when(m == 0, F.lit("774F463200010000"))
        .when(m == 1, F.lit("774F464600010000"))
        .when(m == 2, F.lit("0001000000170080"))
        .when(m == 3, F.lit("4F54544F00100080"))
        .when(m == 4, F.lit("0061736D01000000"))
        .when(m == 5, F.lit("1F8B080000000000"))
        .when(m == 6, F.lit("626F6479207B206D617267696E3A20303B207D"))
        .otherwise(F.lit("FE00FF0012349876"))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return web_asset_sniff(docs).select("doc_id", "asset_kind") \
        .orderBy("doc_id")


ORACLE_ASSET_SNIFF = """
SELECT doc_id,
       CASE doc_id % 8 WHEN 0 THEN 'woff2' WHEN 1 THEN 'woff'
            WHEN 2 THEN 'ttf' WHEN 3 THEN 'otf' WHEN 4 THEN 'wasm'
            WHEN 5 THEN 'gzip' WHEN 6 THEN 'text' ELSE 'binary' END
         AS asset_kind
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# stickiness
# --------------------------------------------------------------------------

def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.stickiness_ratios over the events month; the oracle
    replays the day/week/user distinct chains."""
    from .streaming import stickiness_ratios

    return stickiness_ratios(_events(spark, sf_dir))


ORACLE_STICKINESS = """
WITH du AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
  FROM events
),
dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS a FROM du GROUP BY d),
wau AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS a FROM (
    SELECT DISTINCT d // 7 AS w, u FROM du) GROUP BY w
),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(a) AS BIGINT) AS dau_sum FROM dau),
wp AS (SELECT CAST(MAX(a) AS BIGINT) AS wau_peak FROM wau),
m AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS mau FROM du)
SELECT n_days, (1000 * dau_sum) // n_days AS avg_dau_milli,
       wau_peak, mau,
       (1000 * dau_sum) // (n_days * mau) AS stickiness_permille
FROM s CROSS JOIN wp CROSS JOIN m
"""


# --------------------------------------------------------------------------
# emoji_density
# --------------------------------------------------------------------------

def q_emoji_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.emoji_density over a 30-char text prefix plus a
    planted emoji tail per doc%4 (none / fire x2 / sun+flag / all)."""
    from .textops.quality import emoji_density

    doc = F.col("doc_id")
    m = doc % 4
    tail = (
        F.when(m == 1, F.lit(" 🔥🔥"))
        .when(m == 2, F.lit(" ☀🇺🇸"))
        .when(m == 3, F.lit(" 🔥☀🎉"))
        .otherwise(F.lit(""))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.substring(F.col("text"), 1, 30), tail).alias("text"),
    )
    return emoji_density(docs).orderBy("id")


ORACLE_EMOJI = """
WITH d AS (
  SELECT doc_id AS id, doc_id % 4 AS m,
         length(substring(text, 1, 30)) AS base_len
  FROM documents
)
SELECT id,
       CAST(base_len + CASE m WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 4 END
            AS BIGINT) AS n_chars,
       CAST(CASE m WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
            ELSE 3 END AS BIGINT) AS n_emoji,
       CAST((1000 * CASE m WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 3
                     ELSE 3 END)
            // (base_len + CASE m WHEN 0 THEN 0 WHEN 1 THEN 3 ELSE 4
                           END) AS BIGINT)
         AS emoji_permille
FROM d
ORDER BY id
"""


# --------------------------------------------------------------------------
# title_template
# --------------------------------------------------------------------------

def q_title_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.title_template_suffix over 25 hosts: 20 with a
    ' | Site<k>' template across their pages, 5 with unrelated
    titles (no confident suffix)."""
    from .extract import title_template_suffix

    doc = F.col("doc_id")
    k = doc % 25
    templated = k < 20
    title = F.when(
        templated,
        F.concat(F.lit("Story "), doc.cast("string"),
                 F.lit(" | Site"), k.cast("string")),
    ).otherwise(F.concat(F.lit("Free title "), doc.cast("string")))
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("t"), k.cast("string"), F.lit(".com"))
        .alias("host"),
        title.alias("title"),
    )
    return title_template_suffix(pages).orderBy("host")


# scale-generic oracle (round-5 fix: n_pages was hard-coded to the
# 500-doc fixture's 20 pages/host and broke at sf0.1)
ORACLE_TITLE_TEMPLATE = """
WITH p AS (
  SELECT doc_id % 25 AS k, CAST(COUNT(*) AS BIGINT) AS n_pages
  FROM documents GROUP BY doc_id % 25
)
SELECT 't' || k || '.com' AS host,
       n_pages,
       CASE WHEN k < 20 THEN ' | Site' || k END AS template_suffix,
       CAST(CASE WHEN k < 20 THEN length(' | Site' || k) END AS BIGINT)
         AS suffix_len
FROM p
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asset_sniff": q_asset_sniff,
        "stickiness": q_stickiness,
        "emoji_density": q_emoji_density,
        "title_template": q_title_template,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "asset_sniff": ORACLE_ASSET_SNIFF,
        "stickiness": ORACLE_STICKINESS,
        "emoji_density": ORACLE_EMOJI,
        "title_template": ORACLE_TITLE_TEMPLATE,
    }
