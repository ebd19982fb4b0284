"""Round-3 queries, part 41: URL-layout translation-pair mining,
per-source quality drift trend.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# lang_path_pairs — /en/... vs /de/... parallel-page candidates
# --------------------------------------------------------------------------

def q_lang_path_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.lang_path_pairs over 3 hosts: the language segment comes
    from (doc div 60) % 3 so docs sharing a (host, residual) group span
    en/de/fr (decoupled from the group key's residues); doc%97 rows use
    a non-language '/x/' prefix (must be ignored) and doc%101 rows get
    unique residuals (filtered by the >=2-langs rule).  langs emitted
    comma-joined so the compare stays scalar."""
    from .canon import lang_path_pairs

    doc = F.col("doc_id")
    lang = (
        F.when((doc / 60).cast("long") % 3 == 0, "en")
        .when((doc / 60).cast("long") % 3 == 1, "de")
        .otherwise("fr")
    )
    path = (
        F.when(doc % 97 == 0,
               F.concat(F.lit("/x/art"), (doc % 20).cast("string")))
        .when(doc % 101 == 0,
              F.concat(F.lit("/en/only"), doc.cast("string")))
        .otherwise(F.concat(F.lit("/"), lang, F.lit("/art"),
                            (doc % 20).cast("string")))
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 3).cast("string")).alias("host"),
        F.concat(F.lit("https://h"), (doc % 3).cast("string"),
                 F.lit(".test"), path).alias("url"),
    )
    out = lang_path_pairs(d)
    return out.select(
        "host", "residual", "n_langs",
        F.array_join("langs", ",").alias("langs_joined"),
    ).orderBy("host", "residual")


ORACLE_LANG_PATH_PAIRS = """
WITH u AS (
  SELECT 'h' || CAST(doc_id % 3 AS VARCHAR) AS host,
         CASE (doc_id // 60) % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
              ELSE 'fr' END AS lang,
         CASE WHEN doc_id % 101 = 0 AND doc_id % 97 <> 0
                THEN '/only' || CAST(doc_id AS VARCHAR)
              ELSE '/art' || CAST(doc_id % 20 AS VARCHAR) END AS residual,
         CASE WHEN doc_id % 101 = 0 AND doc_id % 97 <> 0
                THEN 'en' ELSE NULL END AS forced_lang
  FROM documents
  WHERE doc_id % 97 <> 0
),
d AS (SELECT DISTINCT host, residual,
             COALESCE(forced_lang, lang) AS lang FROM u),
g AS (
  SELECT host, residual, COUNT(*) AS n_langs,
         string_agg(lang, ',' ORDER BY lang) AS langs_joined
  FROM d GROUP BY host, residual
)
SELECT host, residual, CAST(n_langs AS BIGINT) AS n_langs, langs_joined
FROM g WHERE n_langs >= 2
ORDER BY host, residual
"""


# --------------------------------------------------------------------------
# quality_drift — integer least-squares trend per source
# --------------------------------------------------------------------------

def q_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.quality_drift over four synthetic sources: one
    improving, one declining, one exactly flat, one noisy — slope kept
    as the exact rational (num, den) + trend class."""
    from .textops.quality import quality_drift

    doc = F.col("doc_id")
    s = doc % 4
    day = doc % 10
    score = (
        F.when(s == 0, 100 + day * 3)
        .when(s == 1, 500 - day * 2)
        .when(s == 2, F.lit(300))
        .otherwise(200 + doc % 7)
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("s"), s.cast("string")).alias("source"),
        day.alias("day"),
        score.cast("long").alias("score"),
    )
    return quality_drift(d).orderBy("source")


ORACLE_QUALITY_DRIFT = """
WITH rows_ AS (
  SELECT 's' || CAST(doc_id % 4 AS VARCHAR) AS source,
         doc_id % 10 AS day,
         CASE doc_id % 4
           WHEN 0 THEN 100 + (doc_id % 10) * 3
           WHEN 1 THEN 500 - (doc_id % 10) * 2
           WHEN 2 THEN 300
           ELSE 200 + doc_id % 7 END AS score
  FROM documents
),
per_day AS (
  SELECT source, day,
         CAST(floor(SUM(score * 1000) / COUNT(*)) AS BIGINT) AS m
  FROM rows_ GROUP BY source, day
),
agg AS (
  SELECT source, COUNT(*) AS n_days, SUM(day) AS sx, SUM(m) AS sy,
         SUM(day * m) AS sxy, SUM(day * day) AS sxx
  FROM per_day GROUP BY source
)
SELECT source, CAST(n_days AS BIGINT) AS n_days,
       CAST(sy // n_days AS BIGINT) AS mean_milli_overall,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
       CASE WHEN n_days < 2 OR n_days * sxx - sx * sx = 0
              THEN 'insufficient'
            WHEN n_days * sxy - sx * sy > 0 THEN 'improving'
            WHEN n_days * sxy - sx * sy < 0 THEN 'declining'
            ELSE 'flat' END AS trend
FROM agg ORDER BY source
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lang_path_pairs": q_lang_path_pairs,
        "quality_drift": q_quality_drift,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lang_path_pairs": ORACLE_LANG_PATH_PAIRS,
        "quality_drift": ORACLE_QUALITY_DRIFT,
    }
