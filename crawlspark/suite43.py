"""Round-3 queries, part 14: weighted corpus subsampling and
empirical-Bayes host priors.

- priority_sample: Duffield-Lund-Thorup priority sampling per language
  (weighted without replacement + unbiased subset-sum re-weighting),
  quantized to integer priorities so the DuckDB oracle replays the
  exact draw.
- host_shrinkage: beta-binomial posterior quality rate per source —
  raw rates shrink toward the corpus rate in proportion to evidence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scheduler import host_quality_shrinkage
from .textops.curate import (PRIORITY_EST_SCALE, PRIORITY_SCALE,
                             priority_sample)
from .textops.dedup import BASE_HASH_SQL

_K = 12
_GOOD_CHARS = 306
_PRIOR_M = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curate.priority_sample on documents: weight = n_chars + 1,
    stratum = lang, k = 12 — long docs are proportionally more likely
    to be drawn, and est_scaled >> 11 re-weights the kept rows so
    per-language total char counts stay estimable.  The oracle replays
    the integer-quantized priorities (w << 43) div u exactly."""
    docs = _docs(spark, sf_dir).withColumn(
        "w", (F.col("n_chars") + 1).cast("long"))
    out = priority_sample(docs, "lang", "w", _K)
    return out.select(
        "lang", "doc_id", "weight", "qk", "rn", "tau_qk", "est_scaled"
    ).orderBy("lang", "rn")


_U = BASE_HASH_SQL.format(x="'prio' || CAST(doc_id AS VARCHAR)")

ORACLE_PRIORITY = f"""
WITH r AS (
  SELECT lang, doc_id, CAST(n_chars + 1 AS BIGINT) AS weight,
         (CAST(n_chars + 1 AS BIGINT) * {PRIORITY_SCALE})
           // ({_U} + 1) AS qk
  FROM documents
),
rn AS (
  SELECT lang, doc_id, weight, qk,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY qk DESC, doc_id) AS BIGINT) AS rn
  FROM r
),
tau AS (
  SELECT *, MAX(CASE WHEN rn = {_K + 1} THEN qk END)
              OVER (PARTITION BY lang) AS tau_qk
  FROM rn
)
SELECT lang, doc_id, weight, qk, rn, tau_qk,
       GREATEST(weight * {PRIORITY_EST_SCALE}, COALESCE(tau_qk, 0))
         AS est_scaled
FROM tau WHERE rn <= {_K}
ORDER BY lang, rn
"""


def q_host_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.host_quality_shrinkage on documents grouped by source
    (the site unit in this corpus): is_good = n_chars >= 306 (the
    corpus median), prior strength M = 50 pseudo-pages.  Sources with
    25 pages shrink most of the way to the corpus rate — the oracle
    replays the integer posterior (M*p_global + 1000*k) div (M+n)."""
    pages = _docs(spark, sf_dir).select(
        F.col("source").alias("host"),
        (F.col("n_chars") >= _GOOD_CHARS).alias("is_good"),
    )
    out = host_quality_shrinkage(pages, prior_strength=_PRIOR_M)
    return out.select(
        "host", "n_pages", "n_good", "raw_permille", "post_permille",
        "shrink_permille", "global_permille",
    ).orderBy("host")


ORACLE_SHRINKAGE = f"""
WITH per AS (
  SELECT source AS host, COUNT(*) AS n_pages,
         CAST(SUM(CASE WHEN n_chars >= {_GOOD_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_good
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST((1000 * SUM(CASE WHEN n_chars >= {_GOOD_CHARS}
                          THEN 1 ELSE 0 END)) // COUNT(*)
              AS BIGINT) AS pg
  FROM documents
)
SELECT host, n_pages, n_good,
       (1000 * n_good) // n_pages AS raw_permille,
       ({_PRIOR_M} * pg + 1000 * n_good) // ({_PRIOR_M} + n_pages)
         AS post_permille,
       ({_PRIOR_M} * pg + 1000 * n_good) // ({_PRIOR_M} + n_pages)
         - (1000 * n_good) // n_pages AS shrink_permille,
       pg AS global_permille
FROM per, tot
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "priority_sample": q_priority_sample,
        "host_shrinkage": q_host_shrinkage,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "priority_sample": ORACLE_PRIORITY,
        "host_shrinkage": ORACLE_SHRINKAGE,
    }
