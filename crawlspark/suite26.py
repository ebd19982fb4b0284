"""Round-3 queries, part 6: image license compliance, cross-host mirror
detection, aspect-preserving resize planning.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the construction, string statuses instead of nullable
booleans, integer-exact arithmetic (div, permille)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# image_license — rights signals for image+caption compliance
# --------------------------------------------------------------------------

_CC_BY = "https://creativecommons.org/licenses/by/4.0/"
_CC_NCSA = "https://creativecommons.org/licenses/by-nc-sa/4.0/"
_CC0 = "https://creativecommons.org/publicdomain/zero/1.0/"
_TERMS = "https://example.com/terms"


def q_image_license(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.license_signals + classify_license over a 5-case page
    matrix: rel=license anchor (cc-by), itemprop meta (cc-by-nc-sa),
    JSON-LD (cc0), rel WITH a competing JSON-LD (rel wins, non-CC URL
    -> 'other'), and no license at all."""
    from .extract import classify_license, license_signals

    doc = F.col("doc_id")
    r = doc % 5
    body = (
        F.when(r == 0, f'<p><a rel="license" href="{_CC_BY}">cc</a></p>')
        .when(r == 1, f'<head><meta itemprop="license" content="{_CC_NCSA}"></head>')
        .when(r == 2, '<script type="application/ld+json">'
              f'{{"@type":"ImageObject","license":"{_CC0}"}}</script>')
        .when(r == 3, f'<a href="{_TERMS}" rel="license">terms</a>'
              f'<script>{{"license":"{_CC_BY}"}}</script>')
        .otherwise(F.lit("<html><body>plain</body></html>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    sig = license_signals(F.col("body"))
    return d.select(
        "doc_id",
        sig["license_url"].alias("license_url"),
        sig["source"].alias("source"),
        classify_license(sig["license_url"]).alias("license_class"),
    )


ORACLE_IMAGE_LICENSE = f"""
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN '{_CC_BY}' WHEN 1 THEN '{_CC_NCSA}'
            WHEN 2 THEN '{_CC0}' WHEN 3 THEN '{_TERMS}' END AS license_url,
       CASE doc_id % 5 WHEN 0 THEN 'rel' WHEN 1 THEN 'itemprop'
            WHEN 2 THEN 'jsonld' WHEN 3 THEN 'rel'
            ELSE 'none' END AS source,
       CASE doc_id % 5 WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-nc-sa'
            WHEN 2 THEN 'cc0' WHEN 3 THEN 'other'
            ELSE 'none' END AS license_class
FROM documents
"""


# --------------------------------------------------------------------------
# host_mirrors — shared-fingerprint containment pairs
# --------------------------------------------------------------------------

_BOILER_FP = 999999


def q_host_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.host_mirrors over 5 constructed hosts: h1 is a full
    mirror of h0 (identical fingerprint sets), h2 a half-size full
    mirror (containment 1000 via the SMALLER corpus), h3 disjoint, h4
    a 25% partial overlap (below the 800-permille bar); a boilerplate
    fingerprint planted on every host is dropped by the supernode cap
    (max 4 hosts) and must not inflate any pair."""
    from .linkgraph import host_mirrors

    doc = F.col("doc_id")
    r = doc % 5
    fp = (
        F.when(r.isin(0, 1), F.expr("doc_id div 5"))
        .when(r == 2, F.expr("doc_id div 10"))
        .when(r == 3, F.expr("1000 + doc_id div 5"))
        .otherwise(
            F.when(doc % 20 == 4, F.expr("doc_id div 5"))
            .otherwise(F.expr("2000 + doc_id div 5"))
        )
    )
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), r.cast("string")).alias("host"),
        F.explode(F.array(fp, F.lit(_BOILER_FP))).alias("content_fp"),
    )
    return host_mirrors(
        pages, max_hosts_per_fp=4, mirror_permille=800, min_shared=10
    ).orderBy("host_a", "host_b")


ORACLE_HOST_MIRRORS = f"""
WITH raw AS (
  SELECT 'h' || (doc_id % 5) AS host,
         CASE WHEN doc_id % 5 IN (0, 1) THEN doc_id // 5
              WHEN doc_id % 5 = 2 THEN doc_id // 10
              WHEN doc_id % 5 = 3 THEN 1000 + doc_id // 5
              WHEN doc_id % 20 = 4 THEN doc_id // 5
              ELSE 2000 + doc_id // 5 END AS fp
  FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 5), {_BOILER_FP} FROM documents
),
hf AS (SELECT DISTINCT host, fp FROM raw),
keep AS (SELECT fp FROM hf GROUP BY fp HAVING COUNT(DISTINCT host) <= 4),
hf2 AS (SELECT hf.host, hf.fp FROM hf JOIN keep USING (fp)),
sizes AS (SELECT host, COUNT(DISTINCT fp) AS n_fps FROM hf2 GROUP BY host),
shared AS (
  SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS n_shared
  FROM hf2 a JOIN hf2 b ON a.fp = b.fp AND a.host < b.host
  GROUP BY a.host, b.host
)
SELECT host_a, host_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(sa.n_fps AS BIGINT) AS n_a, CAST(sb.n_fps AS BIGINT) AS n_b,
       CAST((1000 * n_shared) // least(sa.n_fps, sb.n_fps) AS BIGINT)
         AS containment_permille,
       (1000 * n_shared) // least(sa.n_fps, sb.n_fps) >= 800
         AND n_shared >= 10 AS is_mirror
FROM shared
JOIN sizes sa ON sa.host = host_a
JOIN sizes sb ON sb.host = host_b
ORDER BY host_a, host_b
"""


# --------------------------------------------------------------------------
# resize_plan — aspect-preserving, grid-snapped target dims
# --------------------------------------------------------------------------

def q_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.resize_plan (target 512, snap 64, floor 64) over dims
    w=16+(doc*13)%1200, h=16+(doc*7)%900 — covers down/up/keep modes,
    extreme aspect ratios hitting the min_side floor, and exact-512
    rows; the oracle replays the integer formula."""
    from .mmcurate import resize_plan

    doc = F.col("doc_id")
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        (16 + (doc * 13) % 1200).cast("long").alias("w"),
        (16 + (doc * 7) % 900).cast("long").alias("h"),
    )
    return resize_plan(imgs).select(
        "image_id", "w", "h", "out_w", "out_h", "scale_permille", "mode"
    )


ORACLE_RESIZE_PLAN = """
WITH i AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         CAST(16 + (doc_id * 13) % 1200 AS BIGINT) AS w,
         CAST(16 + (doc_id * 7) % 900 AS BIGINT) AS h
  FROM documents
),
j AS (
  SELECT image_id, w, h,
         greatest(w, h) AS lo, least(w, h) AS sh,
         greatest(64, (((least(w, h) * 512) // greatest(w, h)) // 64) * 64)
           AS short_out
  FROM i
)
SELECT image_id, w, h,
       CAST(CASE WHEN w >= h THEN 512 ELSE short_out END AS BIGINT) AS out_w,
       CAST(CASE WHEN w >= h THEN short_out ELSE 512 END AS BIGINT) AS out_h,
       CAST((1000 * 512) // lo AS BIGINT) AS scale_permille,
       CASE WHEN lo > 512 THEN 'down' WHEN lo < 512 THEN 'up'
            ELSE 'keep' END AS mode
FROM j
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "image_license": q_image_license,
        "host_mirrors": q_host_mirrors,
        "resize_plan": q_resize_plan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "image_license": ORACLE_IMAGE_LICENSE,
        "host_mirrors": ORACLE_HOST_MIRRORS,
        "resize_plan": ORACLE_RESIZE_PLAN,
    }
