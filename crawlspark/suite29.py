"""Round-3 queries, part 9: exact-order-statistic operators — adaptive
per-host timeouts (p95 latency) and bytes-per-pixel outlier gating
(per-format median).

House rules: deterministic fixtures, DuckDB oracles replaying the rank
arithmetic (row_number at ceil(0.95 n) / (n+1) div 2 — NEVER a float
percentile), integer-exact clamps and permilles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# adaptive_timeouts — clamp(2 x exact p95) per host
# --------------------------------------------------------------------------

def q_adaptive_timeouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.adaptive_timeouts over 20 hosts x 25 latency samples
    (50 + (doc*7919)%1000 ms): p95 is the exact rank-ceil(0.95x25)=24
    order statistic per host, timeout = clamp(2 x p95, 1s, 30s); the
    oracle replays the identical row_number rank."""
    from .politeness import adaptive_timeouts

    doc = F.col("doc_id")
    responses = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 20).cast("string")).alias("host"),
        (50 + (doc * 7919) % 1000).cast("long").alias("latency_ms"),
    )
    return adaptive_timeouts(responses).orderBy("host")


ORACLE_ADAPTIVE_TIMEOUTS = """
WITH r AS (
  SELECT 'h' || (doc_id % 20) AS host,
         CAST(50 + (doc_id * 7919) % 1000 AS BIGINT) AS lat
  FROM documents
),
ranked AS (
  SELECT host, lat,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY lat) AS rn,
         COUNT(*) OVER (PARTITION BY host) AS n
  FROM r
)
SELECT host, CAST(n AS BIGINT) AS n_samples, lat AS p95_ms,
       CAST(greatest(1000, least(30000, (lat * 2000) // 1000))
            AS BIGINT) AS timeout_ms
FROM ranked
WHERE rn = greatest(1, (95 * n + 99) // 100)
ORDER BY host
"""


# --------------------------------------------------------------------------
# image_bpp_outliers — per-format median gate
# --------------------------------------------------------------------------

def q_image_bpp_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.bytes_per_pixel_outliers over three formats with planted
    anomalies: normal rows at ~2000 bpp-permille, every doc%17==0 row
    bloated x10, every doc%19==0 row at ~1/10 (precedence bloat first),
    and a zero-area row on doc%23==0 (unmeasurable); the oracle replays
    the per-format lower-median rank and the x3 band."""
    from .images import bytes_per_pixel_outliers

    doc = F.col("doc_id")
    w = (100 + doc % 10).cast("long")
    h = F.when(doc % 23 == 0, F.lit(0)).otherwise(80 + doc % 7).cast("long")
    area = w * h
    base = area * 2 + doc % 50  # ~2000 permille with jitter
    nbytes = (
        F.when(doc % 17 == 0, base * 10)
        .when(doc % 19 == 0, F.expr(
            "((100 + doc_id % 10) * (80 + doc_id % 7) * 2 + doc_id % 50)"
            " div 10"))
        .otherwise(base)
    ).cast("long")
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        F.when(doc % 3 == 0, "png").when(doc % 3 == 1, "jpeg")
        .otherwise("webp").alias("fmt"),
        w.alias("w"), h.alias("h"), nbytes.alias("nbytes"),
    )
    return bytes_per_pixel_outliers(imgs).select(
        "image_id", "fmt", "bpp_permille", "fmt_median_bpp", "bpp_class"
    )


ORACLE_IMAGE_BPP = """
WITH i AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
              ELSE 'webp' END AS fmt,
         CAST(100 + doc_id % 10 AS BIGINT) AS w,
         CAST(CASE WHEN doc_id % 23 = 0 THEN 0
                   ELSE 80 + doc_id % 7 END AS BIGINT) AS h,
         CAST(CASE
           WHEN doc_id % 17 = 0 THEN
             ((100 + doc_id % 10) * (80 + doc_id % 7) * 2 + doc_id % 50) * 10
           WHEN doc_id % 19 = 0 THEN
             ((100 + doc_id % 10) * (80 + doc_id % 7) * 2 + doc_id % 50) // 10
           ELSE (100 + doc_id % 10) * (80 + doc_id % 7) * 2 + doc_id % 50
           END AS BIGINT) AS nbytes
  FROM documents
),
b AS (
  SELECT image_id, fmt, w, h, nbytes,
         CASE WHEN w * h > 0 THEN (1000 * nbytes) // (w * h) END
           AS bpp_permille
  FROM i
),
ranked AS (
  SELECT fmt, bpp_permille,
         ROW_NUMBER() OVER (PARTITION BY fmt ORDER BY bpp_permille) AS rn,
         COUNT(*) OVER (PARTITION BY fmt) AS n
  FROM b WHERE bpp_permille IS NOT NULL
),
med AS (
  SELECT fmt, bpp_permille AS fmt_median_bpp
  FROM ranked WHERE rn = (n + 1) // 2
)
SELECT b.image_id, b.fmt, b.bpp_permille, med.fmt_median_bpp,
       CASE WHEN b.bpp_permille IS NULL THEN 'unmeasurable'
            WHEN b.bpp_permille > med.fmt_median_bpp * 3 THEN 'bloated'
            WHEN b.bpp_permille * 3 < med.fmt_median_bpp THEN 'tiny'
            ELSE 'ok' END AS bpp_class
FROM b LEFT JOIN med ON b.fmt = med.fmt
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "adaptive_timeouts": q_adaptive_timeouts,
        "image_bpp_outliers": q_image_bpp_outliers,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "adaptive_timeouts": ORACLE_ADAPTIVE_TIMEOUTS,
        "image_bpp_outliers": ORACLE_IMAGE_BPP,
    }
