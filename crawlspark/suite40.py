"""Round-3 queries, part 11: RFC 5861 staleness extensions and PNG
color-type sniffing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SP_NOW = 1000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# stale_policy — RFC 5861 stale-while-revalidate / stale-if-error
# --------------------------------------------------------------------------

def q_stale_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.stale_policy over 5 directive families x ages 0..499 s
    (lifetime 100): swr-only, sie-only, both, no-cache carried through,
    bare max-age; the oracle replays the window arithmetic."""
    from .sinks import stale_policy

    doc = F.col("doc_id")
    m = doc % 5
    cc = (
        F.when(m == 0, F.lit("max-age=100, stale-while-revalidate=50"))
        .when(m == 1, F.lit("max-age=100, stale-if-error=300"))
        .when(m == 2, F.lit("max-age=100, stale-while-revalidate=50, "
                            "stale-if-error=300"))
        .when(m == 3, F.lit("no-cache, stale-while-revalidate=50"))
        .otherwise(F.lit("max-age=100"))
    )
    rows = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), cc.alias("cache_control"),
        F.lit(None).cast("long").alias("expires_ts"),
        F.lit(SP_NOW).cast("long").alias("date_ts"),
        F.lit(None).cast("long").alias("last_modified_ts"),
        (doc % 500).cast("long").alias("age_s"),
        F.lit(SP_NOW).cast("long").alias("response_ts"),
    )
    return stale_policy(rows, now_ts=SP_NOW).select(
        "doc_id", "current_age_s", "swr_s", "sie_s", "stale_state"
    ).orderBy("doc_id")


ORACLE_STALE_POLICY = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS m,
         CAST(doc_id % 500 AS BIGINT) AS age
  FROM documents
)
SELECT doc_id, age AS current_age_s,
       CAST(CASE WHEN m IN (0, 2, 3) THEN 50 ELSE 0 END AS BIGINT) AS swr_s,
       CAST(CASE WHEN m IN (1, 2) THEN 300 ELSE 0 END AS BIGINT) AS sie_s,
       CASE WHEN m = 3 THEN 'must_revalidate'
            WHEN age < 100 THEN 'fresh'
            WHEN m = 0 THEN
              CASE WHEN age < 150 THEN 'stale_serve_revalidate'
                   ELSE 'expired' END
            WHEN m = 1 THEN
              CASE WHEN age < 400 THEN 'stale_if_error_only'
                   ELSE 'expired' END
            WHEN m = 2 THEN
              CASE WHEN age < 150 THEN 'stale_serve_revalidate'
                   WHEN age < 400 THEN 'stale_if_error_only'
                   ELSE 'expired' END
            ELSE 'expired' END AS stale_state
FROM d
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# png_color — IHDR bit depth / color type / interlace
# --------------------------------------------------------------------------

def q_png_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.png_color_profile over constructed IHDR headers: the five
    spec color types at varying bit depths + interlace flags, plus a
    GIF payload that must come back NULL; the oracle states each
    family."""
    from .images import png_color_profile

    doc = F.col("doc_id")
    m = doc % 6

    def ihdr(depth: str, ctype: str, inter: str):
        return F.lit(
            "89504E470D0A1A0A" "0000000D" "49484452"
            "00000020" "00000018" + depth + ctype + "0000" + inter
        )

    hexstr = (
        F.when(m == 0, ihdr("08", "00", "00"))
        .when(m == 1, ihdr("08", "02", "01"))
        .when(m == 2, ihdr("08", "03", "00"))
        .when(m == 3, ihdr("10", "04", "00"))
        .when(m == 4, ihdr("08", "06", "01"))
        .otherwise(F.lit("474946383961" + "2000" + "1800" + "F70000"
                         + "00000000000000000000000000000000"))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"),
    )
    return png_color_profile(imgs).select(
        "doc_id", "png_bit_depth", "png_color_type", "png_interlaced"
    ).orderBy("doc_id")


ORACLE_PNG_COLOR = """
SELECT doc_id,
       CAST(CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 8 WHEN 1 THEN 8 WHEN 2 THEN 8
         WHEN 3 THEN 16 WHEN 4 THEN 8 END AS BIGINT) AS png_bit_depth,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 'grayscale' WHEN 1 THEN 'truecolor'
         WHEN 2 THEN 'palette' WHEN 3 THEN 'grayscale_alpha'
         WHEN 4 THEN 'truecolor_alpha' END AS png_color_type,
       CAST(CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 0
         WHEN 3 THEN 0 WHEN 4 THEN 1 END AS INTEGER) AS png_interlaced
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stale_policy": q_stale_policy,
        "png_color": q_png_color,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stale_policy": ORACLE_STALE_POLICY,
        "png_color": ORACLE_PNG_COLOR,
    }
