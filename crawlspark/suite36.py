"""Round-3 queries, part 7: ordered event funnels and JPEG SOF
dimension sniffing.

- event_funnel: sequence-respecting conversion steps over the events
  table (view -> click -> purchase), each step one partial-min groupBy +
  user equi-join.
- jpeg_sniff: variable-offset marker walk (Arrow-batched pandas UDF) to
  the first SOFn frame; baseline vs progressive, truncation-safe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FUNNEL_STEPS = ["view", "click", "purchase"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# event_funnel
# --------------------------------------------------------------------------

def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """suite.event_funnel over the events table: per user the earliest
    view, the earliest click strictly after it, the earliest purchase
    strictly after that — epoch-micro longs, NULL from the first
    uncompleted step; the oracle replays the chained min-after joins."""
    from .suite import event_funnel

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_funnel(events, FUNNEL_STEPS).orderBy("user_id")


ORACLE_EVENT_FUNNEL = """
WITH base AS (
  SELECT user_id, event_type AS et, epoch_us(ts) AS ts_us FROM events
),
users AS (SELECT DISTINCT user_id FROM base),
s1 AS (
  SELECT user_id, MIN(ts_us) AS t1_us FROM base
  WHERE et = 'view' GROUP BY user_id
),
s2 AS (
  SELECT b.user_id, MIN(b.ts_us) AS t2_us
  FROM base b JOIN s1 ON s1.user_id = b.user_id
  WHERE b.et = 'click' AND b.ts_us > s1.t1_us
  GROUP BY b.user_id
),
s3 AS (
  SELECT b.user_id, MIN(b.ts_us) AS t3_us
  FROM base b JOIN s2 ON s2.user_id = b.user_id
  WHERE b.et = 'purchase' AND b.ts_us > s2.t2_us
  GROUP BY b.user_id
)
SELECT u.user_id, s1.t1_us, s2.t2_us, s3.t3_us,
       CAST((CASE WHEN s1.t1_us IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN s2.t2_us IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN s3.t3_us IS NOT NULL THEN 1 ELSE 0 END)
            AS INTEGER) AS steps_completed
FROM users u
LEFT JOIN s1 ON s1.user_id = u.user_id
LEFT JOIN s2 ON s2.user_id = u.user_id
LEFT JOIN s3 ON s3.user_id = u.user_id
ORDER BY u.user_id
"""


# --------------------------------------------------------------------------
# jpeg_sniff
# --------------------------------------------------------------------------

def q_jpeg_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.jpeg_sof_dims over constructed JPEG headers: SOI + APP0
    (+ a COM segment for every doc%4==1, shifting the SOF offset),
    SOF0 baseline / SOF2 progressive, and a SOF-less truncated family
    that must return NULLs; dims w=200+doc%500, h=100+doc%400 stated by
    the oracle."""
    from .images import jpeg_sof_dims

    doc = F.col("doc_id")
    w = (200 + doc % 500).cast("long")
    h = (100 + doc % 400).cast("long")
    m = doc % 4

    def be16(col):
        return F.lpad(F.hex(col.cast("long")), 4, "0")

    app0 = F.lit("FFE0" "0010" "4A46494600010100000100010000")
    com = F.lit("FFFE" "0008" "48454C4C4F21")
    sof_body = F.concat(
        F.lit("0011" "08"), be16(h), be16(w),
        F.lit("03" "011100" "021101" "031101"),
    )
    hexstr = (
        F.when(m == 0, F.concat(F.lit("FFD8"), app0,
                                F.lit("FFC0"), sof_body))
        .when(m == 1, F.concat(F.lit("FFD8"), app0, com,
                               F.lit("FFC0"), sof_body))
        .when(m == 2, F.concat(F.lit("FFD8"), app0,
                               F.lit("FFC2"), sof_body))
        .otherwise(F.concat(F.lit("FFD8"), app0, F.lit("FFD9")))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"),
    )
    return jpeg_sof_dims(imgs).select(
        "doc_id", "jpeg_kind", "sniff_w", "sniff_h"
    ).orderBy("doc_id")


ORACLE_JPEG = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'baseline' WHEN 1 THEN 'baseline'
         WHEN 2 THEN 'progressive' END AS jpeg_kind,
       CASE WHEN doc_id % 4 < 3 THEN CAST(200 + doc_id % 500 AS BIGINT)
       END AS sniff_w,
       CASE WHEN doc_id % 4 < 3 THEN CAST(100 + doc_id % 400 AS BIGINT)
       END AS sniff_h
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "event_funnel": q_event_funnel,
        "jpeg_sniff": q_jpeg_sniff,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "event_funnel": ORACLE_EVENT_FUNNEL,
        "jpeg_sniff": ORACLE_JPEG,
    }
