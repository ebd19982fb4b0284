"""Round-3 queries, part 6: WebP header sniffing (all three bitstream
variants) and mergeable decimal latency histograms with quantile bounds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# webp_sniff
# --------------------------------------------------------------------------

def q_webp_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.sniff_webp_dims over constructed RIFF containers: lossy
    'VP8 ' (sync-coded 14-bit dims), lossless 'VP8L' (bit-packed
    width-1/height-1), extended 'VP8X' (24-bit LE canvas), and a junk
    payload that must sniff as NULLs; dims w=100+doc%300, h=50+doc%200
    are stated arithmetically by the oracle."""
    from .images import sniff_webp_dims

    doc = F.col("doc_id")
    w = (100 + doc % 300).cast("long")
    h = (50 + doc % 200).cast("long")
    m = doc % 4

    def h2(col):
        return F.lpad(F.hex(col.cast("long")), 2, "0")

    le16_w = F.concat(h2(w % 256), h2((w / 256).cast("long")))
    le16_h = F.concat(h2(h % 256), h2((h / 256).cast("long")))

    def le24(col):
        return F.concat(h2(col % 256), h2((col / 256).cast("long") % 256),
                        h2((col / 65536).cast("long")))

    head = F.concat(F.lit("52494646"), F.lit("20000000"), F.lit("57454250"))
    v = (w - 1) + (h - 1) * F.lit(16384)
    vp8l_bytes = F.concat(
        h2(v % 256), h2((v / 256).cast("long") % 256),
        h2((v / 65536).cast("long") % 256),
        h2((v / 16777216).cast("long") % 16),
    )
    hexstr = (
        F.when(m == 0, F.concat(
            head, F.lit("56503820"), F.lit("10000000"),
            F.lit("000000"), F.lit("9D012A"), le16_w, le16_h))
        .when(m == 1, F.concat(
            head, F.lit("5650384C"), F.lit("10000000"),
            F.lit("2F"), vp8l_bytes, F.lit("00000000")))
        .when(m == 2, F.concat(
            head, F.lit("56503858"), F.lit("0A000000"),
            F.lit("00"), F.lit("000000"), le24(w - 1), le24(h - 1)))
        .otherwise(F.lit("4E4F50454E4F50454E4F50454E4F5045"
                         "4E4F50454E4F50454E4F50454E4F5045"))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"),
    )
    return sniff_webp_dims(imgs).select(
        "doc_id", "webp_variant", "sniff_w", "sniff_h"
    ).orderBy("doc_id")


ORACLE_WEBP = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l' WHEN 2 THEN 'vp8x'
       END AS webp_variant,
       CASE WHEN doc_id % 4 < 3 THEN CAST(100 + doc_id % 300 AS BIGINT)
       END AS sniff_w,
       CASE WHEN doc_id % 4 < 3 THEN CAST(50 + doc_id % 200 AS BIGINT)
       END AS sniff_h
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# latency_histogram
# --------------------------------------------------------------------------

def q_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.latency_histogram over 20 hosts x pseudo-random
    latencies 1 + (doc*7919)%3000: decimal first-digit buckets
    ([d*10^k, (d+1)*10^k - 1] by digit concatenation — no float log),
    p95 bound = first bucket whose cumulative count reaches
    ceil(0.95 n); the oracle replays the bucketing and the cumulative
    window."""
    from .politeness import latency_histogram

    doc = F.col("doc_id")
    responses = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 20).cast("string")).alias("host"),
        (1 + (doc * 7919) % 3000).cast("long").alias("latency_ms"),
    )
    return latency_histogram(responses, quantile_pct=95).orderBy("host")


ORACLE_LATENCY_HIST = """
WITH r AS (
  SELECT 'h' || CAST(doc_id % 20 AS VARCHAR) AS host,
         CAST(1 + (doc_id * 7919) % 3000 AS BIGINT) AS lat
  FROM documents
),
b AS (
  SELECT host,
         CAST(substr(CAST(lat AS VARCHAR), 1, 1)
              || repeat('0', length(CAST(lat AS VARCHAR)) - 1)
              AS BIGINT) AS lb,
         CAST(substr(CAST(lat AS VARCHAR), 1, 1)
              || repeat('9', length(CAST(lat AS VARCHAR)) - 1)
              AS BIGINT) AS ub
  FROM r
),
h AS (
  SELECT host, lb, ub, COUNT(*) AS cnt FROM b GROUP BY host, lb, ub
),
c AS (
  SELECT host, lb, ub,
         SUM(cnt) OVER (PARTITION BY host ORDER BY lb
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY host) AS n
  FROM h
),
q AS (
  SELECT host, lb, ub, n,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY lb) AS rn
  FROM c
  WHERE cum >= greatest(1, (95 * n + 99) // 100)
)
SELECT host, CAST(n AS BIGINT) AS n_samples,
       lb AS q_lb_ms, ub AS q_ub_ms
FROM q WHERE rn = 1
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "webp_sniff": q_webp_sniff,
        "latency_histogram": q_latency_histogram,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "webp_sniff": ORACLE_WEBP,
        "latency_histogram": ORACLE_LATENCY_HIST,
    }
