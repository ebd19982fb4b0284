"""Round-3 queries, part 10: exact-total quota apportionment and
Accept-header content negotiation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QA_TOTAL = 10_000
QA_STRATA = 23

IMG_VARIANTS = ["image/avif", "image/webp", "image/jpeg", "image/png"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# quota_apportionment
# --------------------------------------------------------------------------

def q_quota_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.quota_apportionment of exactly 10000 slots over 23
    strata with quadratic weights (1 + i*i % 97): floor quotas + the
    leftover to the largest remainders (tie: smaller stratum); the
    oracle replays the floor/remainder/rank arithmetic and the quotas
    sum to exactly 10000."""
    from .scheduler import quota_apportionment

    i = F.col("id")
    strata = spark.range(QA_STRATA).select(
        i.alias("stratum"),
        (1 + (i * i) % 97).cast("long").alias("weight"),
    )
    return quota_apportionment(strata, total=QA_TOTAL).orderBy("stratum")


ORACLE_QUOTA = f"""
WITH s AS (
  SELECT range AS stratum,
         CAST(1 + (range * range) % 97 AS BIGINT) AS weight
  FROM range({QA_STRATA})
),
w AS (SELECT SUM(weight) AS wt FROM s),
b AS (
  SELECT stratum, weight,
         ({QA_TOTAL} * weight) // wt AS base,
         ({QA_TOTAL} * weight) % wt AS rem
  FROM s CROSS JOIN w
),
l AS (SELECT {QA_TOTAL} - SUM(base) AS leftover FROM b),
r AS (
  SELECT stratum, weight, base,
         ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rrank
  FROM b
)
SELECT CAST(stratum AS BIGINT) AS stratum, weight,
       CAST(base + CASE WHEN rrank <= l.leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r CROSS JOIN l
ORDER BY stratum
"""


# --------------------------------------------------------------------------
# accept_negotiation
# --------------------------------------------------------------------------

def q_accept_negotiation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.accept_negotiation over 6 Accept-header families against
    the server variant list [avif, webp, jpeg, png]: modern browser
    (avif wins), webp-only-with-wildcard (webp), jpeg-preferring
    (q ordering beats server order), exact-type-beats-range, q=0
    exclusion (avif excluded -> webp), and a nothing-acceptable row
    (NULL choice); the oracle states each family's outcome."""
    from .fetch import accept_negotiation

    doc = F.col("doc_id")
    m = doc % 6
    acc = (
        F.when(m == 0, F.lit("image/avif,image/webp,image/*;q=0.8,*/*;q=0.5"))
        .when(m == 1, F.lit("image/webp,*/*;q=0.1"))
        .when(m == 2, F.lit("image/jpeg;q=0.9,image/avif;q=0.7"))
        .when(m == 3, F.lit("image/*;q=0.5,image/png"))
        .when(m == 4, F.lit("image/avif;q=0,image/webp;q=0.7"))
        .otherwise(F.lit("text/html"))
    )
    reqs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), acc.alias("accept"),
    )
    return accept_negotiation(reqs, IMG_VARIANTS).select(
        "doc_id", "accept", "chosen_type", "chosen_q_millis"
    ).orderBy("doc_id")


ORACLE_ACCEPT = """
SELECT doc_id,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 'image/avif,image/webp,image/*;q=0.8,*/*;q=0.5'
         WHEN 1 THEN 'image/webp,*/*;q=0.1'
         WHEN 2 THEN 'image/jpeg;q=0.9,image/avif;q=0.7'
         WHEN 3 THEN 'image/*;q=0.5,image/png'
         WHEN 4 THEN 'image/avif;q=0,image/webp;q=0.7'
         ELSE 'text/html' END AS accept,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN 'image/avif'
         WHEN 1 THEN 'image/webp'
         WHEN 2 THEN 'image/jpeg'
         WHEN 3 THEN 'image/png'
         WHEN 4 THEN 'image/webp'
       END AS chosen_type,
       CASE CAST(doc_id % 6 AS INTEGER)
         WHEN 0 THEN CAST(1000 AS BIGINT)
         WHEN 1 THEN 1000
         WHEN 2 THEN 900
         WHEN 3 THEN 1000
         WHEN 4 THEN 700
       END AS chosen_q_millis
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "quota_apportionment": q_quota_apportionment,
        "accept_negotiation": q_accept_negotiation,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "quota_apportionment": ORACLE_QUOTA,
        "accept_negotiation": ORACLE_ACCEPT,
    }
