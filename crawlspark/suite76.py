"""Round-3 queries, part 26: sizes-aware srcset selection, RFC 9309
robots fetch-failure policy, host traffic anomaly z-scores, SLO
burn-rate alerts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# srcset_sizes
# --------------------------------------------------------------------------

def q_srcset_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.srcset_sizes_select at viewport 430/DPR 1 over three
    markup shapes: matched max-width 100vw clause, unmatched
    min-width with a px fallback, and a descriptorless srcset."""
    from .extract import srcset_sizes_select

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 3
    srcset = (
        F.when(m == 0, F.concat(
            F.lit("/a"), ds, F.lit("-320.jpg 320w, /a"), ds,
            F.lit("-640.jpg 640w, /a"), ds, F.lit("-1280.jpg 1280w")))
        .when(m == 1, F.concat(
            F.lit("/b"), ds, F.lit("-320.jpg 320w, /b"), ds,
            F.lit("-640.jpg 640w")))
        .otherwise(F.concat(F.lit("/c"), ds, F.lit(".jpg")))
    )
    sizes = (
        F.when(m == 0, F.lit("(max-width: 600px) 100vw, 50vw"))
        .when(m == 1, F.lit("(min-width: 1000px) 33vw, 200px"))
        .otherwise(F.lit("100vw"))
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), srcset.alias("srcset"),
        sizes.alias("sizes"))
    sel = d.select(
        "doc_id",
        srcset_sizes_select(F.col("srcset"), F.col("sizes")).alias("s"))
    return sel.select(
        "doc_id", "s.slot_px", "s.need_px", "s.chosen_url",
        "s.chosen_w",
    ).orderBy("doc_id")


ORACLE_SRCSET_SIZES = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 1 THEN 200 ELSE 430 END AS BIGINT)
         AS slot_px,
       CAST(CASE doc_id % 3 WHEN 1 THEN 200 ELSE 430 END AS BIGINT)
         AS need_px,
       CASE doc_id % 3
         WHEN 0 THEN '/a' || doc_id || '-640.jpg'
         WHEN 1 THEN '/b' || doc_id || '-320.jpg'
       END AS chosen_url,
       CAST(CASE doc_id % 3 WHEN 0 THEN 640 WHEN 1 THEN 320 END
            AS BIGINT) AS chosen_w
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# robots_failure_policy (DataFrame-level RFC 9309 unreachable policy;
# the column-level fetch-outcome classifier is suite7's robots_fetch_policy)
# --------------------------------------------------------------------------

def q_robots_fetch_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.robots_failure_policy over 200/404/503-fresh/503-stale and
    a redirect loop."""
    from .robots import robots_failure_policy

    doc = F.col("doc_id")
    m = doc % 5
    fetches = _docs(spark, sf_dir).select(
        F.concat(F.lit("r"), doc.cast("string"), F.lit(".com"))
        .alias("host"),
        F.when(m == 0, 200).when(m == 1, 404).when(m == 2, 503)
        .when(m == 3, 503).otherwise(301).cast("long").alias("status"),
        F.when(m == 4, 6).otherwise(0).cast("long")
        .alias("n_redirect_hops"),
        F.when(m == 3, 45).otherwise(2).cast("long")
        .alias("days_since_first_error"),
    )
    return robots_failure_policy(fetches).orderBy("host")


ORACLE_ROBOTS_FETCH = """
WITH r AS (
  SELECT doc_id, doc_id % 5 AS m, 'r' || doc_id || '.com' AS host
  FROM documents
)
SELECT host,
       CAST(CASE m WHEN 0 THEN 200 WHEN 1 THEN 404 WHEN 2 THEN 503
            WHEN 3 THEN 503 ELSE 301 END AS BIGINT) AS status,
       CASE m WHEN 0 THEN 'use_rules' WHEN 1 THEN 'allow_all'
            WHEN 2 THEN 'disallow_all' WHEN 3 THEN 'allow_all_stale'
            ELSE 'allow_all' END AS policy
FROM r
ORDER BY host
"""


# --------------------------------------------------------------------------
# host_anomaly
# --------------------------------------------------------------------------

def q_host_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.host_anomaly_z over 10 hosts x 50 days of steady
    alternating counts, with every 3rd host's latest day spiked 10x;
    the oracle replays the exclusive-history moment sums."""
    from .politeness import host_anomaly_z

    doc = F.col("doc_id")
    host_k = doc % 10
    day = F.expr("doc_id div 10")
    spiked = (host_k % 3 == 0) & (day == 49)
    daily = _docs(spark, sf_dir).select(
        F.concat(F.lit("a"), host_k.cast("string")).alias("host"),
        day.cast("long").alias("day"),
        F.when(spiked, F.lit(1000))
        .otherwise(100 + day % 7).cast("long").alias("n"),
    )
    return host_anomaly_z(daily).orderBy("host")


ORACLE_HOST_ANOMALY = """
WITH d AS (
  SELECT 'a' || (doc_id % 10) AS host, doc_id // 10 AS day,
         CAST(CASE WHEN (doc_id % 10) % 3 = 0 AND doc_id // 10 = 49
              THEN 1000 ELSE 100 + (doc_id // 10) % 7 END
              AS BIGINT) AS n
  FROM documents
),
latest AS (SELECT host, MAX(day) AS latest_day FROM d GROUP BY host),
hist AS (
  SELECT d.host, CAST(COUNT(*) AS BIGINT) AS hist_days,
         CAST(SUM(n) AS BIGINT) AS s1,
         CAST(SUM(n * n) AS BIGINT) AS s2
  FROM d JOIN latest l ON l.host = d.host
  WHERE d.day < l.latest_day GROUP BY d.host
),
cur AS (
  SELECT d.host, d.day AS latest_day, d.n AS latest_n
  FROM d JOIN latest l ON l.host = d.host AND d.day = l.latest_day
)
SELECT c.host, CAST(c.latest_day AS BIGINT) AS latest_day, c.latest_n,
       h.hist_days,
       CASE WHEN h.hist_days >= 3 AND h.s2 * h.hist_days > h.s1 * h.s1
         THEN CAST(ROUND(1e3 * (c.latest_n - h.s1 / CAST(h.hist_days
                   AS DOUBLE))
              / SQRT((h.s2 - h.s1 * h.s1 / CAST(h.hist_days AS DOUBLE))
                     / h.hist_days)) AS BIGINT)
       END AS z_milli,
       COALESCE(ABS(CASE WHEN h.hist_days >= 3
                         AND h.s2 * h.hist_days > h.s1 * h.s1
         THEN CAST(ROUND(1e3 * (c.latest_n - h.s1 / CAST(h.hist_days
                   AS DOUBLE))
              / SQRT((h.s2 - h.s1 * h.s1 / CAST(h.hist_days AS DOUBLE))
                     / h.hist_days)) AS BIGINT) END) >= 3000, FALSE)
         AS anomalous
FROM cur c LEFT JOIN hist h ON h.host = c.host
ORDER BY c.host
"""


# --------------------------------------------------------------------------
# slo_burn
# --------------------------------------------------------------------------

def q_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.slo_burn_alerts at SLO 99.5%: healthy fast window, a
    paging fast burn, a ticketing slow burn, and an empty window."""
    from .fetch import slo_burn_alerts

    doc = F.col("doc_id")
    m = doc % 4
    windows = _docs(spark, sf_dir).select(
        F.concat(F.lit("s"), doc.cast("string"), F.lit(".com"))
        .alias("host"),
        F.when(m % 2 == 0, F.lit("fast")).otherwise(F.lit("slow"))
        .alias("window"),
        F.when(m == 0, 995).when(m == 1, 940).when(m == 2, 90)
        .otherwise(0).cast("long").alias("n_ok"),
        F.when(m == 0, 5).when(m == 1, 60).when(m == 2, 10)
        .otherwise(0).cast("long").alias("n_err"),
    )
    return slo_burn_alerts(windows).orderBy("host")


ORACLE_SLO_BURN = """
WITH w AS (
  SELECT doc_id, doc_id % 4 AS m, 's' || doc_id || '.com' AS host
  FROM documents
)
SELECT host,
       CASE WHEN m % 2 = 0 THEN 'fast' ELSE 'slow' END AS window,
       CAST(CASE m WHEN 0 THEN 1000 WHEN 1 THEN 1000 WHEN 2 THEN 100
            ELSE 0 END AS BIGINT) AS n_total,
       CAST(CASE m WHEN 0 THEN 1000 WHEN 1 THEN 12000 WHEN 2 THEN 20000
            END AS BIGINT) AS burn_milli,
       m IN (1, 2) AS alert
FROM w
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "srcset_sizes": q_srcset_sizes,
        "robots_failure_policy": q_robots_fetch_policy,
        "host_anomaly": q_host_anomaly,
        "slo_burn": q_slo_burn,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "srcset_sizes": ORACLE_SRCSET_SIZES,
        "robots_failure_policy": ORACLE_ROBOTS_FETCH,
        "host_anomaly": ORACLE_HOST_ANOMALY,
        "slo_burn": ORACLE_SLO_BURN,
    }
