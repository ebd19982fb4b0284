"""Round-3 queries, part 57: Permissions-Policy audit, Server-Timing
metric harvest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# permissions_policy — feature-gate exposure flags
# --------------------------------------------------------------------------

def q_permissions_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.permissions_policy_audit: empty-allowlist camera with a
    self microphone and FLoC opt-out, wildcard geolocation, an
    origin-list camera, and no header."""
    from .fetch import permissions_policy_audit

    doc = F.col("doc_id")
    m = doc % 4
    hdr = (
        F.when(m == 0, F.lit(
            "camera=(), microphone=(self), interest-cohort=()"))
        .when(m == 1, F.lit("geolocation=*"))
        .when(m == 2, F.lit('camera=(self "https://x.test")'))
        .otherwise(F.lit(""))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("pp"))
    out = d.select("doc_id",
                   permissions_policy_audit(F.col("pp")).alias("p"))
    return out.select(
        "doc_id", "p.n_directives", "p.camera_allowed",
        "p.microphone_allowed", "p.geolocation_allowed",
        "p.interest_cohort_blocked",
    ).orderBy("doc_id")


ORACLE_PERMISSIONS_POLICY = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 3 THEN 0 ELSE 1 END
            AS INTEGER) AS n_directives,
       doc_id % 4 = 2 AS camera_allowed,
       doc_id % 4 = 0 AS microphone_allowed,
       doc_id % 4 = 1 AS geolocation_allowed,
       doc_id % 4 = 0 AS interest_cohort_blocked
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# server_timing — backend latency breakdown
# --------------------------------------------------------------------------

def q_server_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.server_timing_metrics: decimal + integer durations,
    quoted dur, desc-only metric, and an absent header."""
    from .fetch import server_timing_metrics

    doc = F.col("doc_id")
    m = doc % 3
    hdr = (
        F.when(m == 0, F.lit(
            'db;dur=53.2, cache;desc="HIT", total;dur=103'))
        .when(m == 1, F.lit('cdn-cache;desc="MISS";dur="7.25"'))
        .otherwise(F.lit(""))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("st"))
    out = d.select(
        "doc_id",
        F.posexplode_outer(server_timing_metrics(F.col("st")))
        .alias("ord", "e"),
    )
    return out.select(
        "doc_id", F.col("ord").cast("long").alias("ord"),
        "e.metric", "e.dur_micros", "e.descr",
    ).orderBy("doc_id", "ord")


ORACLE_SERVER_TIMING = """
WITH e(k, ord, metric, dur_micros, descr) AS (
  VALUES
   (0, 0, 'db', 53200, NULL),
   (0, 1, 'cache', NULL, 'HIT'),
   (0, 2, 'total', 103000, NULL),
   (1, 0, 'cdn-cache', 7250, 'MISS'),
   (2, NULL, NULL, NULL, NULL)
)
SELECT d.doc_id, CAST(e.ord AS BIGINT) AS ord, e.metric,
       CAST(e.dur_micros AS BIGINT) AS dur_micros, e.descr
FROM documents d JOIN e ON d.doc_id % 3 = e.k
ORDER BY d.doc_id, ord
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "permissions_policy": q_permissions_policy,
        "server_timing": q_server_timing,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "permissions_policy": ORACLE_PERMISSIONS_POLICY,
        "server_timing": ORACLE_SERVER_TIMING,
    }
