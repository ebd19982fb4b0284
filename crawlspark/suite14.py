"""Round-2 continuation queries, part 12: shard integrity manifests,
robots compliance audit, priority aging.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph, robots
from .scheduler import priority_aging
from .sinks import shard_manifest


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# shard_checksums — integrity manifest per training shard
# --------------------------------------------------------------------------

def q_shard_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shard_manifest over an arithmetic shard assignment (20 shards by
    doc%20): count / bytes / md5-of-sorted-ids checksum per shard —
    the delivery handoff a consumer re-derives to pin broken shards."""
    doc = F.col("doc_id")
    assigned = _docs(spark, sf_dir).select(
        F.concat(F.lit("shard-"), (doc % 20).cast("string"))
        .alias("shard_id"),
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        (F.lit(500) + (doc * 31) % 4000).cast("long").alias("nbytes"),
    )
    return shard_manifest(assigned)


ORACLE_SHARD_CHECKSUMS = """
WITH a AS (
  SELECT 'shard-' || CAST(doc_id % 20 AS VARCHAR) AS shard_id,
         'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         500 + (doc_id * 31) % 4000 AS nbytes
  FROM documents
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
       md5(string_agg(image_id, '|' ORDER BY image_id)) AS checksum
FROM a GROUP BY shard_id
"""


# --------------------------------------------------------------------------
# compliance_audit — fetches that violated robots, per host
# --------------------------------------------------------------------------

def q_compliance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance audit: join the fetch log back against the robots
    rules (same rules table as q:robots_filter — /x/ disallowed except
    /x/1) and report per-host fetch counts, violations, and the
    violation share — the report a crawl operator reviews before
    anyone else makes them review it."""
    pages = graph.pages(spark, sf_dir).withColumn(
        "path", F.parse_url(F.col("url"), F.lit("PATH"))
    )
    hosts = [f"h{i}.{graph.DOMAIN}" for i in range(graph.NHOSTS)]
    rules = spark.createDataFrame(
        [(h, "*", ["/x/"], ["/x/1"], []) for h in hosts],
        robots.ROBOTS_SCHEMA,
    )
    checked = robots.with_robots_allowed(pages, rules)
    return (
        checked.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.sum(F.when(~F.col("robots_allowed"), 1).otherwise(0))
            .cast("long").alias("n_violations"),
        )
        .select(
            "host", "n_fetches", "n_violations",
            F.expr("(1000 * n_violations) div n_fetches").cast("long")
            .alias("violation_permille"),
        )
    )


def _oracle_compliance() -> str:
    return f"""
WITH p AS (
  SELECT doc_id AS doc,
         'h' || CAST(doc_id % {graph.NHOSTS} AS VARCHAR)
           || '.{graph.DOMAIN}' AS host,
         doc_id % 23 = 11 AND CAST(doc_id AS VARCHAR) NOT LIKE '1%'
           AS violated
  FROM documents
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(CASE WHEN violated THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST((1000 * SUM(CASE WHEN violated THEN 1 ELSE 0 END)) // COUNT(*)
         AS BIGINT) AS violation_permille
FROM p GROUP BY host
"""


# --------------------------------------------------------------------------
# aged_wave — priority aging feeding wave selection
# --------------------------------------------------------------------------

_AGE_NOW = 1_000_000


def q_aged_wave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """priority_aging end to end: queue ages up to ~20 aging steps boost
    priorities (capped at 200), then the per-host rank runs on the AGED
    priority — old low-priority rows must outrank fresh mid-priority
    ones once their boost clears the gap."""
    from .scheduler import select_wave

    doc = F.col("doc_id")
    frontier = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("h"), (doc % 11).cast("string")).alias("host"),
        F.concat(F.lit("http://h"), (doc % 11).cast("string"),
                 F.lit(".test/a/"), doc.cast("string")).alias("url"),
        ((doc * 17) % 400).cast("long").alias("priority"),
        (F.lit(_AGE_NOW) - (doc * 97) % 72_000).cast("long")
        .alias("enqueued_ts"),
        (doc % 89).cast("long").alias("crawl_ts"),
    )
    aged = priority_aging(frontier, now_ts=_AGE_NOW)
    wave = select_wave(
        aged.withColumnRenamed("aged_priority", "eff_priority"),
        budgets=None, wave_size=None, priority_col="eff_priority",
    )
    return wave.select(
        "doc_id", "host", "url", "priority", "age_boost",
        "eff_priority", "host_seq",
    )


ORACLE_AGED_WAVE = f"""
WITH f AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 11 AS VARCHAR) AS host,
         'http://h' || CAST(doc_id % 11 AS VARCHAR) || '.test/a/' ||
           CAST(doc_id AS VARCHAR) AS url,
         CAST((doc_id * 17) % 400 AS BIGINT) AS priority,
         CAST((doc_id * 97) % 72000 AS BIGINT) AS age,
         CAST(doc_id % 89 AS BIGINT) AS crawl_ts
  FROM documents
),
a AS (
  SELECT *,
         LEAST(200, age // 3600) AS age_boost,
         priority + LEAST(200, age // 3600) AS eff_priority
  FROM f
)
SELECT doc_id, host, url, priority,
       CAST(age_boost AS BIGINT) AS age_boost,
       CAST(eff_priority AS BIGINT) AS eff_priority,
       CAST(ROW_NUMBER() OVER (PARTITION BY host
            ORDER BY eff_priority DESC, crawl_ts, url) AS BIGINT)
         AS host_seq
FROM a
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "shard_checksums": q_shard_checksums,
        "compliance_audit": q_compliance_audit,
        "aged_wave": q_aged_wave,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "shard_checksums": ORACLE_SHARD_CHECKSUMS,
        "compliance_audit": _oracle_compliance(),
        "aged_wave": ORACLE_AGED_WAVE,
    }
