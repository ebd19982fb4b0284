"""Round-3 queries, part 8: temporal joins — as-of robots compliance and
bucketed interval (maintenance-window) joins.

House rules: deterministic fixtures; the as-of oracle uses DuckDB's
NATIVE ``ASOF JOIN`` (a genuinely independent implementation of the
semantics, not a replay of ours); the interval oracle uses the naive
``BETWEEN`` join the bucketed plan must agree with.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# robots_asof — the snapshot in force at fetch time
# --------------------------------------------------------------------------

def q_robots_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joins.asof_join: robots snapshots (doc%4==0, ts=doc*10) against
    fetches (doc%4!=0, ts=doc*10+5) per host h(doc%5); each fetch must
    see the latest snapshot at-or-before its timestamp, and fetches
    older than every snapshot keep a null policy.  Oracle: DuckDB's
    native ASOF LEFT JOIN."""
    from .joins import asof_join

    doc = F.col("doc_id")
    host = F.concat(F.lit("h"), (doc % 5).cast("string"))
    snaps = (
        _docs(spark, sf_dir)
        .filter(doc % 4 == 0)
        .select(
            host.alias("host"),
            (doc * 10).cast("long").alias("ts"),
            F.concat(F.lit("p"), doc.cast("string")).alias("policy"),
        )
    )
    fetches = (
        _docs(spark, sf_dir)
        .filter(doc % 4 != 0)
        .select(
            F.concat(F.lit("f"), doc.cast("string")).alias("fetch_id"),
            host.alias("host"),
            (doc * 10 + 5).cast("long").alias("fetch_ts"),
        )
    )
    return asof_join(
        fetches, snaps, key="host", left_ts="fetch_ts", right_ts="ts",
        payload_cols=["policy"],
    ).orderBy("fetch_id")


ORACLE_ROBOTS_ASOF = """
WITH snaps AS (
  SELECT 'h' || (doc_id % 5) AS host, CAST(doc_id * 10 AS BIGINT) AS ts,
         'p' || CAST(doc_id AS VARCHAR) AS policy
  FROM documents WHERE doc_id % 4 = 0
),
fetches AS (
  SELECT 'f' || CAST(doc_id AS VARCHAR) AS fetch_id,
         'h' || (doc_id % 5) AS host,
         CAST(doc_id * 10 + 5 AS BIGINT) AS fetch_ts
  FROM documents WHERE doc_id % 4 != 0
)
SELECT f.fetch_id, f.host, f.fetch_ts, s.policy
FROM fetches f
ASOF LEFT JOIN snaps s ON f.host = s.host AND f.fetch_ts >= s.ts
ORDER BY f.fetch_id
"""


# --------------------------------------------------------------------------
# maintenance_overlap — events inside host maintenance windows
# --------------------------------------------------------------------------

def q_maintenance_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joins.interval_join_bucketed (bucket=1000): maintenance windows
    [doc*100, doc*100+1500] on doc%20==0 per host h(doc%3), events at
    ts=(doc*937)%50000 — windows span 2-3 cells, overlapping windows
    stack, events outside every window report 0.  Oracle: the naive
    BETWEEN join the bucketed plan must exactly reproduce."""
    from .joins import interval_join_bucketed

    doc = F.col("doc_id")
    windows = (
        _docs(spark, sf_dir)
        .filter(doc % 20 == 0)
        .select(
            F.concat(F.lit("h"), (doc % 3).cast("string")).alias("host"),
            (doc * 100).cast("long").alias("start"),
            (doc * 100 + 1500).cast("long").alias("end"),
        )
    )
    events = _docs(spark, sf_dir).select(
        F.concat(F.lit("e"), doc.cast("string")).alias("event_id"),
        F.concat(F.lit("h"), (doc % 3).cast("string")).alias("host"),
        ((doc * 937) % 50000).cast("long").alias("ts"),
    )
    return interval_join_bucketed(
        events, windows, key="host", bucket=1000
    ).orderBy("event_id")


ORACLE_MAINTENANCE_OVERLAP = """
WITH w AS (
  SELECT 'h' || (doc_id % 3) AS host,
         CAST(doc_id * 100 AS BIGINT) AS s,
         CAST(doc_id * 100 + 1500 AS BIGINT) AS e
  FROM documents WHERE doc_id % 20 = 0
),
ev AS (
  SELECT 'e' || CAST(doc_id AS VARCHAR) AS event_id,
         'h' || (doc_id % 3) AS host,
         CAST((doc_id * 937) % 50000 AS BIGINT) AS ts
  FROM documents
)
SELECT ev.event_id, ev.host, ev.ts,
       CAST(COUNT(w.host) AS BIGINT) AS n_windows
FROM ev LEFT JOIN w ON ev.host = w.host AND ev.ts BETWEEN w.s AND w.e
GROUP BY ev.event_id, ev.host, ev.ts
ORDER BY ev.event_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "robots_asof": q_robots_asof,
        "maintenance_overlap": q_maintenance_overlap,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "robots_asof": ORACLE_ROBOTS_ASOF,
        "maintenance_overlap": ORACLE_MAINTENANCE_OVERLAP,
    }
