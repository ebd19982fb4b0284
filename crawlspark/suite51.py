"""Round-3 queries, part 22: capacity planning (partition sizing,
shuffle-skew forecast, one-row cluster sizing summary).

The workload is a deterministic Zipf-ish host load derived from
``documents``: hosts ``h0..h2`` receive every ``doc_id % 5 == 0`` row
(hot 20% of traffic on 3 hosts), the rest spread over 41 hosts; bytes
are widened to ``n_chars * (1 + doc_id % 11)`` so group totals span the
split / ok / coalesce classes at ``TARGET_BYTES``.

All three plans are pure integer arithmetic over one groupBy (plus one
|hosts|-row window for the round-robin forecast), so the DuckDB oracle
reproduces them exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .capacity import (capacity_summary, partition_sizing,
                       shuffle_skew_forecast)

TARGET_BYTES = 12000
NUM_BUCKETS = 8
HOST_EXPR = (
    "concat('h', cast(CASE WHEN doc_id % 5 = 0 THEN doc_id % 3 "
    "WHEN doc_id % 7 = 1 THEN 44 + doc_id % 50 "
    "ELSE 3 + doc_id % 41 END as string))"
)
BYTES_EXPR = "cast(n_chars * (1 + doc_id % 11) as long)"


def _host_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.expr(HOST_EXPR).alias("host"),
            F.expr(BYTES_EXPR).alias("resp_bytes"),
        )
    )


_SQL_LOAD = """
  SELECT 'h' || CAST(CASE WHEN doc_id % 5 = 0 THEN doc_id % 3
                     WHEN doc_id % 7 = 1 THEN 44 + doc_id % 50
                     ELSE 3 + doc_id % 41 END AS VARCHAR) AS host,
         CAST(n_chars * (1 + doc_id % 11) AS BIGINT) AS resp_bytes
  FROM documents
"""


def q_partition_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.partition_sizing over the synthetic host load: per-host
    total bytes -> integer-ceil partitions at TARGET_BYTES, AQE-style
    split / ok / coalesce class."""
    return partition_sizing(
        _host_load(spark, sf_dir), "host", "resp_bytes", TARGET_BYTES
    ).orderBy("grp")


ORACLE_PARTITION_SIZING = f"""
WITH load AS ({_SQL_LOAD}),
agg AS (
  SELECT host AS grp, CAST(SUM(resp_bytes) AS BIGINT) AS total_bytes,
         COUNT(*) AS n_rows
  FROM load GROUP BY host
)
SELECT grp, total_bytes, n_rows,
       GREATEST(1, (total_bytes + {TARGET_BYTES - 1}) // {TARGET_BYTES})
         AS parts_needed,
       CASE WHEN total_bytes > {2 * TARGET_BYTES} THEN 'split'
            WHEN total_bytes * 100 < {20 * TARGET_BYTES} THEN 'coalesce'
            ELSE 'ok' END AS size_class
FROM agg ORDER BY grp
"""


def q_shuffle_skew_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.shuffle_skew_forecast: sorted round-robin placement of
    hosts onto NUM_BUCKETS reducers; per-bucket forecast bytes and the
    integer load %% vs ideal."""
    return shuffle_skew_forecast(
        _host_load(spark, sf_dir), "host", "resp_bytes", NUM_BUCKETS
    ).orderBy("bucket")


ORACLE_SKEW_FORECAST = f"""
WITH load AS ({_SQL_LOAD}),
agg AS (
  SELECT host AS grp, CAST(SUM(resp_bytes) AS BIGINT) AS grp_bytes
  FROM load GROUP BY host
),
placed AS (
  SELECT grp, grp_bytes,
         CAST((ROW_NUMBER() OVER (ORDER BY grp_bytes DESC, grp) - 1)
              % {NUM_BUCKETS} AS INTEGER) AS bucket
  FROM agg
),
tot AS (SELECT CAST(SUM(grp_bytes) AS BIGINT) AS total_bytes FROM placed)
SELECT bucket, COUNT(*) AS n_groups,
       CAST(SUM(grp_bytes) AS BIGINT) AS bucket_bytes,
       MAX(grp_bytes) AS heaviest_group_bytes,
       CAST((CAST(SUM(grp_bytes) AS BIGINT) * 100 * {NUM_BUCKETS})
         // (SELECT total_bytes FROM tot) AS BIGINT) AS load_pct_of_ideal
FROM placed GROUP BY bucket ORDER BY bucket
"""


def q_capacity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.capacity_summary: one-row wave sizing — total bytes,
    recommended shuffle partitions, round-robin max-reducer forecast."""
    return capacity_summary(
        _host_load(spark, sf_dir),
        "host",
        "resp_bytes",
        TARGET_BYTES,
        NUM_BUCKETS,
    )


ORACLE_CAPACITY_SUMMARY = f"""
WITH load AS ({_SQL_LOAD}),
agg AS (
  SELECT host AS grp, CAST(SUM(resp_bytes) AS BIGINT) AS grp_bytes
  FROM load GROUP BY host
),
placed AS (
  SELECT grp, grp_bytes,
         CAST((ROW_NUMBER() OVER (ORDER BY grp_bytes DESC, grp) - 1)
              % {NUM_BUCKETS} AS INTEGER) AS bucket
  FROM agg
),
buckets AS (
  SELECT bucket, CAST(SUM(grp_bytes) AS BIGINT) AS bucket_bytes
  FROM placed GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(resp_bytes) AS BIGINT) AS total_bytes,
         COUNT(DISTINCT host) AS n_groups,
         COUNT(*) AS n_rows
  FROM load
)
SELECT t.total_bytes, t.n_groups, t.n_rows,
       CAST(GREATEST(1, (t.total_bytes + {TARGET_BYTES - 1})
                   // {TARGET_BYTES}) AS BIGINT)
         AS recommended_shuffle_partitions,
       (SELECT MAX(bucket_bytes) FROM buckets) AS max_bucket_bytes,
       (SELECT CAST(MAX((bucket_bytes * 100 * {NUM_BUCKETS})
                        // t2.total_bytes) AS BIGINT)
        FROM buckets, tot t2) AS max_load_pct_of_ideal
FROM tot t
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "partition_sizing": q_partition_sizing,
        "shuffle_skew_forecast": q_shuffle_skew_forecast,
        "capacity_summary": q_capacity_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "partition_sizing": ORACLE_PARTITION_SIZING,
        "shuffle_skew_forecast": ORACLE_SKEW_FORECAST,
        "capacity_summary": ORACLE_CAPACITY_SUMMARY,
    }
