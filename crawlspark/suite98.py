"""Round-3 queries, part 48: native session_window sessionization,
per-label embedding centroids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GAP_S = 600  # 10 minutes


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN session_window (the merging-interval aggregate
    Catalyst implements natively — the same call works under
    readStream with a watermark) over the events table; the oracle
    replays the gaps-and-islands equivalent with the session-window
    boundary rule (an event at exactly prev + gap still MERGES —
    the split needs a STRICTLY larger gap, pinned by test).  Bounds emitted as unix micros: start = first event,
    end = last event + gap."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        e.groupBy(
            "user_id",
            F.session_window(F.col("ts"), f"{_GAP_S} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("event_id").cast("long").alias("first_event_id"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("start_us"),
            F.unix_micros(F.col("w.end").cast("timestamp")).alias("end_us"),
            "n_events", "first_event_id",
        )
    )
    return out.orderBy("user_id", "start_us")


ORACLE_SESSION_WINDOW = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
),
l AS (
  SELECT user_id, event_id, tus,
         lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
           AS prev
  FROM e
),
s AS (
  SELECT user_id, event_id, tus,
         SUM(CASE WHEN prev IS NULL OR tus - prev > {_GAP_S} * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
)
SELECT user_id,
       CAST(MIN(tus) AS BIGINT) AS start_us,
       CAST(MAX(tus) + {_GAP_S} * 1000000 AS BIGINT) AS end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(event_id) AS BIGINT) AS first_event_id
FROM s GROUP BY user_id, sess
ORDER BY user_id, start_us
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in integer micro-units (quantize
    each component BEFORE the sum — float sums are
    partition-order-nondeterministic, int sums are not): the k-means
    'update' half-step / class-prototype table that SemDeDup-style
    pipelines broadcast.  Explode to (label, dim, val), one
    map-side-combined groupBy."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = e.select(
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "label", "dim",
        F.floor(F.col("v").cast("double") * 1_000_000).cast("long")
        .alias("vm"),
    )
    return (
        d.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            # floor over an IDENTICAL double quotient on both engines:
            # embedding sums go NEGATIVE, and floor() (round toward
            # -inf) is the conventional quantizer here — int div would
            # truncate toward zero on both engines instead
            F.floor(F.sum("vm") / F.count(F.lit(1))).cast("long")
            .alias("centroid_micro"),
        )
        .select("label", F.col("dim").cast("long").alias("dim"),
                "n_vecs", "centroid_micro")
        .orderBy("label", "dim")
    )


ORACLE_LABEL_CENTROIDS = """
WITH d AS (
  SELECT label, i - 1 AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS vm
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(floor(CAST(SUM(vm) AS DOUBLE) / COUNT(*)) AS BIGINT) AS centroid_micro
FROM d GROUP BY label, dim
ORDER BY label, dim
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "session_window_native": q_session_window_native,
        "label_centroids": q_label_centroids,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "session_window_native": ORACLE_SESSION_WINDOW,
        "label_centroids": ORACLE_LABEL_CENTROIDS,
    }
