"""Round-3 queries, part 13: hopping-window counts, power-of-two
half-life decay scores, URL path-prefix rollup, corpus n-gram novelty.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# hopping_window
# --------------------------------------------------------------------------

def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.hopping_window_counts over events (6 hosts, 5-minute
    windows hopping by 1 minute — Spark's window(ts, '5 min', '1 min')
    assignment); the oracle replays the covering-window explode."""
    from .streaming import hopping_window_counts

    e = _events(spark, sf_dir).select(
        F.concat(F.lit("h"), (F.col("user_id") % 6).cast("string"))
        .alias("host"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
        .alias("ts"),
    )
    return hopping_window_counts(
        e, window_len=300, hop=60).orderBy("key", "window_start")


ORACLE_HOPPING = """
WITH e AS (
  SELECT 'h' || (user_id % 6) AS key, epoch_us(ts) // 1000000 AS t
  FROM events
),
x AS (
  SELECT key, t, ((t - 240 + i.i * 60) // 60) * 60 AS w
  FROM e CROSS JOIN generate_series(0, 4) i(i)
)
SELECT key, CAST(w AS BIGINT) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM x
WHERE w > t - 300 AND w <= t
GROUP BY key, w
ORDER BY key, window_start
"""


# --------------------------------------------------------------------------
# decay_score
# --------------------------------------------------------------------------

_DECAY_NOW = 1_706_745_600  # 2024-02-01, just past the event range


def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.halflife_decay_scores over events with a 1-day
    half-life: whole-half-life integer decay (weight = 1e6 >> n) keeps
    every per-event weight exact, so the oracle replays the sum
    bit-for-bit with 1000000 // (1 << n)."""
    from .scheduler import halflife_decay_scores

    e = _events(spark, sf_dir).select(
        F.concat(F.lit("h"), (F.col("user_id") % 6).cast("string"))
        .alias("host"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000")
        .alias("ts"),
    )
    return halflife_decay_scores(
        e, now_ts=_DECAY_NOW, halflife=86_400).orderBy("key")


ORACLE_DECAY = f"""
WITH e AS (
  SELECT 'h' || (user_id % 6) AS key,
         ({_DECAY_NOW} - epoch_us(ts) // 1000000) // 86400 AS n
  FROM events
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN n < 0 THEN 1000000
                     WHEN n <= 62 THEN 1000000 // (CAST(1 AS BIGINT) << n)
                     ELSE 0 END) AS BIGINT) AS score_micro
FROM e
GROUP BY key
ORDER BY key
"""


# --------------------------------------------------------------------------
# url_prefix_rollup
# --------------------------------------------------------------------------

def q_url_prefix_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.url_prefix_rollup over 7 hosts with 1-4 segment paths
    (depth capped at 3); the oracle unions the expected ancestor rows
    per depth and regroups."""
    from .canon import url_prefix_rollup

    doc = F.col("doc_id")
    k, m = doc % 7, doc % 4
    j, i = (doc % 3).cast("string"), (doc % 2).cast("string")
    base = F.concat(F.lit("http://p"), k.cast("string"), F.lit(".com"))
    url = (
        F.when(m == 0, F.concat(base, F.lit("/")))
        .when(m == 1, F.concat(base, F.lit("/a"), j))
        .when(m == 2, F.concat(base, F.lit("/a"), j, F.lit("/b"), i))
        .otherwise(F.concat(base, F.lit("/a"), j, F.lit("/b"), i,
                            F.lit("/c/d")))
    )
    urls = _docs(spark, sf_dir).select(url.alias("url"))
    return url_prefix_rollup(urls).orderBy("host", "depth", "prefix")


ORACLE_PREFIX_ROLLUP = """
WITH u AS (
  SELECT doc_id, doc_id % 7 AS k, doc_id % 4 AS m,
         doc_id % 3 AS j, doc_id % 2 AS i
  FROM documents
),
r AS (
  SELECT 'p' || k || '.com' AS host, '/' AS prefix, 0 AS depth FROM u
  UNION ALL
  SELECT 'p' || k || '.com', '/a' || j, 1 FROM u WHERE m >= 1
  UNION ALL
  SELECT 'p' || k || '.com', '/a' || j || '/b' || i, 2 FROM u WHERE m >= 2
  UNION ALL
  SELECT 'p' || k || '.com', '/a' || j || '/b' || i || '/c', 3
  FROM u WHERE m = 3
)
SELECT host, prefix, CAST(depth AS INTEGER) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM r
GROUP BY host, prefix, depth
ORDER BY host, depth, prefix
"""


# --------------------------------------------------------------------------
# gram_novelty
# --------------------------------------------------------------------------

def q_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.gram_novelty with n=3 over docs sharing a
    5-word corpus-common phrase followed by 3 unique words: exactly 3
    of each doc's 6 trigrams are corpus-unique (novelty 500 permille);
    every 20th doc is too short for any trigram (NULL novelty)."""
    from .textops.quality import gram_novelty

    doc = F.col("doc_id")
    ds = doc.cast("string")
    text = F.when(doc % 20 == 0, F.lit("tiny doc")).otherwise(
        F.concat(F.lit("common one two three four u"), ds,
                 F.lit(" v"), ds, F.lit(" w"), ds))
    docs = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                       text.alias("text"))
    return gram_novelty(docs, n=3).orderBy("id")


ORACLE_GRAM_NOVELTY = """
SELECT doc_id AS id,
       CAST(CASE WHEN doc_id % 20 = 0 THEN 0 ELSE 6 END AS BIGINT)
         AS n_grams,
       CAST(CASE WHEN doc_id % 20 = 0 THEN 0 ELSE 3 END AS BIGINT)
         AS n_novel,
       CAST(CASE WHEN doc_id % 20 = 0 THEN NULL ELSE 500 END AS BIGINT)
         AS novelty_permille
FROM documents
ORDER BY id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hopping_window": q_hopping_window,
        "decay_score": q_decay_score,
        "url_prefix_rollup": q_url_prefix_rollup,
        "gram_novelty": q_gram_novelty,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hopping_window": ORACLE_HOPPING,
        "decay_score": ORACLE_DECAY,
        "url_prefix_rollup": ORACLE_PREFIX_ROLLUP,
        "gram_novelty": ORACLE_GRAM_NOVELTY,
    }
