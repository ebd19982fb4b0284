"""Round-3 queries, part 4: RFC 9111 cache freshness, junk alt-text
classification, and max-min-fair (water-filling) budget allocation.

House rules: deterministic fixtures, integer-second/permille arithmetic,
oracles that replay the full precedence / water-line logic in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NOW_TS = 1500
WF_HOSTS = 40
WF_BUDGET = 4000


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# cache_freshness — RFC 9111 lifetime precedence + age classification
# --------------------------------------------------------------------------

def q_cache_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.cache_freshness over 7 header families (no-store / no-cache
    / max-age / s-maxage-beats-max-age / Expires / Last-Modified
    heuristic / bare): lifetime precedence per RFC 9111 §4.2.1-4.2.2,
    current age = Age + resident time; the oracle replays the identical
    precedence CASE."""
    from .sinks import cache_freshness

    doc = F.col("doc_id")
    m = doc % 7
    resp_ts = (1000 + doc % 50).cast("long")
    date_ts = (resp_ts - doc % 10).cast("long")
    cc = (
        F.when(m == 0, F.lit("no-store, max-age=60"))
        .when(m == 1, F.lit("public, no-cache"))
        .when(m == 2, F.concat(F.lit("max-age="), (doc % 1000).cast("string")))
        .when(m == 3, F.lit("s-maxage=500, max-age=100"))
    )
    expires_ts = F.when(m == 4, date_ts + (doc % 200)).cast("long")
    lm_ts = F.when(m == 5, date_ts - (doc % 5000)).cast("long")
    age_s = F.when(doc % 2 == 0, (doc % 30).cast("long"))
    rows = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), cc.alias("cache_control"),
        expires_ts.alias("expires_ts"), date_ts.alias("date_ts"),
        lm_ts.alias("last_modified_ts"), age_s.alias("age_s"),
        resp_ts.alias("response_ts"),
    )
    return cache_freshness(rows, now_ts=NOW_TS).select(
        "doc_id", "freshness_lifetime_s", "current_age_s", "cache_state"
    ).orderBy("doc_id")


ORACLE_CACHE_FRESHNESS = f"""
WITH d AS (
  SELECT doc_id, doc_id % 7 AS m,
         CAST(1000 + doc_id % 50 AS BIGINT) AS response_ts,
         CAST(1000 + doc_id % 50 - doc_id % 10 AS BIGINT) AS date_ts
  FROM documents
),
h AS (
  SELECT doc_id, m, response_ts, date_ts,
         CASE WHEN m = 0 THEN 'no-store, max-age=60'
              WHEN m = 1 THEN 'public, no-cache'
              WHEN m = 2 THEN 'max-age=' || CAST(doc_id % 1000 AS VARCHAR)
              WHEN m = 3 THEN 's-maxage=500, max-age=100' END AS cc,
         CASE WHEN m = 4 THEN date_ts + doc_id % 200 END AS expires_ts,
         CASE WHEN m = 5 THEN date_ts - doc_id % 5000 END AS lm_ts,
         CASE WHEN doc_id % 2 = 0 THEN doc_id % 30 ELSE 0 END AS age0
  FROM d
),
v AS (
  SELECT doc_id, cc, age0, response_ts, date_ts, expires_ts, lm_ts,
         CASE WHEN regexp_extract(COALESCE(cc, ''),
                        '(?:^|[, ;])s-maxage=(\\d+)', 1) <> ''
              THEN CAST(regexp_extract(cc, '(?:^|[, ;])s-maxage=(\\d+)', 1)
                        AS BIGINT) END AS smax,
         CASE WHEN regexp_extract(COALESCE(cc, ''),
                        '(?:^|[, ;])max-age=(\\d+)', 1) <> ''
              THEN CAST(regexp_extract(cc, '(?:^|[, ;])max-age=(\\d+)', 1)
                        AS BIGINT) END AS maxa,
         CASE WHEN expires_ts IS NOT NULL
              THEN greatest(expires_ts - date_ts, 0) END AS expl,
         CASE WHEN lm_ts IS NOT NULL AND date_ts > lm_ts
              THEN (date_ts - lm_ts) // 10 END AS heur
  FROM h
),
w AS (
  SELECT doc_id, cc, COALESCE(smax, maxa, expl) AS explicit, heur,
         CAST(COALESCE(COALESCE(smax, maxa, expl), heur, 0) AS BIGINT)
           AS lifetime,
         CAST(age0 + {NOW_TS} - response_ts AS BIGINT) AS age
  FROM v
)
SELECT doc_id, lifetime AS freshness_lifetime_s, age AS current_age_s,
       CASE WHEN COALESCE(cc, '') LIKE '%no-store%' THEN 'uncacheable'
            WHEN COALESCE(cc, '') LIKE '%no-cache%' THEN 'must_revalidate'
            WHEN explicit IS NOT NULL THEN
              CASE WHEN age < lifetime THEN 'fresh' ELSE 'stale' END
            WHEN heur IS NOT NULL THEN
              CASE WHEN age < lifetime THEN 'heuristic_fresh'
                   ELSE 'heuristic_stale' END
            ELSE 'stale' END AS cache_state
FROM w
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# alt_text_junk
# --------------------------------------------------------------------------

def q_alt_text_junk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.classify_alt_text over 8 caption families (camera
    filename, extension, URL, digits, 2-char, lone placeholder, real
    caption, whitespace-only); first-match-wins precedence; the oracle
    states the class per family."""
    from .mmcurate import classify_alt_text

    doc = F.col("doc_id")
    m = doc % 8
    cap = (
        F.when(m == 0, F.concat(F.lit("IMG_"), doc.cast("string")))
        .when(m == 1, F.lit("photo.JPG"))
        .when(m == 2, F.concat(F.lit("https://ex.com/a/"), doc.cast("string")))
        .when(m == 3, (doc * 37).cast("string"))
        .when(m == 4, F.lit("ab"))
        .when(m == 5, F.lit("Logo"))
        .when(m == 6, F.concat(F.lit("A scenic view of valley "),
                               doc.cast("string")))
        .otherwise(F.lit("   "))
    )
    return _docs(spark, sf_dir).select(
        doc.alias("doc_id"), cap.alias("caption"),
        classify_alt_text(cap).alias("alt_class"),
    ).orderBy("doc_id")


ORACLE_ALT_TEXT = """
SELECT doc_id,
       CASE CAST(doc_id % 8 AS INTEGER)
         WHEN 0 THEN 'IMG_' || CAST(doc_id AS VARCHAR)
         WHEN 1 THEN 'photo.JPG'
         WHEN 2 THEN 'https://ex.com/a/' || CAST(doc_id AS VARCHAR)
         WHEN 3 THEN CAST(doc_id * 37 AS VARCHAR)
         WHEN 4 THEN 'ab'
         WHEN 5 THEN 'Logo'
         WHEN 6 THEN 'A scenic view of valley ' || CAST(doc_id AS VARCHAR)
         ELSE '   ' END AS caption,
       CASE CAST(doc_id % 8 AS INTEGER)
         WHEN 0 THEN 'filename' WHEN 1 THEN 'filename'
         WHEN 2 THEN 'url' WHEN 3 THEN 'numeric' WHEN 4 THEN 'too_short'
         WHEN 5 THEN 'placeholder' WHEN 6 THEN 'ok'
         ELSE 'too_short' END AS alt_class
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# waterfill_budgets
# --------------------------------------------------------------------------

def q_waterfill_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.waterfill_budgets over 40 hosts with quadratic demand
    spread (10 + i*i*7 % 400) and a budget well under total demand: the
    oracle replays the sorted inclusive-prefix water-line condition and
    the integer line; small hosts fully satisfied, heavy hosts capped at
    the line, sum(granted) <= budget."""
    from .scheduler import waterfill_budgets

    i = F.col("id")
    demands = spark.range(WF_HOSTS).select(
        F.concat(F.lit("h"), i.cast("string")).alias("host"),
        (10 + (i * i * 7) % 400).cast("long").alias("demand"),
    )
    return waterfill_budgets(demands, total_budget=WF_BUDGET).orderBy("host")


ORACLE_WATERFILL = f"""
WITH d AS (
  SELECT 'h' || CAST(range AS VARCHAR) AS host,
         CAST(10 + (range * range * 7) % 400 AS BIGINT) AS demand
  FROM range({WF_HOSTS})
),
o AS (
  SELECT host, demand,
         ROW_NUMBER() OVER (ORDER BY demand, host) AS rk,
         SUM(demand) OVER (ORDER BY demand, host
                           ROWS UNBOUNDED PRECEDING) AS incl
  FROM d
),
s AS (
  SELECT COALESCE(MAX(CASE WHEN incl + ({WF_HOSTS} - rk) * demand
                                <= {WF_BUDGET} THEN rk END), 0) AS k
  FROM o
),
sk AS (
  SELECT s.k,
         COALESCE((SELECT incl FROM o WHERE o.rk = s.k), 0) AS skv
  FROM s
)
SELECT o.host, o.demand,
       CAST(CASE WHEN sk.k = {WF_HOSTS} THEN o.demand
                 WHEN o.rk <= sk.k THEN o.demand
                 ELSE least(o.demand,
                            ({WF_BUDGET} - sk.skv)
                              // greatest({WF_HOSTS} - sk.k, 1))
            END AS BIGINT) AS granted,
       CAST(CASE WHEN (CASE WHEN sk.k = {WF_HOSTS} THEN o.demand
                            WHEN o.rk <= sk.k THEN o.demand
                            ELSE least(o.demand,
                                       ({WF_BUDGET} - sk.skv)
                                         // greatest({WF_HOSTS} - sk.k, 1))
                       END) < o.demand THEN 1 ELSE 0 END
            AS INTEGER) AS saturated
FROM o CROSS JOIN sk
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cache_freshness": q_cache_freshness,
        "alt_text_junk": q_alt_text_junk,
        "waterfill_budgets": q_waterfill_budgets,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cache_freshness": ORACLE_CACHE_FRESHNESS,
        "alt_text_junk": ORACLE_ALT_TEXT,
        "waterfill_budgets": ORACLE_WATERFILL,
    }
