"""Round-2 continuation queries, part 9: DUST-style learned tracking-param
mining, per-host circuit breaker, and the feed-driven refresh wave.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import mine_droppable_params
from .fetch import circuit_breaker_state


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# param_mining — which query params are content-bearing vs droppable
# --------------------------------------------------------------------------

def q_param_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mine_droppable_params over a corpus whose URLs carry a session id
    (sid=doc — content NEVER depends on it) and a pagination param
    (page=doc%3 — content DOES depend on it).  sid must mine as
    droppable (witnessed by multi-URL bases); page must not — its
    param-stripped bases are singletons (no witness) AND would be
    multi-hash if grouped."""
    doc = F.col("doc_id")
    host = F.concat(F.lit("h"), (doc % 5).cast("string"))
    grp = (doc - doc % 4).cast("string")
    page = (doc % 3).cast("string")
    url = F.concat(
        F.lit("http://"), host, F.lit(".test/p/"), grp,
        F.lit("?page="), page, F.lit("&sid=s"), doc.cast("string"),
    )
    chash = F.concat(F.lit("c:"), host, F.lit(":"), grp, F.lit(":"), page)
    pages = _docs(spark, sf_dir).select(
        host.alias("host"), url.alias("url"), chash.alias("content_hash")
    )
    return mine_droppable_params(pages)


ORACLE_PARAM_MINING = """
WITH d AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 5 AS VARCHAR) AS h,
         CAST(doc_id - doc_id % 4 AS VARCHAR) AS g,
         CAST(doc_id % 3 AS VARCHAR) AS pg
  FROM documents
),
-- param 'sid' removed: base keeps page -> groups share bases, one hash each
sid_bases AS (
  SELECT h, 'http://' || h || '.test/p/' || g || '?page=' || pg AS base,
         COUNT(*) AS nu
  FROM d GROUP BY h, g, pg
),
sid_agg AS (
  SELECT h AS host, 'sid' AS param,
         CAST(SUM(nu) AS BIGINT) AS n_urls,
         CAST(COUNT(*) AS BIGINT) AS n_bases,
         CAST(SUM(CASE WHEN nu >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_witnessed_bases,
         SUM(CASE WHEN nu >= 2 THEN 1 ELSE 0 END) > 0 AS droppable
  FROM sid_bases GROUP BY h
),
-- param 'page' removed: base keeps sid=doc -> every base is a singleton
page_agg AS (
  SELECT h AS host, 'page' AS param,
         CAST(COUNT(*) AS BIGINT) AS n_urls,
         CAST(COUNT(*) AS BIGINT) AS n_bases,
         CAST(0 AS BIGINT) AS n_witnessed_bases,
         FALSE AS droppable
  FROM d GROUP BY h
)
SELECT * FROM sid_agg UNION ALL SELECT * FROM page_agg
"""


# --------------------------------------------------------------------------
# circuit_breaker — per-host failure-budget states
# --------------------------------------------------------------------------

_CB_NOW = 1_000_000


def q_circuit_breaker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """circuit_breaker_state over a synthetic outcome log: healthy hosts
    stay closed; a failing host trips open while its last failure is
    inside the cooldown, half_open once it ages past; rows older than
    the 3600 s window don't count."""
    doc = F.col("doc_id")
    host_id = doc % 12
    # hosts 0-3 healthy; 4-7 failing recently (open); 8-11 failing but
    # cooled down (half_open)
    ok = F.when(host_id <= 3, F.lit(True)).otherwise(doc % 4 == 0)
    fetch_ts = F.when(
        doc % 10 == 9, F.lit(_CB_NOW - 7200)  # outside window, ignored
    ).when(host_id <= 7, F.lit(_CB_NOW) - (doc % 300)
           ).otherwise(F.lit(_CB_NOW) - 700 - (doc % 300))
    outcomes = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), host_id.cast("string")).alias("host"),
        ok.alias("ok"),
        fetch_ts.cast("long").alias("fetch_ts"),
    )
    return circuit_breaker_state(outcomes, now_ts=_CB_NOW)


ORACLE_CIRCUIT_BREAKER = f"""
WITH o AS (
  SELECT 'h' || CAST(doc_id % 12 AS VARCHAR) AS host,
         CASE WHEN doc_id % 12 <= 3 THEN TRUE
              ELSE doc_id % 4 = 0 END AS ok,
         CASE WHEN doc_id % 10 = 9 THEN {_CB_NOW - 7200}
              WHEN doc_id % 12 <= 7 THEN {_CB_NOW} - (doc_id % 300)
              ELSE {_CB_NOW} - 700 - (doc_id % 300) END AS fetch_ts
  FROM documents
),
recent AS (SELECT * FROM o WHERE fetch_ts >= {_CB_NOW} - 3600),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_recent,
         CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
         MAX(CASE WHEN NOT ok THEN fetch_ts END) AS last_fail
  FROM recent GROUP BY host
)
SELECT host, n_recent, n_fail,
       CAST((1000 * n_fail) // n_recent AS BIGINT) AS fail_permille,
       CAST({_CB_NOW} - last_fail AS BIGINT) AS last_fail_age_s,
       CASE WHEN n_fail >= 5 AND (1000 * n_fail) // n_recent >= 500
                 AND {_CB_NOW} - last_fail < 600 THEN 'open'
            WHEN n_fail >= 5 AND (1000 * n_fail) // n_recent >= 500
              THEN 'half_open'
            ELSE 'closed' END AS state
FROM agg
"""


# --------------------------------------------------------------------------
# feed_refresh — feeds -> new item URLs -> seen anti-join -> admitted
# --------------------------------------------------------------------------

def q_feed_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feed-driven refresh chain: parse every doc's RSS feed (2
    items), canonicalize the item URLs, anti-join the seen set (every
    3rd item URL already crawled) — the admitted set seeds the next
    wave without any speculative BFS re-expansion."""
    from .extract import feed_items

    doc = F.col("doc_id")
    s = doc.cast("string")
    body = F.concat(
        F.lit("<rss><channel><item><link>HTTP://N.test/a/"), s,
        F.lit("</link><title>a</title><pubDate>d</pubDate></item>"
              "<item><link>http://n.test/b/"), s,
        F.lit("</link><title>b</title><pubDate>d</pubDate></item>"
              "</channel></rss>"),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    items = d.select(
        "doc_id", F.explode(feed_items(F.col("body"))).alias("i")
    ).select("doc_id", F.lower(F.col("i.url")).alias("url"))
    seen = _docs(spark, sf_dir).filter(doc % 3 == 0).select(
        F.concat(F.lit("http://n.test/a/"), s).alias("url")
    )
    admitted = items.join(seen, "url", "left_anti")
    return admitted.select("doc_id", "url")


ORACLE_FEED_REFRESH = """
SELECT doc_id, 'http://n.test/a/' || CAST(doc_id AS VARCHAR) AS url
FROM documents WHERE doc_id % 3 <> 0
UNION ALL
SELECT doc_id, 'http://n.test/b/' || CAST(doc_id AS VARCHAR)
FROM documents
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "param_mining": q_param_mining,
        "circuit_breaker": q_circuit_breaker,
        "feed_refresh": q_feed_refresh,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "param_mining": ORACLE_PARAM_MINING,
        "circuit_breaker": ORACLE_CIRCUIT_BREAKER,
        "feed_refresh": ORACLE_FEED_REFRESH,
    }
