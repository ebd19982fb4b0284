"""Round-2 continuation queries, part 13: byte-range fetch planning,
rendezvous fetcher assignment, UCB explore/exploit host scoring.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fetch import range_fetch_plan, rendezvous_assign
from .scheduler import ucb_host_priority


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# range_plan — HTTP Range parts for large objects
# --------------------------------------------------------------------------

_RANGE_CHUNK = 1_000_000


def q_range_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range_fetch_plan at 1 MB chunks over a size mix: small objects
    (one plain-GET part, null range), mid (2-4 ranged parts with an
    uneven tail), and a max_parts-capped giant every 50th row."""
    doc = F.col("doc_id")
    size = (
        F.when(doc % 50 == 0, F.lit(100_000_000) + doc)   # capped at 64
        .when(doc % 3 == 0, F.lit(2_500_000) + (doc % 7) * 1000)
        .when(doc % 3 == 1, F.lit(999_999))
        .otherwise(F.lit(3_999_999))
    ).cast("long")
    objs = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://o.test/f/"), doc.cast("string")).alias("url"),
        size.alias("est_bytes"),
    )
    return range_fetch_plan(objs, chunk_bytes=_RANGE_CHUNK)


ORACLE_RANGE_PLAN = f"""
WITH o AS (
  SELECT 'http://o.test/f/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 50 = 0 THEN 100000000 + doc_id
              WHEN doc_id % 3 = 0 THEN 2500000 + (doc_id % 7) * 1000
              WHEN doc_id % 3 = 1 THEN 999999
              ELSE 3999999 END AS sz
  FROM documents
),
np AS (
  SELECT url, sz,
         GREATEST(LEAST(64, (sz + {_RANGE_CHUNK - 1}) // {_RANGE_CHUNK}), 1)
           AS n,
         (sz + GREATEST(LEAST(64,
            (sz + {_RANGE_CHUNK - 1}) // {_RANGE_CHUNK}), 1) - 1)
           // GREATEST(LEAST(64,
            (sz + {_RANGE_CHUNK - 1}) // {_RANGE_CHUNK}), 1) AS ps
  FROM o
),
parts AS (
  SELECT url, sz, n, ps, k.generate_series AS part
  FROM np, generate_series(0, 63) AS k
  WHERE k.generate_series < n
)
SELECT url, CAST(part AS INTEGER) AS part,
       CASE WHEN n > 1 THEN CAST(part * ps AS BIGINT) END AS range_start,
       CASE WHEN n > 1
            THEN CAST(LEAST(sz - 1, (part + 1) * ps - 1) AS BIGINT) END
         AS range_end,
       CAST(CASE WHEN n = 1 THEN sz
                 ELSE LEAST(sz - 1, (part + 1) * ps - 1) - part * ps + 1
            END AS BIGINT) AS part_bytes
FROM parts
"""


# --------------------------------------------------------------------------
# fetcher_assign — rendezvous hashing onto the fetcher fleet
# --------------------------------------------------------------------------

_FETCHERS = ["f-a", "f-b", "f-c", "f-d", "f-e"]


def q_fetcher_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rendezvous_assign over a 5-node fetcher fleet: each URL to
    argmax hash(url, fetcher) — the oracle recomputes the same md5
    weights and argmax with list HOFs."""
    doc = F.col("doc_id")
    urls = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://h"), (doc % 30).cast("string"),
                 F.lit(".test/p/"), doc.cast("string")).alias("url"),
    )
    return rendezvous_assign(urls, _FETCHERS)


def _oracle_fetcher_assign() -> str:
    weights = ", ".join(
        "struct_pack(w := CAST(('0x' || substr(md5(u || '#" + f
        + "'), 1, 8)) AS BIGINT), f := '" + f + "')"
        for f in _FETCHERS
    )
    return f"""
WITH u AS (
  SELECT 'http://h' || CAST(doc_id % 30 AS VARCHAR) || '.test/p/' ||
         CAST(doc_id AS VARCHAR) AS u
  FROM documents
),
cand AS (SELECT u, list_value({weights}) AS cs FROM u),
best AS (
  SELECT u,
         list_aggregate(list_transform(cs, c -> c.w), 'max') AS w
  FROM cand
),
pick AS (
  SELECT c.u AS url, b.w,
         list_filter(c.cs, x -> x.w = b.w)[1].f AS fetcher
  FROM cand c JOIN best b ON b.u = c.u
)
SELECT url, fetcher, CAST(w AS BIGINT) AS weight FROM pick
"""


# --------------------------------------------------------------------------
# ucb_hosts — explore/exploit host scoring
# --------------------------------------------------------------------------

def q_ucb_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ucb_host_priority over per-host stats (fetch counts 10..500,
    quality by arithmetic): under-crawled hosts earn a visible explore
    bonus, heavily-crawled ones nearly none."""
    doc = F.col("doc_id")
    stats = (
        _docs(spark, sf_dir)
        .groupBy((doc % 17).alias("hid"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(F.lit("h"), F.col("hid").cast("string")).alias("host"),
            (F.col("cnt") * (F.col("hid") + 1)).cast("long")
            .alias("n_fetches"),
            ((F.col("hid") * 53) % 1000).cast("long")
            .alias("mean_quality_permille"),
        )
    )
    return ucb_host_priority(stats)


ORACLE_UCB_HOSTS = """
WITH s AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host,
         CAST(cnt * (hid + 1) AS BIGINT) AS n_fetches,
         CAST((hid * 53) % 1000 AS BIGINT) AS q
  FROM (SELECT doc_id % 17 AS hid, COUNT(*) AS cnt
        FROM documents GROUP BY doc_id % 17)
),
t AS (SELECT CAST(SUM(n_fetches) AS BIGINT) AS tot FROM s)
SELECT host, n_fetches, q AS mean_quality_permille,
       CAST((250 * CAST(FLOOR(SQRT(CAST((1000000 * tot) // n_fetches
         AS DOUBLE))) AS BIGINT)) // 1000 AS BIGINT) AS explore_bonus,
       CAST(q + (250 * CAST(FLOOR(SQRT(CAST((1000000 * tot) // n_fetches
         AS DOUBLE))) AS BIGINT)) // 1000 AS BIGINT) AS ucb_score
FROM s, t
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "range_plan": q_range_plan,
        "fetcher_assign": q_fetcher_assign,
        "ucb_hosts": q_ucb_hosts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "range_plan": ORACLE_RANGE_PLAN,
        "fetcher_assign": _oracle_fetcher_assign(),
        "ucb_hosts": ORACLE_UCB_HOSTS,
    }
