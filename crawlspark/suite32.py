"""Round-3 queries, part 3: syndication containment dedup and robots
snapshot policy diff.

- syndication_containment: asymmetric n-gram containment (excerpt-in-
  article detection Jaccard misses), df-capped grams so boilerplate never
  explodes the pair join.  Fixture: (article, partner) doc pairs where
  the partner is a full copy (mutual), a contained excerpt (b_in_a), or
  disjoint (no pair) — plus a boilerplate tail on EVERY doc that the
  df-cap must drop at any SF.
- robots_policy_diff: the compliance work-list between two robots.txt
  snapshots (newly_disallowed = purge list).  Both oracles are
  construction-derived arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# syndication_containment
# --------------------------------------------------------------------------

def q_syndication_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.dedup.ngram_containment_pairs over constructed doc pairs
    (2d = 20-word article, 2d+1 = copy / 10-word excerpt / disjoint by
    d mod 5 / mod 3) with a 3-word boilerplate tail on every doc; the
    expected pair set, shared-gram counts, and containment permilles
    follow from the construction (copy: 20 shared of 20/20 -> mutual;
    excerpt: 8 shared of 20/10 -> 400/800 b_in_a; disjoint: no capped
    shared gram -> absent; boilerplate gram df = n_docs -> dropped by
    df_cap=16 at every SF)."""
    from .textops.dedup import ngram_containment_pairs

    doc = F.col("doc_id")
    d = F.expr("doc_id div 2")

    def words(lo: int, hi: int):
        return F.transform(
            F.sequence(F.lit(lo), F.lit(hi)),
            lambda i: F.concat(F.lit("t"), (d * 40 + i).cast("string")),
        )

    art, exc, dis = words(0, 19), words(5, 14), words(20, 29)
    body = (
        F.when(doc % 2 == 0, art)
        .when(d % 5 == 0, art)
        .when(d % 3 == 0, dis)
        .otherwise(exc)
    )
    boiler = F.array(F.lit("B0"), F.lit("B1"), F.lit("B2"))
    texts = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat_ws(" ", F.concat(body, boiler)).alias("text"),
    )
    return ngram_containment_pairs(
        texts, n=3, df_cap=16, min_permille=750
    ).orderBy("id_a")


ORACLE_SYNDICATION = """
-- only COMPLETE pairs (both 2d and 2d+1 present): an odd trailing doc
-- has no partner and must produce no pair on either side
WITH p AS (
  SELECT doc_id // 2 AS d FROM documents GROUP BY 1 HAVING COUNT(*) = 2
)
SELECT CAST(2 * d AS BIGINT) AS id_a,
       CAST(2 * d + 1 AS BIGINT) AS id_b,
       CAST(20 AS BIGINT) AS shared,
       CAST(1000 AS BIGINT) AS cont_a_permille,
       CAST(1000 AS BIGINT) AS cont_b_permille,
       'mutual_dup' AS relation
FROM p WHERE d % 5 = 0
UNION ALL
SELECT CAST(2 * d AS BIGINT), CAST(2 * d + 1 AS BIGINT),
       CAST(8 AS BIGINT), CAST(400 AS BIGINT), CAST(800 AS BIGINT),
       'b_in_a'
FROM p WHERE d % 5 <> 0 AND d % 3 <> 0
ORDER BY id_a
"""


# --------------------------------------------------------------------------
# robots_policy_diff
# --------------------------------------------------------------------------

def q_robots_policy_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.robots_policy_diff: old snapshot disallows /private on all
    10 hosts; the new snapshot tightens h0-h4 (adds /tmp) and drops all
    rules on h5-h9.  /private rows on h5-h9 flip newly_allowed, /tmp
    rows on h0-h4 flip newly_disallowed (the purge list), /pub rows stay
    allowed; flags as 0/1 ints (never nullable booleans)."""
    from .robots import robots_policy_diff

    doc = F.col("doc_id")
    frontier = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("h"), (doc % 10).cast("string")).alias("host"),
        F.when(doc % 4 == 0,
               F.concat(F.lit("/private/p"), doc.cast("string")))
        .when(doc % 4 == 1, F.concat(F.lit("/tmp/t"), doc.cast("string")))
        .otherwise(F.concat(F.lit("/pub/x"), doc.cast("string")))
        .alias("path"),
    )
    hosts = spark.range(10).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.col("id").alias("i"),
    )
    empty = F.array().cast("array<string>")
    old_rules = hosts.select(
        "host", F.lit("*").alias("user_agent"),
        F.array(F.lit("/private")).alias("disallow_prefixes"),
        empty.alias("allow_prefixes"),
    )
    new_rules = hosts.select(
        "host", F.lit("*").alias("user_agent"),
        F.when(F.col("i") < 5, F.array(F.lit("/private"), F.lit("/tmp")))
        .otherwise(empty).alias("disallow_prefixes"),
        empty.alias("allow_prefixes"),
    )
    out = robots_policy_diff(frontier, old_rules, new_rules)
    return out.select(
        "doc_id", "host", "path",
        F.col("old_allowed").cast("int").alias("old_ok"),
        F.col("new_allowed").cast("int").alias("new_ok"),
        "transition",
    ).orderBy("doc_id")


ORACLE_ROBOTS_DIFF = """
WITH d AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
         CASE WHEN doc_id % 4 = 0 THEN '/private/p' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 4 = 1 THEN '/tmp/t' || CAST(doc_id AS VARCHAR)
              ELSE '/pub/x' || CAST(doc_id AS VARCHAR) END AS path,
         doc_id % 10 < 5 AS tight,
         doc_id % 4 AS m
  FROM documents
)
SELECT doc_id, host, path,
       CAST(CASE WHEN m = 0 THEN 0 ELSE 1 END AS INTEGER) AS old_ok,
       CAST(CASE WHEN tight AND m IN (0, 1) THEN 0 ELSE 1 END
            AS INTEGER) AS new_ok,
       CASE WHEN m = 0 AND tight THEN 'still_disallowed'
            WHEN m = 0 THEN 'newly_allowed'
            WHEN m = 1 AND tight THEN 'newly_disallowed'
            ELSE 'still_allowed' END AS transition
FROM d
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "syndication_containment": q_syndication_containment,
        "robots_policy_diff": q_robots_policy_diff,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "syndication_containment": ORACLE_SYNDICATION,
        "robots_policy_diff": ORACLE_ROBOTS_DIFF,
    }
