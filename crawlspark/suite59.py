"""Round-3 queries, part 9: Flesch reading ease, Yandex Clean-param
directives, out-in degree assortativity, and daily cohort retention.
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
# flesch_reading_ease
# --------------------------------------------------------------------------

def q_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.flesch_reading_ease over documents.text; the
    oracle replays the letters-only tokens, vowel-group syllable floor
    and sentence-run floor in SQL, then the same two divides."""
    from .textops.quality import flesch_reading_ease

    return flesch_reading_ease(_docs(spark, sf_dir)).orderBy("id")


ORACLE_FLESCH = """
WITH tok AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent
  FROM documents
),
base AS (
  SELECT id, CAST(len(t) AS BIGINT) AS n_words,
         CAST(n_sent AS BIGINT) AS n_sentences,
         CAST(COALESCE(list_sum(list_transform(t,
             w -> GREATEST(len(string_split_regex(w, '[aeiouy]+')) - 1,
                           1))), 0) AS BIGINT) AS n_syllables
  FROM tok
)
SELECT id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         CAST(ROUND(1e3 * (206.835
              - 1.015 * CAST(n_words AS DOUBLE) / n_sentences
              - 84.6 * CAST(n_syllables AS DOUBLE) / n_words)) AS BIGINT)
       END AS fre_milli
FROM base
ORDER BY id
"""


# --------------------------------------------------------------------------
# clean_param
# --------------------------------------------------------------------------

def q_clean_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.parse_clean_params + apply_clean_params: 10 hosts whose
    robots.txt declares (sid&ref under /forum/), (utm_a site-wide), or
    nothing; URLs exercise first/middle/lone param positions and
    prefix mismatches; the oracle states the expected cleaned URL per
    case arithmetically."""
    from .robots import apply_clean_params, parse_clean_params

    doc = F.col("doc_id")
    k = doc % 10
    robots = _docs(spark, sf_dir).filter(doc < 10).select(
        F.concat(F.lit("f"), k.cast("string"), F.lit(".com")).alias("host"),
        F.when(k % 3 == 0,
               F.lit("User-agent: *\nClean-param: sid&ref /forum/\n"))
        .when(k % 3 == 1, F.lit("Clean-param: utm_a\n"))
        .otherwise(F.lit("User-agent: *\nDisallow: /tmp\n")).alias("body"),
    )
    directives = parse_clean_params(robots)
    m = doc % 4
    base = F.concat(F.lit("http://f"), k.cast("string"), F.lit(".com"))
    ds = doc.cast("string")
    urls = _docs(spark, sf_dir).select(
        F.when(m == 0, F.concat(base, F.lit("/forum/t?sid="), ds,
                                F.lit("&x=1")))
        .when(m == 1, F.concat(base, F.lit("/forum/t?sid="), ds))
        .when(m == 2, F.concat(base, F.lit("/other?sid="), ds,
                               F.lit("&utm_a=2")))
        .otherwise(F.concat(base, F.lit("/forum/t?a=1&sid="), ds,
                            F.lit("&b=2"))).alias("url"),
    )
    return apply_clean_params(urls, directives).orderBy("url")


ORACLE_CLEAN_PARAM = """
WITH u AS (
  SELECT doc_id, doc_id % 10 AS k, doc_id % 4 AS m,
         'http://f' || (doc_id % 10) || '.com' AS base
  FROM documents
),
c AS (
  SELECT doc_id, k, m, base,
         CASE m
           WHEN 0 THEN base || '/forum/t?sid=' || doc_id || '&x=1'
           WHEN 1 THEN base || '/forum/t?sid=' || doc_id
           WHEN 2 THEN base || '/other?sid=' || doc_id || '&utm_a=2'
           ELSE base || '/forum/t?a=1&sid=' || doc_id || '&b=2'
         END AS url
  FROM u
)
SELECT url,
       CASE
         WHEN k % 3 = 0 AND m = 0 THEN base || '/forum/t?x=1'
         WHEN k % 3 = 0 AND m = 1 THEN base || '/forum/t'
         WHEN k % 3 = 0 AND m = 3 THEN base || '/forum/t?a=1&b=2'
         WHEN k % 3 = 1 AND m = 2 THEN base || '/other?sid=' || doc_id
         ELSE url
       END AS cleaned_url,
       CAST(CASE WHEN k % 3 = 0 AND m IN (0, 1, 3) THEN 1
                 WHEN k % 3 = 1 AND m = 2 THEN 1
                 ELSE 0 END AS BIGINT) AS n_stripped
FROM c
ORDER BY url
"""


# --------------------------------------------------------------------------
# degree_assortativity
# --------------------------------------------------------------------------

def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.degree_assortativity over the standard n-doc link
    graph; all five sums are BIGINT-exact, the oracle replays them and
    the one floating-point Pearson divide."""
    from . import graph
    from .linkgraph import degree_assortativity

    n = _docs(spark, sf_dir).count()
    return degree_assortativity(graph.edges(spark, sf_dir, n))


ORACLE_ASSORTATIVITY = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         CASE p.pos
           WHEN 0 THEN (2*d.doc_id + 1) % nn.c
           WHEN 1 THEN (2*d.doc_id + 2) % nn.c
           WHEN 2 THEN (5*d.doc_id + 3) % nn.c
           ELSE (d.doc_id + 17) % nn.c
         END AS dst
  FROM documents d CROSS JOIN nn
  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)
),
outd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS x FROM edges GROUP BY src),
ind AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS y FROM edges GROUP BY dst),
per AS (
  SELECT o.x, i.y
  FROM edges e JOIN outd o ON o.src = e.src JOIN ind i ON i.dst = e.dst
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(x*x) AS BIGINT) AS sxx,
         CAST(SUM(y*y) AS BIGINT) AS syy
  FROM per
)
SELECT m, sx, sy, sxy, sxx, syy,
       CASE WHEN m*sxx - sx*sx > 0 AND m*syy - sy*sy > 0 THEN
         CAST(ROUND(1e3 * CAST(m*sxy - sx*sy AS DOUBLE)
              / (SQRT(CAST(m*sxx - sx*sx AS DOUBLE))
                 * SQRT(CAST(m*syy - sy*sy AS DOUBLE)))) AS BIGINT)
       END AS r_milli
FROM s
"""


# --------------------------------------------------------------------------
# cohort_retention
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention over the events table: cohort = a user's
    first active day, then distinct active users per (cohort_day,
    day_offset) — the triangle matrix a crawl-quality dashboard plots
    for recrawl planning.  Two map-side-combined aggregates plus one
    broadcastable first-day join; no windows."""
    e = _events(spark, sf_dir)
    day = (F.unix_micros(F.col("ts").cast("timestamp"))
           / _DAY_US).cast("long")
    active = e.select(F.col("user_id").alias("u"), day.alias("d")).distinct()
    first = active.groupBy("u").agg(F.min("d").alias("d0"))
    return (
        active.join(first, "u")
        .groupBy(F.col("d0").alias("cohort_day"),
                 (F.col("d") - F.col("d0")).alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


ORACLE_COHORT = f"""
WITH active AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {_DAY_US} AS d
  FROM events
),
first AS (SELECT u, MIN(d) AS d0 FROM active GROUP BY u)
SELECT f.d0 AS cohort_day, a.d - f.d0 AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active a JOIN first f ON a.u = f.u
GROUP BY 1, 2
ORDER BY 1, 2
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flesch_reading_ease": q_flesch,
        "clean_param": q_clean_param,
        "degree_assortativity": q_assortativity,
        "cohort_retention": q_cohort_retention,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flesch_reading_ease": ORACLE_FLESCH,
        "clean_param": ORACLE_CLEAN_PARAM,
        "degree_assortativity": ORACLE_ASSORTATIVITY,
        "cohort_retention": ORACLE_COHORT,
    }
