"""Round-3 queries, part 35: stupid-backoff bigram LM scoring, URL
front-coding storage audit, schema.org microdata summary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# bigram_backoff — held-out stupid-backoff transition scoring
# --------------------------------------------------------------------------

def _bigram_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-token docs over a 5-word vocab; position 6 differs by doc
    parity (so odd docs hit bigrams even-doc training never saw) and
    position 5 is a unique rare token on doc%97==0 (OOV path for odd
    rares, count-1 path for even rares)."""
    doc = F.col("doc_id")
    tok = lambda i: (  # noqa: E731
        F.when(
            (F.lit(i) == 5) & (doc % 97 == 0),
            F.concat(F.lit("r"), doc.cast("string")),
        )
        .when(
            F.lit(i) == 6,
            F.concat(F.lit("v"),
                     ((doc * 7 + 18 + doc % 2) % 5).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("v"), ((doc * 7 + i * 3) % 5).cast("string"))
        )
    )
    return _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat_ws(" ", *[tok(i) for i in range(1, 9)]).alias("text"),
    )


def q_bigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.bigram_backoff_score trained on the even-doc
    slice, scored over everything — seen-bigram, backoff-to-unigram and
    OOV-floor paths all exercised; the oracle replays counts + joins +
    micro-nat quantization."""
    from .textops.quality import bigram_backoff_score

    d = _bigram_fixture(spark, sf_dir)
    return bigram_backoff_score(
        d, train_filter=F.col("doc_id") % 2 == 0
    ).orderBy("doc_id")


ORACLE_BIGRAM_BACKOFF = """
WITH docs_t AS (
  SELECT doc_id,
         [CASE WHEN i = 5 AND doc_id % 97 = 0
                 THEN 'r' || CAST(doc_id AS VARCHAR)
               WHEN i = 6
                 THEN 'v' || CAST((doc_id*7 + 18 + doc_id % 2) % 5 AS VARCHAR)
               ELSE 'v' || CAST((doc_id*7 + i*3) % 5 AS VARCHAR) END
          for i in range(1, 9)] AS tk
  FROM documents
),
pairs AS (
  SELECT doc_id, tk[i-1] AS prev, tk[i] AS cur
  FROM docs_t, unnest(range(2, 9)) AS u(i)
),
train_uni AS (
  SELECT w, COUNT(*) AS c_uni FROM (
    SELECT unnest(tk) AS w FROM docs_t WHERE doc_id % 2 = 0) GROUP BY w
),
tot AS (SELECT SUM(c_uni) AS t_tot FROM train_uni),
train_bi AS (
  SELECT prev, cur, COUNT(*) AS c_bi FROM pairs
  WHERE doc_id % 2 = 0 GROUP BY prev, cur
),
scored AS (
  SELECT p.doc_id,
         CASE WHEN b.c_bi IS NOT NULL AND up.c_uni IS NOT NULL
              THEN CAST(floor(-ln(CAST(b.c_bi AS DOUBLE) / up.c_uni)
                              * 1000000) AS BIGINT)
              WHEN uc.c_uni IS NOT NULL
              THEN CAST(floor(-ln(0.4 * uc.c_uni / t.t_tot) * 1000000)
                        AS BIGINT)
              ELSE 20000000 END AS cost
  FROM pairs p
  LEFT JOIN train_bi b ON b.prev = p.prev AND b.cur = p.cur
  LEFT JOIN train_uni up ON up.w = p.prev
  LEFT JOIN train_uni uc ON uc.w = p.cur
  CROSS JOIN tot t
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(floor(SUM(cost) / COUNT(*)) AS BIGINT) AS cost_micro_mean
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# url_front_coding — sorted-run prefix-compression audit
# --------------------------------------------------------------------------

def q_url_front_coding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.url_front_coding_stats over 13 hosts x 7 path categories of
    synthesized URLs — per host the sorted run shares long '/cat/N/item'
    prefixes; oracle replays the lag-window LCP arithmetic."""
    from .canon import url_front_coding_stats

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 13).cast("string")).alias("host"),
        doc.alias("doc_id"),
    ).select(
        "host",
        F.concat(
            F.lit("http://"), F.col("host"), F.lit(".test/cat/"),
            (F.col("doc_id") % 7).cast("string"), F.lit("/item"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return url_front_coding_stats(d).orderBy("host")


ORACLE_FRONT_CODING = """
WITH u AS (
  SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) AS host,
         'http://h' || CAST(doc_id % 13 AS VARCHAR) || '.test/cat/' ||
         CAST(doc_id % 7 AS VARCHAR) || '/item' || CAST(doc_id AS VARCHAR)
           AS url
  FROM documents
),
l AS (
  SELECT host, url,
         lag(url) OVER (PARTITION BY host ORDER BY url) AS prev
  FROM u
),
lcps AS (
  SELECT host, length(url) AS len,
         CASE WHEN prev IS NULL OR least(length(url), length(prev)) < 1
              THEN 0
              WHEN list_position(
                  [substr(url, i, 1) = substr(prev, i, 1)
                   for i in range(1, least(length(url), length(prev)) + 1)],
                  false) = 0
              THEN least(length(url), length(prev))
              ELSE list_position(
                  [substr(url, i, 1) = substr(prev, i, 1)
                   for i in range(1, least(length(url), length(prev)) + 1)],
                  false) - 1
              END AS lcp
  FROM l
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(len) AS BIGINT) AS url_bytes,
       CAST(SUM(lcp) AS BIGINT) AS saved_bytes,
       CAST((1000 * SUM(lcp)) // SUM(len) AS BIGINT) AS saved_permille
FROM lcps GROUP BY host ORDER BY host
"""


# --------------------------------------------------------------------------
# microdata — schema.org attribute-vocabulary summary
# --------------------------------------------------------------------------

def q_microdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.microdata_summary over a nested Product/Offer, an Article
    with a repeated prop, a plain page, and an orphan itemprop."""
    from .extract import microdata_summary

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit(
            '<div itemscope itemtype="https://schema.org/Product">'
            '<span itemprop="name">X</span>'
            '<div itemprop="offers" itemscope'
            ' itemtype="https://schema.org/Offer">'
            '<meta itemprop="price" content="9"></div></div>'))
        .when(m == 1, F.lit(
            '<article itemscope itemtype="https://schema.org/Article">'
            '<h1 itemprop="headline">t</h1>'
            '<span itemprop="author">a</span>'
            '<span itemprop="author">b</span></article>'))
        .when(m == 2, F.lit("<p>plain</p>"))
        .otherwise(F.lit('<span itemprop="orphan">x</span>'))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    out = d.select("doc_id", microdata_summary(F.col("body")).alias("m"))
    return out.select(
        "doc_id", "m.n_itemscopes", "m.first_itemtype", "m.n_props",
        "m.n_distinct_props",
    ).orderBy("doc_id")


ORACLE_MICRODATA = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END
            AS INTEGER) AS n_itemscopes,
       CASE doc_id % 4 WHEN 0 THEN 'https://schema.org/Product'
            WHEN 1 THEN 'https://schema.org/Article' END AS first_itemtype,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 3 WHEN 3 THEN 1
            ELSE 0 END AS INTEGER) AS n_props,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 3 THEN 1
            ELSE 0 END AS INTEGER) AS n_distinct_props
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bigram_backoff": q_bigram_backoff,
        "url_front_coding": q_url_front_coding,
        "microdata": q_microdata,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bigram_backoff": ORACLE_BIGRAM_BACKOFF,
        "url_front_coding": ORACLE_FRONT_CODING,
        "microdata": ORACLE_MICRODATA,
    }
