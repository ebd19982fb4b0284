"""Round-3 queries, part 7: Mercator front/back-queue dispatch order,
HSTS policy table + http->https frontier upgrade, and integer-exact
TF-IDF cosine verification of candidate near-dup pairs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# mercator_dispatch
# --------------------------------------------------------------------------

def q_mercator_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.mercator_dispatch over a 37-host frontier with 3 back
    queues: per-host politeness delay 100/200/300 ms, URL priority
    doc%5; the oracle replays the front-queue admission rank, slot
    round-robin, serial slot occupancy cumsum and per-URL dispatch
    times in window SQL."""
    from .scheduler import mercator_dispatch

    doc = F.col("doc_id")
    k = doc % 37
    frontier = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://h"), k.cast("string"), F.lit(".test/p"),
                 doc.cast("string")).alias("url"),
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        (doc % 5).cast("long").alias("priority"),
        doc.cast("long").alias("discovery_ord"),
        (100 * (1 + k % 3)).cast("long").alias("delay_ms"),
    )
    return mercator_dispatch(frontier, n_back=3).orderBy("dispatch_ord")


ORACLE_MERCATOR = """
WITH u AS (
  SELECT 'http://h' || (doc_id % 37) || '.test/p' || doc_id AS url,
         'h' || (doc_id % 37) AS host,
         doc_id % 5 AS prio, doc_id AS ord,
         100 * (1 + (doc_id % 37) % 3) AS delay
  FROM documents
),
h AS (
  SELECT host, COUNT(*) AS n, MAX(prio) AS best, MAX(delay) AS hdelay
  FROM u GROUP BY host
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY best DESC, host) AS admission_rank
  FROM h
),
s AS (
  SELECT host, hdelay,
         CAST((admission_rank - 1) % 3 AS INTEGER) AS slot,
         admission_rank,
         CAST(COALESCE(SUM(n * hdelay) OVER (
             PARTITION BY (admission_rank - 1) % 3
             ORDER BY admission_rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS host_start_ms
  FROM r
),
q AS (
  SELECT u.url, u.host, s.slot, s.admission_rank,
         ROW_NUMBER() OVER (PARTITION BY u.host ORDER BY u.ord) AS seq,
         s.host_start_ms + (ROW_NUMBER() OVER (
             PARTITION BY u.host ORDER BY u.ord) - 1) * s.hdelay
           AS dispatch_ms
  FROM u JOIN s ON u.host = s.host
)
SELECT url, host, slot, admission_rank, seq, dispatch_ms,
       ROW_NUMBER() OVER (ORDER BY dispatch_ms, host, seq) AS dispatch_ord
FROM q
ORDER BY dispatch_ord
"""


# --------------------------------------------------------------------------
# hsts_upgrade
# --------------------------------------------------------------------------

def q_hsts_upgrade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.hsts_policies + hsts_upgrade: 20 policy hosts d<k>.com
    (k%4: includeSubDomains / plain / max-age=0 revoked / expired), and
    per doc%5 an exact-host, subdomain, explicit-:80, already-https, or
    uncovered URL; the oracle computes the expected upgrade decision
    per case arithmetically."""
    from .canon import hsts_policies, hsts_upgrade

    doc = F.col("doc_id")
    k = doc % 20
    pol_src = (
        _docs(spark, sf_dir).filter(doc < 20).select(
            F.concat(F.lit("d"), k.cast("string"), F.lit(".com"))
            .alias("host"),
            F.when(k % 4 == 0,
                   F.lit("max-age=31536000; includeSubDomains"))
            .when(k % 4 == 1, F.lit("Max-Age=63072000"))
            .when(k % 4 == 2, F.lit("max-age=0"))
            .otherwise(F.lit("MAX-AGE=100; preload")).alias("sts"),
            F.lit(1000).cast("long").alias("observed_ts"),
        )
    )
    policies = hsts_policies(pol_src, now_ts=2000)
    m = doc % 5
    urls = _docs(spark, sf_dir).select(
        F.when(m == 0, F.concat(F.lit("http://d"), k.cast("string"),
                                F.lit(".com/p"), doc.cast("string")))
        .when(m == 1, F.concat(F.lit("http://a.d"), k.cast("string"),
                               F.lit(".com/p"), doc.cast("string")))
        .when(m == 2, F.concat(F.lit("http://d"), k.cast("string"),
                               F.lit(".com:80/p"), doc.cast("string")))
        .when(m == 3, F.concat(F.lit("https://d"), k.cast("string"),
                               F.lit(".com/p"), doc.cast("string")))
        .otherwise(F.concat(F.lit("http://other"), doc.cast("string"),
                            F.lit(".net/x"))).alias("url"),
    )
    return hsts_upgrade(urls, policies).orderBy("url")


ORACLE_HSTS = """
WITH u AS (
  SELECT doc_id, doc_id % 20 AS k, doc_id % 5 AS m,
         CASE doc_id % 5
           WHEN 0 THEN 'http://d' || (doc_id % 20) || '.com/p' || doc_id
           WHEN 1 THEN 'http://a.d' || (doc_id % 20) || '.com/p' || doc_id
           WHEN 2 THEN 'http://d' || (doc_id % 20) || '.com:80/p' || doc_id
           WHEN 3 THEN 'https://d' || (doc_id % 20) || '.com/p' || doc_id
           ELSE 'http://other' || doc_id || '.net/x'
         END AS url
  FROM documents
),
j AS (
  SELECT url,
         -- active policies: k%4 in (0,1); subdomains only for k%4=0
         CASE WHEN m IN (0, 2) AND k % 4 IN (0, 1) THEN TRUE
              WHEN m = 1 AND k % 4 = 0 THEN TRUE
              ELSE FALSE END AS upgraded,
         CASE WHEN (m IN (0, 2) AND k % 4 IN (0, 1))
                OR (m = 1 AND k % 4 = 0)
              THEN 'd' || k || '.com' END AS matched_host,
         k, m, doc_id
  FROM u
)
SELECT url, upgraded, matched_host,
       CASE WHEN NOT upgraded THEN url
            WHEN m = 2 THEN 'https://d' || k || '.com:443/p' || doc_id
            WHEN m = 1 THEN 'https://a.d' || k || '.com/p' || doc_id
            ELSE 'https://d' || k || '.com/p' || doc_id
       END AS upgraded_url
FROM j
ORDER BY url
"""


# --------------------------------------------------------------------------
# tfidf_cosine_pairs
# --------------------------------------------------------------------------

def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.tfidf_cosine_pairs on adjacent-doc candidate
    pairs (doc, doc+1) for doc%10==0; milli-quantized integer weights
    make dot/norm sums exact, so the oracle replays them bit-for-bit
    and only the final cosine divide is floating point."""
    from .textops.quality import tfidf_cosine_pairs

    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    pairs = (
        a.filter(F.col("id_a") % 10 == 0)
        .join(b, F.col("id_b") == F.col("id_a") + 1)
    )
    return tfidf_cosine_pairs(docs, pairs).orderBy("id_a")


ORACLE_TFIDF = """
WITH tok AS (
  SELECT doc_id AS doc,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM documents
),
tf AS (
  SELECT doc, w, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc, UNNEST(t) AS w FROM tok) GROUP BY doc, w
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM tok),
dfr AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
wgt AS (
  SELECT tf.doc, tf.w,
         CAST(ROUND(1e3 * tf.tf *
                    (LN((nd.n_docs + 1.0) / (dfr.df + 1.0)) + 1.0))
              AS BIGINT) AS wgt
  FROM tf JOIN dfr ON tf.w = dfr.w CROSS JOIN nd
),
norms AS (
  SELECT doc, CAST(SUM(wgt * wgt) AS BIGINT) AS norm2
  FROM wgt GROUP BY doc
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 10 = 0
),
dots AS (
  SELECT p.id_a, p.id_b,
         CAST(SUM(wa.wgt * wb.wgt) AS BIGINT) AS dot,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms
  FROM p
  JOIN wgt wa ON wa.doc = p.id_a
  JOIN wgt wb ON wb.doc = p.id_b AND wb.w = wa.w
  GROUP BY p.id_a, p.id_b
)
SELECT p.id_a, p.id_b,
       COALESCE(d.n_shared_terms, 0) AS n_shared_terms,
       COALESCE(CAST(ROUND(1e6 * CAST(d.dot AS DOUBLE)
                           / (SQRT(CAST(na.norm2 AS DOUBLE))
                              * SQRT(CAST(nb.norm2 AS DOUBLE))))
                     AS BIGINT), 0) AS cos_micro
FROM p
LEFT JOIN dots d ON d.id_a = p.id_a AND d.id_b = p.id_b
JOIN norms na ON na.doc = p.id_a
JOIN norms nb ON nb.doc = p.id_b
ORDER BY p.id_a
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mercator_dispatch": q_mercator_dispatch,
        "hsts_upgrade": q_hsts_upgrade,
        "tfidf_cosine": q_tfidf_cosine,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mercator_dispatch": ORACLE_MERCATOR,
        "hsts_upgrade": ORACLE_HSTS,
        "tfidf_cosine": ORACLE_TFIDF,
    }
