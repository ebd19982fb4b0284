"""Round-3 queries, part 34: content-defined chunking, HLL register
relation, Alt-Svc / HTTP-3 endpoint parsing, RAKE keyword extraction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# cdc_chunks — content-defined chunking (shift-robust passage dedup)
# --------------------------------------------------------------------------

def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.dedup.cdc_chunks over a deterministic token stream
    (12 + doc%9 tokens, token i = 'w'||((doc*31+i*7)%53)) with w=3,
    mod=4 — the oracle replays the full windowed-hash cut-point
    derivation and per-chunk hashing in SQL list comprehensions."""
    from .textops.dedup import cdc_chunks

    doc = F.col("doc_id")
    n_tok = (F.lit(12) + doc % 9).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.concat(F.lit("w"), ((doc * 31 + i * 7) % 53).cast("string")),
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )
    return cdc_chunks(d, w=3, mod=4)


ORACLE_CDC_CHUNKS = """
WITH t AS (
  SELECT doc_id,
         [ 'w' || CAST((doc_id*31 + i*7) % 53 AS VARCHAR)
           for i in range(1, 12 + doc_id % 9 + 1) ] AS tk
  FROM documents
),
b AS (
  SELECT doc_id, tk,
         [0] || [ i for i in range(3, len(tk))
                  if CAST(('0x' || substr(md5(array_to_string(tk[i-2:i], ' ')), 1, 8))
                          AS BIGINT) % 4 = 0 ]
             || [len(tk)] AS bounds
  FROM t
)
SELECT doc_id,
       CAST(j - 1 AS BIGINT) AS chunk_ord,
       CAST(bounds[j] + 1 AS BIGINT) AS start_tok,
       CAST(bounds[j+1] - bounds[j] AS BIGINT) AS n_tokens,
       CAST(('0x' || substr(md5(array_to_string(tk[bounds[j]+1 : bounds[j+1]], ' ')), 1, 8))
            AS BIGINT) AS chunk_hash
FROM b, unnest(range(1, len(bounds))) AS u(j)
"""


# --------------------------------------------------------------------------
# hll_host_distinct — mergeable HyperLogLog register relation
# --------------------------------------------------------------------------

def q_hll_host_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sketch.hll_build on two disjoint halves of the corpus (doc
    parity), hll_merge of the register relations, hll_estimate at b=6 —
    the merge path IS the query, proving registers from separate waves
    fold losslessly.  Oracle replays hash/bucket/rho/max/harmonic-sum
    integer arithmetic."""
    from .sketch import hll_build, hll_estimate, hll_merge

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("g"), (doc % 7).cast("string")).alias("grp"),
        doc.alias("key"),
    )
    wave_a = d.filter(F.col("key") % 2 == 0)
    wave_b = d.filter(F.col("key") % 2 != 0)
    regs = hll_merge(hll_build(wave_a, "grp", "key", b=6),
                     hll_build(wave_b, "grp", "key", b=6))
    return hll_estimate(regs, b=6).orderBy("grp")


ORACLE_HLL = """
WITH h AS (
  SELECT 'g' || CAST(doc_id % 7 AS VARCHAR) AS grp,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           AS hv
  FROM documents
),
r AS (
  SELECT grp, hv % 64 AS bucket,
         CASE WHEN hv // 64 = 0 THEN 27
              ELSE 27 - length(bin(hv // 64)) END AS rho
  FROM h
),
regs AS (SELECT grp, bucket, MAX(rho) AS rho FROM r GROUP BY grp, bucket),
agg AS (
  SELECT grp, COUNT(*) AS n_registers,
         SUM(CAST(1 AS BIGINT) << (32 - rho)) AS denom_hit
  FROM regs GROUP BY grp
)
SELECT grp, CAST(n_registers AS BIGINT) AS n_registers,
       CAST((7090 * 64 * 64 * 4294967296)
            // (10000 * (denom_hit + (64 - n_registers) * 4294967296))
            AS BIGINT) AS est
FROM agg
ORDER BY grp
"""


# --------------------------------------------------------------------------
# alt_svc_h3 — RFC 7838 Alt-Svc parse (HTTP/3 endpoint discovery)
# --------------------------------------------------------------------------

def q_alt_svc_h3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """steps.alt_svc_info over the 5-case header matrix: h3+h2 with ma,
    draft h3-29 without ma (spec default 86400), 'clear', empty, and
    h2-only (h3 false, no lifetime)."""
    from .steps import alt_svc_info

    doc = F.col("doc_id")
    m = doc % 5
    hdr = (
        F.when(m == 0, F.lit('h3=":443"; ma=2592000, h2=":443"'))
        .when(m == 1, F.lit('h3-29=":8443"'))
        .when(m == 2, F.lit("clear"))
        .when(m == 3, F.lit(""))
        .otherwise(F.lit('h2=":443"; ma=60'))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("alt_svc"))
    out = d.select("doc_id", alt_svc_info(F.col("alt_svc")).alias("a"))
    return out.select(
        "doc_id", "a.cleared", "a.n_endpoints", "a.h3", "a.h3_ma"
    ).orderBy("doc_id")


ORACLE_ALT_SVC = """
SELECT doc_id,
       doc_id % 5 = 2 AS cleared,
       CAST(CASE doc_id % 5 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 4 THEN 1
            ELSE 0 END AS INTEGER) AS n_endpoints,
       doc_id % 5 IN (0, 1) AS h3,
       CAST(CASE doc_id % 5 WHEN 0 THEN 2592000 WHEN 1 THEN 86400
            END AS BIGINT) AS h3_ma
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# rake_keywords — RAKE phrase scoring (hand-derived expectations)
# --------------------------------------------------------------------------

def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.rake_keywords over 5 fixed sentences chosen to
    exercise repeated words across phrases, punctuation splits,
    stopword-only text (no candidates at all), and the tie-break; the
    oracle carries the hand-computed deg/freq arithmetic."""
    from .textops.quality import rake_keywords

    doc = F.col("doc_id")
    m = doc % 5
    text = (
        F.when(m == 0, F.lit(
            "Deep learning of compact minhash sketches. Deep learning wins."))
        .when(m == 1, F.lit("The quick brown fox and the lazy dog"))
        .when(m == 2, F.lit("Alpha beta, beta gamma"))
        .when(m == 3, F.lit("Spark"))
        .otherwise(F.lit("Of the and"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    out = rake_keywords(d, top_k=3)
    return out.withColumnRenamed("rank", "kw_rank").orderBy(
        "doc_id", "kw_rank"
    )


ORACLE_RAKE = """
WITH expect(m, kw_rank, phrase, n_words, score_milli) AS (
  VALUES
   (0, 1, 'compact minhash sketches', 3, 9000),
   (0, 2, 'deep learning wins', 3, 8000),
   (0, 3, 'deep learning', 2, 5000),
   (1, 1, 'quick brown fox', 3, 9000),
   (1, 2, 'lazy dog', 2, 4000),
   (2, 1, 'alpha beta', 2, 4000),
   (2, 2, 'beta gamma', 2, 4000),
   (3, 1, 'spark', 1, 1000)
)
SELECT d.doc_id, CAST(e.kw_rank AS BIGINT) AS kw_rank, e.phrase,
       CAST(e.n_words AS BIGINT) AS n_words,
       CAST(e.score_milli AS BIGINT) AS score_milli
FROM documents d JOIN expect e ON d.doc_id % 5 = e.m
ORDER BY d.doc_id, kw_rank
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_chunks": q_cdc_chunks,
        "hll_distinct": q_hll_host_distinct,
        "alt_svc_h3": q_alt_svc_h3,
        "rake_keywords": q_rake_keywords,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_chunks": ORACLE_CDC_CHUNKS,
        "hll_distinct": ORACLE_HLL,
        "alt_svc_h3": ORACLE_ALT_SVC,
        "rake_keywords": ORACLE_RAKE,
    }
