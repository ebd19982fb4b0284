"""Round-3 queries, part 16: sketch set algebra and embedding eval.

- kmv_overlap: KMV (k-minimum-values) union/intersection/Jaccard
  between two crawl waves' URL-key sets — snapshot overlap at
  10^10-URL scale without the exact shuffle join.
- knn_recall: kNN label recall/precision@k over the embeddings table —
  the embedding-quality gate a curation pipeline runs before trusting
  semantic dedup / ANN retrieval.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann import knn_label_eval
from .sketch import _P, KMV_A, KMV_B, kmv_overlap

_K = 64
_KS = (1, 5, 10)
_QMOD = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sketch.kmv_overlap between wave A (doc_id % 3 != 0) and wave B
    (doc_id % 2 == 0) keyed by doc_id: true overlap is the ids that are
    even and not divisible by 3 (1/3 of the corpus).  The oracle
    replays the (A*key + B) mod P hash, both k-min sketches, the union
    re-min, and every estimator integer-for-integer."""
    docs = _docs(spark, sf_dir)
    a = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("key"))
    b = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("key"))
    return kmv_overlap(a, b, key_col="key", k=_K)


ORACLE_KMV_OVERLAP = f"""
WITH ha AS (
  SELECT DISTINCT ({KMV_A} * (doc_id % {_P}) + {KMV_B}) % {_P} AS h
  FROM documents WHERE doc_id % 3 <> 0
),
hb AS (
  SELECT DISTINCT ({KMV_A} * (doc_id % {_P}) + {KMV_B}) % {_P} AS h
  FROM documents WHERE doc_id % 2 = 0
),
ka AS (SELECT h FROM ha ORDER BY h LIMIT {_K}),
kb AS (SELECT h FROM hb ORDER BY h LIMIT {_K}),
ku AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ORDER BY h LIMIT {_K}
),
flag AS (
  SELECT ku.h,
         CASE WHEN ka.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         CASE WHEN kb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
  FROM ku LEFT JOIN ka ON ku.h = ka.h LEFT JOIN kb ON ku.h = kb.h
),
jac AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_kmin,
         CAST(SUM(in_a * in_b) AS BIGINT) AS kmin_in_both
  FROM flag
),
ea AS (
  SELECT CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS BIGINT)
         ELSE (CAST({_K - 1} AS BIGINT) * {_P}) // (MAX(h) + 1) END AS est_a FROM ka
),
eb AS (
  SELECT CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS BIGINT)
         ELSE (CAST({_K - 1} AS BIGINT) * {_P}) // (MAX(h) + 1) END AS est_b FROM kb
),
eu AS (
  SELECT CASE WHEN COUNT(*) < {_K} THEN CAST(COUNT(*) AS BIGINT)
         ELSE (CAST({_K - 1} AS BIGINT) * {_P}) // (MAX(h) + 1) END AS est_union FROM ku
)
SELECT n_kmin, kmin_in_both,
       (1000 * kmin_in_both) // n_kmin AS jaccard_permille,
       est_a, est_b, est_union,
       ((1000 * kmin_in_both) // n_kmin * est_union) // 1000
         AS est_intersection
FROM jac, ea, eb, eu
"""


def q_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann.knn_label_eval on embeddings: queries = vec_id % 10 == 0,
    ground truth = label, cut-offs k in (1, 5, 10).  One row per k with
    integer recall/precision permille; the oracle replays the double
    cosine ranking and the rollups."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_label_eval(emb, query_mod=_QMOD, ks=_KS)


def _oracle_knn() -> str:
    m_cols = ",\n         ".join(
        f"SUM(CASE WHEN rnk <= {kk} AND clabel = qlabel THEN 1 ELSE 0 END)"
        f" AS m{kk}"
        for kk in _KS
    )
    t_cols = ",\n        ".join(
        f"CAST(SUM(CASE WHEN m{kk} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS h{kk},\n        CAST(SUM(m{kk}) AS BIGINT) AS t{kk}"
        for kk in _KS
    )
    arms = "\n  UNION ALL\n".join(
        f"  SELECT CAST({kk} AS BIGINT) AS k, n_queries, h{kk} AS n_hits,"
        f" (1000 * h{kk}) // n_queries AS recall_permille,"
        f" t{kk} AS n_matches,"
        f" (1000 * t{kk}) // (n_queries * {kk}) AS precision_permille"
        f" FROM t"
        for kk in _KS
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
  FROM embeddings WHERE vec_id % {_QMOD} = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS clabel
  FROM embeddings WHERE vec_id % {_QMOD} <> 0
),
s AS (
  SELECT query_id, qlabel, neighbor_id, clabel,
         list_cosine_similarity(qv, cv) AS sim
  FROM c CROSS JOIN q
),
r AS (
  SELECT query_id, qlabel, clabel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM s
),
m AS (
  SELECT query_id,
         {m_cols}
  FROM r WHERE rnk <= {max(_KS)} GROUP BY query_id
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        {t_cols}
  FROM m
)
SELECT * FROM (
{arms}
) ORDER BY k
"""


ORACLE_KNN = _oracle_knn()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kmv_overlap": q_kmv_overlap,
        "knn_recall": q_knn_recall,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kmv_overlap": ORACLE_KMV_OVERLAP,
        "knn_recall": ORACLE_KNN,
    }
