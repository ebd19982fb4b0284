"""Round-3 queries, part 43: LCP array by distributed binary descent,
BWT run-count compressibility — both over the suffix-array flagship's
token stream, both brute-verified by DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = F.col("doc_id")
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        (doc + 1).alias("pos"),
        F.concat(F.lit("w"), ((doc * doc) % 37).cast("string"))
        .alias("token"),
    )


_STREAM_SQL = """
  SELECT doc_id + 1 AS pos,
         'w' || CAST((doc_id * doc_id) % 37 AS VARCHAR) AS tok
  FROM documents
"""


def q_lcp_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.sa.lcp_array: Spark derives every adjacent-suffix LCP
    from the prefix-doubling rank tables alone (binary descent, two
    equi-joins per level); the oracle recomputes each LCP by direct
    token comparison over the materialized suffixes."""
    from .textops.sa import lcp_array

    toks = _stream(spark, sf_dir)
    return lcp_array(toks, n=toks.count()).orderBy("sa_rank")


ORACLE_LCP_ARRAY = f"""
WITH t AS ({_STREAM_SQL}),
arr AS (SELECT list(tok ORDER BY pos) AS tk, COUNT(*) AS n FROM t),
s AS (SELECT pos, array_to_string(tk[pos:], ' ') AS suf FROM t, arr),
r AS (
  SELECT pos, row_number() OVER (ORDER BY suf, pos) AS sa_rank FROM s
),
adj AS (
  SELECT a.sa_rank AS sa_rank, a.pos AS pos, b.pos AS next_pos
  FROM r a JOIN r b ON b.sa_rank = a.sa_rank + 1
),
c AS (
  SELECT sa_rank, pos, next_pos,
         least(n - pos + 1, n - next_pos + 1) AS lim,
         list_position(
           [tk[pos + i - 1] = tk[next_pos + i - 1]
            for i in range(1, least(n - pos + 1, n - next_pos + 1) + 1)],
           false) AS mm
  FROM adj, arr
)
SELECT CAST(sa_rank AS BIGINT) AS sa_rank, pos, next_pos,
       CAST(CASE WHEN mm = 0 THEN lim ELSE mm - 1 END AS BIGINT) AS lcp
FROM c ORDER BY sa_rank
"""


def q_bwt_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.sa.bwt_runs: cyclic BWT run count as a repetitiveness
    measure; oracle rebuilds the BWT from the brute suffix sort."""
    from .textops.sa import bwt_runs

    toks = _stream(spark, sf_dir)
    return bwt_runs(toks, n=toks.count())


ORACLE_BWT_RUNS = f"""
WITH t AS ({_STREAM_SQL}),
arr AS (SELECT list(tok ORDER BY pos) AS tk, COUNT(*) AS n FROM t),
s AS (SELECT pos, array_to_string(tk[pos:], ' ') AS suf FROM t, arr),
r AS (
  SELECT pos, row_number() OVER (ORDER BY suf, pos) AS sa_rank FROM s
),
b AS (
  SELECT sa_rank,
         tk[CASE WHEN pos = 1 THEN n ELSE pos - 1 END] AS bwt
  FROM r, arr
),
eq AS (
  SELECT COUNT(*) AS n_eq
  FROM b x JOIN b y ON y.sa_rank = x.sa_rank + 1 AND y.bwt = x.bwt
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(n - n_eq AS BIGINT) AS n_runs,
       CAST((1000 * (n - n_eq)) // n AS BIGINT) AS runs_permille
FROM arr, eq
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lcp_array": q_lcp_array,
        "bwt_runs": q_bwt_runs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lcp_array": ORACLE_LCP_ARRAY,
        "bwt_runs": ORACLE_BWT_RUNS,
    }
