"""Round-3 queries, part 38: distributed suffix array (prefix
doubling) verified against brute-force suffix sorting.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.sa.suffix_array over a 500-token stream (token i =
    'w'||(i^2 mod 37), heavy repetition so rounds actually refine):
    Spark builds the SA by log(n) prefix-doubling rounds of
    join + distinct + two-phase dense rank; the oracle materializes all
    500 suffix strings and sorts them outright — the O(n^2)
    ground-truth the distributed algorithm must reproduce."""
    from .textops.sa import suffix_array

    doc = F.col("doc_id")
    toks = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        (doc + 1).alias("pos"),
        F.concat(F.lit("w"), ((doc * doc) % 37).cast("string"))
        .alias("token"),
    )
    n = toks.count()
    return suffix_array(toks, n=n).orderBy("pos")


ORACLE_SUFFIX_ARRAY = """
WITH t AS (
  SELECT doc_id + 1 AS pos,
         'w' || CAST((doc_id * doc_id) % 37 AS VARCHAR) AS tok
  FROM documents
),
arr AS (SELECT list(tok ORDER BY pos) AS tk FROM t),
s AS (
  SELECT pos, array_to_string(tk[pos:], ' ') AS suf
  FROM t, arr
)
SELECT pos, CAST(row_number() OVER (ORDER BY suf, pos) AS BIGINT) AS sa_rank
FROM s ORDER BY pos
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"suffix_array": q_suffix_array}


def oracle_sql() -> dict[str, str]:
    return {"suffix_array": ORACLE_SUFFIX_ARRAY}
