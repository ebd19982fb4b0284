"""Round-3 queries, part 52: SI quantity extraction, scholarly-id
detection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# quantities — unit normalization into base milli-units
# --------------------------------------------------------------------------

def q_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.quantity_mentions over length/mass/time fixtures plus a
    near-miss ('123 here' must not read 'h' as hours)."""
    from .extract import quantity_mentions

    doc = F.col("doc_id")
    m = doc % 4
    text = (
        F.when(m == 0, F.lit("hike of 12 km then 300 m"))
        .when(m == 1, F.lit("dose 250mg twice"))
        .when(m == 2, F.lit("wait 90 min or 2 h"))
        .otherwise(F.lit("no units 123 here"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("t"))
    out = d.select(
        "doc_id",
        F.posexplode_outer(quantity_mentions(F.col("t")))
        .alias("ord", "q"),
    )
    return out.select(
        "doc_id", F.col("ord").cast("long").alias("ord"),
        F.col("q.value").alias("value"), F.col("q.unit").alias("unit"),
        F.col("q.dim").alias("dim"),
        F.col("q.base_milli").alias("base_milli"),
    ).orderBy("doc_id", "ord")


ORACLE_QUANTITIES = """
WITH e(k, ord, value, unit, dim, base_milli) AS (
  VALUES
   (0, 0, 12, 'km', 'length', 12000000),
   (0, 1, 300, 'm', 'length', 300000),
   (1, 0, 250, 'mg', 'mass', 250),
   (2, 0, 90, 'min', 'time', 5400000),
   (2, 1, 2, 'h', 'time', 7200000),
   (3, NULL, NULL, NULL, NULL, NULL)
)
SELECT d.doc_id, CAST(e.ord AS BIGINT) AS ord,
       CAST(e.value AS BIGINT) AS value, e.unit, e.dim,
       CAST(e.base_milli AS BIGINT) AS base_milli
FROM documents d JOIN e ON d.doc_id % 4 = e.k
ORDER BY d.doc_id, ord
"""


# --------------------------------------------------------------------------
# scholar_ids — DOI + arXiv routing signals
# --------------------------------------------------------------------------

def q_scholar_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.scholarly_ids over a modern DOI+arXiv pair, an old-form
    arXiv id, and plain text."""
    from .extract import scholarly_ids

    doc = F.col("doc_id")
    m = doc % 3
    text = (
        F.when(m == 0, F.lit(
            "see doi:10.1145/3297858.3304076 and arXiv:2403.12345v2"))
        .when(m == 1, F.lit("old-style arXiv:math.GT/0309136 only"))
        .otherwise(F.lit("plain text"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("t"))
    out = d.select("doc_id", scholarly_ids(F.col("t")).alias("s"))
    return out.select(
        "doc_id", "s.n_dois", "s.first_doi", "s.n_arxiv", "s.first_arxiv"
    ).orderBy("doc_id")


ORACLE_SCHOLAR_IDS = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1 ELSE 0 END AS INTEGER)
         AS n_dois,
       CASE doc_id % 3 WHEN 0 THEN '10.1145/3297858.3304076' END
         AS first_doi,
       CAST(CASE doc_id % 3 WHEN 2 THEN 0 ELSE 1 END AS INTEGER)
         AS n_arxiv,
       CASE doc_id % 3 WHEN 0 THEN '2403.12345v2'
            WHEN 1 THEN 'math.GT/0309136' END AS first_arxiv
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "quantities": q_quantities,
        "scholar_ids": q_scholar_ids,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "quantities": ORACLE_QUANTITIES,
        "scholar_ids": ORACLE_SCHOLAR_IDS,
    }
