"""Round-3 queries, part 47: AI-training-agent robots policy matrix,
CSV column-type inference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# ai_agents — per-host GPTBot/CCBot/Google-Extended/Bytespider matrix
# --------------------------------------------------------------------------

def q_ai_agents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.ai_agents_policy over 5 robots.txt shapes: open, GPTBot
    fully blocked, all-AI blanket '*' disallow with a CCBot exemption,
    Google-Extended blocked via a shared group header, and a file
    blocking an unrelated bot only."""
    from .robots import ai_agents_policy

    doc = F.col("doc_id")
    m = doc % 5
    body = (
        F.when(m == 0, F.lit("User-agent: *\nAllow: /"))
        .when(m == 1, F.lit("User-agent: GPTBot\nDisallow: /"))
        .when(m == 2, F.lit(
            "User-agent: *\nDisallow: /\n\n"
            "User-agent: CCBot\nAllow: /"))
        .when(m == 3, F.lit(
            "User-agent: Google-Extended\nUser-agent: Bytespider\n"
            "Disallow: /"))
        .otherwise(F.lit("User-agent: SomeOtherBot\nDisallow: /"))
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), doc.cast("string")).alias("host"),
        body.alias("body"),
    )
    return ai_agents_policy(
        d, bots=["GPTBot", "CCBot", "Google-Extended", "Bytespider"]
    ).orderBy("host")


ORACLE_AI_AGENTS = """
SELECT 'h' || CAST(doc_id AS VARCHAR) AS host,
       doc_id % 5 NOT IN (1, 2) AS gptbot_allowed,
       TRUE AS ccbot_allowed,
       doc_id % 5 NOT IN (2, 3) AS google_extended_allowed,
       doc_id % 5 NOT IN (2, 3) AS bytespider_allowed,
       CAST(CASE doc_id % 5 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
            WHEN 3 THEN 2 ELSE 0 END AS BIGINT) AS n_ai_blocked
FROM documents
ORDER BY host
"""


# --------------------------------------------------------------------------
# csv_types — per-column type inference
# --------------------------------------------------------------------------

def q_csv_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """steps.csv_type_sniff over a 4-column CSV whose columns are int /
    decimal / date / mixed-string, with one empty cell and one short
    row."""
    from .steps import csv_type_sniff

    doc = F.col("doc_id")
    csv = F.concat(
        F.lit("id,price,day,note\n"),
        doc.cast("string"), F.lit(",9.5,2026-01-02,alpha\n"),
        (doc + 1).cast("string"), F.lit(",,2026-02-03,beta7\n"),
        (doc + 2).cast("string"), F.lit(",12.25,2026-03-04"),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), csv.alias("body"))
    out = d.select(
        "doc_id",
        F.posexplode(csv_type_sniff(F.col("body"))).alias("col_idx", "c"),
    )
    return out.select(
        "doc_id", F.col("col_idx").cast("long").alias("col_idx"),
        "c.col_name", "c.n_values", "c.n_empty", "c.inferred",
    ).orderBy("doc_id", "col_idx")


ORACLE_CSV_TYPES = """
WITH cols(col_idx, col_name, n_values, n_empty, inferred) AS (
  VALUES
   (0, 'id',    3, 0, 'int'),
   (1, 'price', 2, 1, 'decimal'),
   (2, 'day',   3, 0, 'date'),
   (3, 'note',  2, 1, 'string')
)
SELECT d.doc_id, CAST(c.col_idx AS BIGINT) AS col_idx, c.col_name,
       CAST(c.n_values AS INTEGER) AS n_values,
       CAST(c.n_empty AS INTEGER) AS n_empty, c.inferred
FROM documents d CROSS JOIN cols c
ORDER BY d.doc_id, col_idx
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ai_agents": q_ai_agents,
        "csv_types": q_csv_types,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ai_agents": ORACLE_AI_AGENTS,
        "csv_types": ORACLE_CSV_TYPES,
    }
