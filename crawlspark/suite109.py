"""Round-3 queries, part 59: schema.org type census."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_schema_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.schema_types across both syntaxes (JSON-LD @type +
    microdata itemtype), deduped per page, rolled up corpus-wide."""
    from .extract import schema_types

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit(
            '<script type="application/ld+json">'
            '{"@type":"Product","name":"x"}</script>'
            '<div itemscope itemtype="https://schema.org/Product">'
            "</div>"))  # same type in both syntaxes -> ONE census vote
        .when(m == 1, F.lit(
            '<script type="application/ld+json">'
            '{"@type":"Article"}</script>'))
        .when(m == 2, F.lit(
            '<div itemscope itemtype="http://schema.org/Recipe"></div>'
            '<script type="application/ld+json">'
            '{"@type":"Rating"}</script>'))
        .otherwise(F.lit("<p>untyped</p>"))
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), body.alias("b"))
    types = d.select(
        "doc_id", F.explode(schema_types(F.col("b"))).alias("stype"))
    return types.groupBy("stype").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    ).orderBy("stype")


ORACLE_SCHEMA_CENSUS = """
WITH t AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'Product' WHEN 1 THEN 'Article'
              WHEN 2 THEN 'Rating' END AS t1,
         CASE doc_id % 4 WHEN 2 THEN 'Recipe' END AS t2
  FROM documents
),
u AS (
  SELECT doc_id, t1 AS stype FROM t WHERE t1 IS NOT NULL
  UNION ALL
  SELECT doc_id, t2 FROM t WHERE t2 IS NOT NULL
)
SELECT stype, CAST(COUNT(*) AS BIGINT) AS n_pages
FROM u GROUP BY stype ORDER BY stype
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"schema_census": q_schema_census}


def oracle_sql() -> dict[str, str]:
    return {"schema_census": ORACLE_SCHEMA_CENSUS}
