"""Round-3 queries, part 53: publication-date mention extraction."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_date_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.date_mentions: ISO pair, long-form normalization,
    ambiguous NN/NN (both <= 12), unambiguous day-first slash form."""
    from .extract import date_mentions

    doc = F.col("doc_id")
    m = doc % 4
    text = (
        F.when(m == 0, F.lit("Posted 2026-03-15 and updated 2026-04-01"))
        .when(m == 1, F.lit("Published on March 5, 2026 by X"))
        .when(m == 2, F.lit("on 04/05/2026 we met"))
        .otherwise(F.lit("dated 25/12/2026 party"))
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), text.alias("t"))
    out = d.select("doc_id", date_mentions(F.col("t")).alias("dm"))
    return out.select(
        "doc_id", "dm.n_dates", "dm.first_iso", "dm.has_ambiguous_dmy"
    ).orderBy("doc_id")


ORACLE_DATE_MENTIONS = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 ELSE 1 END AS INTEGER)
         AS n_dates,
       CASE doc_id % 4 WHEN 0 THEN '2026-03-15'
            WHEN 1 THEN '2026-03-05' END AS first_iso,
       doc_id % 4 = 2 AS has_ambiguous_dmy
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"date_mentions": q_date_mentions}


def oracle_sql() -> dict[str, str]:
    return {"date_mentions": ORACLE_DATE_MENTIONS}
