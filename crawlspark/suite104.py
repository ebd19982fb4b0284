"""Round-3 queries, part 54: accessibility-surface audit."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_a11y_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.a11y_audit: a well-labeled form page, a landmark-only
    page, a positive-tabindex dark pattern, and bare markup."""
    from .extract import a11y_audit

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit(
            '<main><form><input id="q" aria-label="Search">'
            '<input type="hidden" name="t">'
            '<input name="raw"></form></main>'))
        .when(m == 1, F.lit(
            '<nav aria-label="main menu"><a href="/">home</a></nav>'
            '<footer>f</footer>'))
        .when(m == 2, F.lit(
            '<input name="a" tabindex="5"><input name="b" id="b">'))
        .otherwise(F.lit("<p>bare</p>"))
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), body.alias("body"))
    out = d.select("doc_id", a11y_audit(F.col("body")).alias("a"))
    return out.select(
        "doc_id", "a.n_aria", "a.n_landmarks", "a.n_inputs",
        "a.n_labeled_inputs", "a.n_positive_tabindex",
        "a.score_permille",
    ).orderBy("doc_id")


ORACLE_A11Y = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 ELSE 0 END
            AS INTEGER) AS n_aria,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END
            AS INTEGER) AS n_landmarks,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 2 THEN 2 ELSE 0 END
            AS INTEGER) AS n_inputs,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 2 THEN 1 ELSE 0 END
            AS INTEGER) AS n_labeled_inputs,
       CAST(CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS INTEGER)
         AS n_positive_tabindex,
       CAST(CASE doc_id % 4 WHEN 0 THEN 500 WHEN 1 THEN 1000
            WHEN 2 THEN 500 ELSE 0 END AS BIGINT) AS score_permille
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"a11y_audit": q_a11y_audit}


def oracle_sql() -> dict[str, str]:
    return {"a11y_audit": ORACLE_A11Y}
