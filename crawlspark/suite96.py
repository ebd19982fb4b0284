"""Round-3 queries, part 46: content-kind routing and eval-canary
contamination scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# content_kinds — chat / math / code routing signals
# --------------------------------------------------------------------------

def q_content_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.curate.content_kind_signals over a chat transcript,
    LaTeX math, a fenced code block, and plain prose."""
    from .textops.curate import content_kind_signals

    doc = F.col("doc_id")
    m = doc % 4
    text = (
        F.when(m == 0, F.lit("Human: hi\nAssistant: hello\nHuman: thanks"))
        .when(m == 1, F.lit("We get \\frac{a}{b} and $$x$$ here"))
        .when(m == 2, F.lit("```\ndef f():\n    return 1\n```"))
        .otherwise(F.lit("just words here"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return content_kind_signals(d).orderBy("doc_id")


ORACLE_CONTENT_KINDS = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 3 ELSE 0 END AS BIGINT) AS n_turns,
       CAST(CASE doc_id % 4 WHEN 1 THEN 3 ELSE 0 END AS BIGINT) AS n_math,
       CAST(CASE doc_id % 4 WHEN 2 THEN 4 ELSE 0 END AS BIGINT) AS n_code,
       CASE doc_id % 4 WHEN 0 THEN 'chat' WHEN 1 THEN 'math'
            WHEN 2 THEN 'code' ELSE 'prose' END AS kind
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# canary_scan — benchmark canary GUIDs
# --------------------------------------------------------------------------

_CANARIES = ["CANARY-GUID-aaaa-1111", "CANARY-GUID-bbbb-2222"]


def q_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.curate.canary_scan: one hit of the first canary, two of
    the second, one of each (first wins the severity order), none."""
    from .textops.curate import canary_scan

    doc = F.col("doc_id")
    m = doc % 4
    text = (
        F.when(m == 0, F.lit(f"body {_CANARIES[0]} tail"))
        .when(m == 1, F.lit(f"x {_CANARIES[1]} y {_CANARIES[1]} z"))
        .when(m == 2, F.lit(f"{_CANARIES[0]} and {_CANARIES[1]}"))
        .otherwise(F.lit("clean document"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return canary_scan(d, _CANARIES).orderBy("doc_id")


ORACLE_CANARY_SCAN = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2
            ELSE 0 END AS BIGINT) AS n_canary_hits,
       CASE doc_id % 4 WHEN 0 THEN 'CANARY-GUID-aaaa-1111'
            WHEN 1 THEN 'CANARY-GUID-bbbb-2222'
            WHEN 2 THEN 'CANARY-GUID-aaaa-1111' END AS first_canary
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "content_kinds": q_content_kinds,
        "canary_scan": q_canary_scan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "content_kinds": ORACLE_CONTENT_KINDS,
        "canary_scan": ORACLE_CANARY_SCAN,
    }
