"""Round-3 queries, part 44: exact ExactSubstr duplicated spans via
the suffix structure (sentinel-concatenated corpus -> SA -> LCP ->
witness intervals -> per-doc merge).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_sa_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.sa.exact_dup_spans at k=8 over 40 synthesized docs of 12
    tokens: every doc%4==0 doc carries the shared 8-token run p4..p11
    at indices 4-11, all other tokens are doc-unique — the exact
    expected span set (one merged [4,12) span per planted doc) follows
    from the construction, and the randomized pytest differential
    covers the general case."""
    from .textops.sa import exact_dup_spans

    doc = F.col("doc_id")
    tok = lambda i: F.when(  # noqa: E731
        (doc % 4 == 0) & F.lit(4 <= i <= 11), F.lit(f"p{i}")
    ).otherwise(
        F.concat(F.lit("u"), doc.cast("string"), F.lit(f"x{i}"))
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(doc < 40).select(
            doc.alias("doc_id"),
            F.concat_ws(" ", *[tok(i) for i in range(1, 13)]).alias("text"),
        )
    return exact_dup_spans(d, k=8).orderBy("doc_id", "span_start")


ORACLE_SA_DUP_SPANS = """
SELECT doc_id, CAST(4 AS BIGINT) AS span_start,
       CAST(12 AS BIGINT) AS span_end, CAST(8 AS BIGINT) AS span_len
FROM documents WHERE doc_id < 40 AND doc_id % 4 = 0
ORDER BY doc_id, span_start
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"sa_dup_spans": q_sa_dup_spans}


def oracle_sql() -> dict[str, str]:
    return {"sa_dup_spans": ORACLE_SA_DUP_SPANS}
