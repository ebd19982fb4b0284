"""Round-3 queries, part 39: WAT metadata records, image decode-bomb
admission gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# wat_records — CommonCrawl-style metadata envelopes
# --------------------------------------------------------------------------

def q_wat_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """warc.to_wat over synthesized pages (title + two anchors, one with
    a distracting class attribute); the oracle rebuilds the exact
    to_json envelope byte-for-byte."""
    from .warc import to_wat

    doc = F.col("doc_id")
    ds = doc.cast("string")
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://w.test/p"), ds).alias("url"),
        F.concat(
            F.lit("<html><head><title>Page "), ds,
            F.lit('</title></head><body><a href="/a'), ds,
            F.lit('">x</a><a class="z" href="/b">y</a></body></html>'),
        ).alias("body"),
    )
    return to_wat(d).orderBy("url")


ORACLE_WAT = """
SELECT 'https://w.test/p' || CAST(doc_id AS VARCHAR) AS url,
       'Page ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(2 AS BIGINT) AS n_links,
       '{"WARC-Target-URI":"https://w.test/p' || CAST(doc_id AS VARCHAR) ||
       '","Title":"Page ' || CAST(doc_id AS VARCHAR) ||
       '","Links":["/a' || CAST(doc_id AS VARCHAR) || '","/b"]}'
         AS wat_json
FROM documents
ORDER BY url
"""


# --------------------------------------------------------------------------
# decode_guard — decompression-bomb admission
# --------------------------------------------------------------------------

def q_decode_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.decode_admission over admit / 400-megapixel bomb /
    deflate-bomb expansion / unsniffed-dims / at-the-900x-edge cases."""
    from .images import decode_admission

    doc = F.col("doc_id")
    m = doc % 5
    w = (
        F.when(m == 0, 800).when(m == 1, 20000).when(m == 2, 5000)
        .when(m == 4, 6000).cast("int")
    )
    h = (
        F.when(m == 0, 600).when(m == 1, 20000).when(m == 2, 5000)
        .when(m == 4, 4000).cast("int")
    )
    nb = (
        F.when(m == 0, 100000).when(m == 1, 500000).when(m == 2, 200)
        .when(m == 3, 12345).otherwise(80000).cast("long")
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), w.alias("w"), h.alias("h"),
        nb.alias("n_bytes"),
    )
    out = decode_admission(d)
    return out.select(
        "doc_id", "decoded_bytes_est", "too_large", "suspicious_ratio",
        "admission",
    ).orderBy("doc_id")


ORACLE_DECODE_GUARD = """
SELECT doc_id,
       CAST(CASE doc_id % 5 WHEN 0 THEN 1440000 WHEN 1 THEN 1200000000
            WHEN 2 THEN 75000000 WHEN 4 THEN 72000000 END AS BIGINT)
         AS decoded_bytes_est,
       doc_id % 5 = 1 AS too_large,
       doc_id % 5 IN (1, 2) AS suspicious_ratio,
       CASE doc_id % 5 WHEN 0 THEN 'admit' WHEN 1 THEN 'reject_too_large'
            WHEN 2 THEN 'reject_expansion' WHEN 3 THEN 'unsniffed'
            ELSE 'admit' END AS admission
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wat_records": q_wat_records,
        "decode_guard": q_decode_guard,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "wat_records": ORACLE_WAT,
        "decode_guard": ORACLE_DECODE_GUARD,
    }
