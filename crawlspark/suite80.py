"""Round-3 queries, part 30: chunked-framing validation, declared
content-encoding audit, Retry-After both-forms parsing, favicon
operator clustering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# chunked_framing
# --------------------------------------------------------------------------

_CHUNK_OK = (b"5\r\nhello\r\n3;ext=1\r\nabc\r\n0\r\n\r\n").hex()
_CHUNK_CUT = (b"5\r\nhello\r\nA\r\nabc").hex()
_CHUNK_BAD = (b"zz\r\nwhat\r\n").hex()


def q_chunked_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.chunked_framing_check over a complete 2-chunk stream
    (with a chunk extension), a mid-chunk cut, and a non-hex size
    line."""
    from .fetch import chunked_framing_check

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit(_CHUNK_OK))
        .when(m == 1, F.lit(_CHUNK_CUT))
        .otherwise(F.lit(_CHUNK_BAD))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return chunked_framing_check(docs).select(
        "doc_id", "chunked_n_chunks", "chunked_payload_bytes",
        "chunked_complete", "chunked_malformed",
    ).orderBy("doc_id")


ORACLE_CHUNKED = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END
            AS BIGINT) AS chunked_n_chunks,
       CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 5 ELSE 0 END
            AS BIGINT) AS chunked_payload_bytes,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1 ELSE 0 END AS INTEGER)
         AS chunked_complete,
       CAST(CASE doc_id % 3 WHEN 2 THEN 1 ELSE 0 END AS INTEGER)
         AS chunked_malformed
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# encoding_mismatch
# --------------------------------------------------------------------------

def q_encoding_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.encoding_mismatch_audit: true gzip, declared-gzip-but-
    identity, identity-hiding-zstd, and a brotli declaration
    (unverifiable)."""
    from .fetch import encoding_mismatch_audit

    doc = F.col("doc_id")
    m = doc % 4
    enc = (
        F.when(m == 0, F.lit("gzip"))
        .when(m == 1, F.lit("gzip"))
        .when(m == 2, F.lit(None).cast("string"))
        .otherwise(F.lit("br"))
    )
    payload = (
        F.when(m == 0, F.lit("1F8B08000000"))
        .when(m == 1, F.lit("3C68746D6C3E"))
        .when(m == 2, F.lit("28B52FFD2400"))
        .otherwise(F.lit("8B028030"))
    )
    resp = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), enc.alias("content_encoding"),
        F.unhex(payload).alias("bytes"))
    return encoding_mismatch_audit(resp).select(
        "doc_id", "content_encoding", "sniffed_encoding",
        "encoding_verdict",
    ).orderBy("doc_id")


ORACLE_ENCODING = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'gzip' WHEN 1 THEN 'gzip'
            WHEN 3 THEN 'br' END AS content_encoding,
       CASE doc_id % 4 WHEN 0 THEN 'gzip' WHEN 2 THEN 'zstd'
            ELSE 'identity' END AS sniffed_encoding,
       CASE doc_id % 4 WHEN 0 THEN 'match' WHEN 1 THEN 'mismatch'
            WHEN 2 THEN 'mismatch' ELSE 'unverifiable' END
         AS encoding_verdict
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# retry_after
# --------------------------------------------------------------------------

_NOW = 1_760_000_000  # 2025-10-09T06:13:20Z; future date below is 2026


def q_retry_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.retry_after_parse over delta-seconds, a future IMF
    fixdate, a past date (clamps to 0), and garbage."""
    from .fetch import retry_after_parse

    doc = F.col("doc_id")
    m = doc % 4
    hdr = (
        F.when(m == 0, F.lit("120"))
        .when(m == 1, F.lit("Wed, 21 Oct 2026 07:28:00 GMT"))
        .when(m == 2, F.lit("Wed, 01 Jan 2020 00:00:00 GMT"))
        .otherwise(F.lit("soon"))
    )
    resp = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), hdr.alias("retry_after"))
    return retry_after_parse(resp, now_ts=_NOW).select(
        "doc_id", "retry_after", "retry_after_s", "retry_after_form",
    ).orderBy("doc_id")


ORACLE_RETRY_AFTER = f"""
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN '120'
            WHEN 1 THEN 'Wed, 21 Oct 2026 07:28:00 GMT'
            WHEN 2 THEN 'Wed, 01 Jan 2020 00:00:00 GMT'
            ELSE 'soon' END AS retry_after,
       CAST(CASE doc_id % 4 WHEN 0 THEN 120
            WHEN 1 THEN {1_792_567_680 - _NOW}
            WHEN 2 THEN 0 END AS BIGINT) AS retry_after_s,
       CASE doc_id % 4 WHEN 0 THEN 'seconds' WHEN 3 THEN 'invalid'
            ELSE 'date' END AS retry_after_form
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# favicon_clusters
# --------------------------------------------------------------------------

def q_favicon_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-favicon operator clustering: hosts serving the same
    favicon hash are one operator (parking pages, site networks);
    per favicon report the cluster size — the infra twin of the
    ads.txt publisher clusters."""
    doc = F.col("doc_id")
    hosts = _docs(spark, sf_dir).select(
        F.concat(F.lit("f"), doc.cast("string"), F.lit(".com"))
        .alias("host"),
        F.when(doc % 5 == 0, F.lit(777777))
        .otherwise(doc * 31 + 7).cast("long").alias("favicon_hash"),
    )
    return (
        hosts.groupBy("favicon_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hosts"),
             F.min("host").alias("sample_host"))
        .withColumn("shared", F.col("n_hosts") > 1)
        .orderBy("favicon_hash")
    )


ORACLE_FAVICON = """
WITH h AS (
  SELECT 'f' || doc_id || '.com' AS host,
         CAST(CASE WHEN doc_id % 5 = 0 THEN 777777
              ELSE doc_id * 31 + 7 END AS BIGINT) AS favicon_hash
  FROM documents
)
SELECT favicon_hash, CAST(COUNT(*) AS BIGINT) AS n_hosts,
       MIN(host) AS sample_host,
       COUNT(*) > 1 AS shared
FROM h
GROUP BY favicon_hash
ORDER BY favicon_hash
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "chunked_framing": q_chunked_framing,
        "encoding_mismatch": q_encoding_mismatch,
        "retry_after": q_retry_after,
        "favicon_clusters": q_favicon_clusters,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "chunked_framing": ORACLE_CHUNKED,
        "encoding_mismatch": ORACLE_ENCODING,
        "retry_after": ORACLE_RETRY_AFTER,
        "favicon_clusters": ORACLE_FAVICON,
    }
