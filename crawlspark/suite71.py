"""Round-3 queries, part 21: canonical-chain resolution, PDF and ZIP
container sniffing, robots.txt lint taxonomy.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# canonical_chain
# --------------------------------------------------------------------------

def q_canonical_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.canonical_chain_resolve over planted shapes: self-
    canonical, direct hop, 2-hop chain, 2-cycle loop, and a pointer
    at a page with no canonical row (terminal after one hop)."""
    from .linkgraph import canonical_chain_resolve

    doc = F.col("doc_id")
    grp = F.expr("doc_id div 5").cast("string")
    m = doc % 5
    u = F.concat(F.lit("http://c/g"), grp, F.lit("/p"),
                 m.cast("string"))
    # m=0: self.  m=1: -> p0.  m=2: -> p1 (-> p0, chain).
    # m=3: -> p4; m=4: -> p3 (loop).
    c = (
        F.when(m == 0, u)
        .when(m == 1, F.concat(F.lit("http://c/g"), grp, F.lit("/p0")))
        .when(m == 2, F.concat(F.lit("http://c/g"), grp, F.lit("/p1")))
        .when(m == 3, F.concat(F.lit("http://c/g"), grp, F.lit("/p4")))
        .otherwise(F.concat(F.lit("http://c/g"), grp, F.lit("/p3")))
    )
    pages = _docs(spark, sf_dir).select(u.alias("url"),
                                        c.alias("canonical"))
    return canonical_chain_resolve(pages).orderBy("url")


ORACLE_CANONICAL_CHAIN = """
WITH p AS (
  SELECT doc_id, doc_id // 5 AS g, doc_id % 5 AS m,
         'http://c/g' || (doc_id // 5) || '/p' || (doc_id % 5) AS url
  FROM documents
)
SELECT url,
       CASE m
         WHEN 0 THEN url
         WHEN 1 THEN 'http://c/g' || g || '/p0'
         WHEN 2 THEN 'http://c/g' || g || '/p0'
         WHEN 3 THEN 'http://c/g' || g || '/p3'
         ELSE 'http://c/g' || g || '/p4'
       END AS final_url,
       CAST(CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2
            WHEN 3 THEN 2 ELSE 2 END AS BIGINT) AS hops,
       CASE m WHEN 0 THEN 'self' WHEN 1 THEN 'direct' WHEN 2 THEN 'chain'
            ELSE 'loop' END AS status
FROM p
ORDER BY url
"""


# --------------------------------------------------------------------------
# pdf_sniff
# --------------------------------------------------------------------------

_PDF_OK = ("%PDF-1.7\n1 0 obj\n<< /Linearized 1 >>\nendobj\n"
           "trailer\n<< /Size 2 >>\nstartxref\n9\n%%EOF\n").encode().hex()
_PDF_TRUNC = "%PDF-1.4\n1 0 obj\n<< >>\nstream\nabc".encode().hex()
_PDF_ENC = ("%PDF-1.6\ntrailer\n<< /Encrypt 5 0 R >>\n%%EOF"
            ).encode().hex()


def q_pdf_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.pdf_sniff over a linearized 1.7, a truncated 1.4 (no
    %%EOF), an encrypted 1.6, and a non-PDF payload."""
    from .media import pdf_sniff

    doc = F.col("doc_id")
    m = doc % 4
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_PDF_OK))
        .when(m == 2, F.lit(_PDF_TRUNC))
        .otherwise(F.lit(_PDF_ENC))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return pdf_sniff(docs).select(
        "doc_id", "pdf_version", "pdf_has_eof", "pdf_linearized",
        "pdf_encrypted",
    ).orderBy("doc_id")


ORACLE_PDF = """
SELECT doc_id,
       CASE doc_id % 4 WHEN 1 THEN '1.7' WHEN 2 THEN '1.4'
            WHEN 3 THEN '1.6' END AS pdf_version,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 2 THEN 0
            ELSE 1 END AS INTEGER) AS pdf_has_eof,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 1 THEN 1
            ELSE 0 END AS INTEGER) AS pdf_linearized,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 3 THEN 1
            ELSE 0 END AS INTEGER) AS pdf_encrypted
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# zip_eocd
# --------------------------------------------------------------------------

def _zip_with_eocd(n: int, comment: bytes) -> str:
    eocd = (b"PK\x05\x06" + b"\x00" * 4
            + struct.pack("<HHIIH", n, n, 100, 200, len(comment))
            + comment)
    return (b"PK\x03\x04" + b"\x00" * 26 + eocd).hex()


_ZIP_3 = _zip_with_eocd(3, b"")
_ZIP_COMMENT = _zip_with_eocd(7, b"built by ci")
_ZIP_NO_EOCD = (b"PK\x03\x04" + b"\x00" * 40).hex()


def q_zip_eocd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.zip_eocd_sniff over a 3-entry archive, one with a
    trailing comment shifting the EOCD, a local-header-only fragment
    (no EOCD), and a non-ZIP payload."""
    from .media import zip_eocd_sniff

    doc = F.col("doc_id")
    m = doc % 4
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_ZIP_3))
        .when(m == 2, F.lit(_ZIP_COMMENT))
        .otherwise(F.lit(_ZIP_NO_EOCD))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return zip_eocd_sniff(docs).select(
        "doc_id", "zip_n_entries", "zip_cd_size", "zip_cd_offset",
        "zip_comment_len", "zip_eocd_found",
    ).orderBy("doc_id")


ORACLE_ZIP = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 1 THEN 3 WHEN 2 THEN 7 END AS BIGINT)
         AS zip_n_entries,
       CAST(CASE WHEN doc_id % 4 IN (1, 2) THEN 100 END AS BIGINT)
         AS zip_cd_size,
       CAST(CASE WHEN doc_id % 4 IN (1, 2) THEN 200 END AS BIGINT)
         AS zip_cd_offset,
       CAST(CASE doc_id % 4 WHEN 1 THEN 0 WHEN 2 THEN 11 END AS BIGINT)
         AS zip_comment_len,
       CAST(CASE doc_id % 4 WHEN 0 THEN NULL WHEN 3 THEN 0
            ELSE 1 END AS INTEGER) AS zip_eocd_found
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# robots_lint
# --------------------------------------------------------------------------

def q_robots_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.robots_lint over clean, typo'd (Dissallow), before-group
    rules, BOM'd, and CR-only robots bodies."""
    from .robots import robots_lint

    doc = F.col("doc_id")
    k = doc % 5
    body = (
        F.when(k == 0, F.lit("User-agent: *\nDisallow: /a\n"))
        .when(k == 1, F.lit("User-agent: *\nDissallow: /a\n"
                            "Unknown-thing: x\n"))
        .when(k == 2, F.lit("Disallow: /early\nUser-agent: *\n"
                            "Disallow: /ok\n"))
        .when(k == 3, F.lit("﻿User-agent: *\nDisallow: /b\n"))
        .otherwise(F.lit("User-agent: *\rDisallow: /c\r"))
    )
    robots = _docs(spark, sf_dir).filter(doc < 10).select(
        F.concat(F.lit("l"), doc.cast("string"), F.lit(".com"))
        .alias("host"),
        body.alias("body"),
    )
    return robots_lint(robots).orderBy("host")


ORACLE_ROBOTS_LINT = """
WITH r AS (
  SELECT doc_id, doc_id % 5 AS k, 'l' || doc_id || '.com' AS host
  FROM documents WHERE doc_id < 10
)
SELECT host,
       CAST(CASE k WHEN 0 THEN 3 WHEN 1 THEN 4 WHEN 2 THEN 4
            WHEN 3 THEN 3 ELSE 3 END AS BIGINT) AS n_lines,
       CAST(CASE k WHEN 1 THEN 3 WHEN 2 THEN 3 ELSE 2 END AS BIGINT)
         AS n_directives,
       CAST(CASE k WHEN 1 THEN 2 ELSE 0 END AS BIGINT) AS n_unknown,
       CAST(CASE k WHEN 2 THEN 1 ELSE 0 END AS BIGINT)
         AS n_rules_before_group,
       k = 3 AS has_bom,
       k = 4 AS cr_only_eol
FROM r
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "canonical_chain": q_canonical_chain,
        "pdf_sniff": q_pdf_sniff,
        "zip_eocd": q_zip_eocd,
        "robots_lint": q_robots_lint,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "canonical_chain": ORACLE_CANONICAL_CHAIN,
        "pdf_sniff": ORACLE_PDF,
        "zip_eocd": ORACLE_ZIP,
        "robots_lint": ORACLE_ROBOTS_LINT,
    }
