"""Round-3 queries, part 45: Content-Disposition parse, CSP audit,
line-break dehyphenation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# content_disposition — RFC 6266 (+5987 ext-value) parse
# --------------------------------------------------------------------------

def q_content_disposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.content_disposition_info over quoted, RFC 5987 ext-value
    (UTF-8 percent-decoded), bare-token, bare-inline and empty
    headers."""
    from .fetch import content_disposition_info

    doc = F.col("doc_id")
    m = doc % 5
    hdr = (
        F.when(m == 0, F.lit('attachment; filename="report q1.pdf"'))
        .when(m == 1, F.lit(
            "attachment; filename*=UTF-8''na%C3%AFve%20plan.pdf"))
        .when(m == 2, F.lit("inline"))
        .when(m == 3, F.lit("attachment; filename=report.pdf"))
        .otherwise(F.lit(""))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("cd"))
    out = d.select("doc_id",
                   content_disposition_info(F.col("cd")).alias("c"))
    return out.select(
        "doc_id", "c.disp_type", "c.filename", "c.from_ext_value"
    ).orderBy("doc_id")


ORACLE_CONTENT_DISPOSITION = """
SELECT doc_id,
       CASE doc_id % 5 WHEN 2 THEN 'inline' WHEN 4 THEN NULL
            ELSE 'attachment' END AS disp_type,
       CASE doc_id % 5 WHEN 0 THEN 'report q1.pdf'
            WHEN 1 THEN 'naïve plan.pdf'
            WHEN 3 THEN 'report.pdf' END AS filename,
       doc_id % 5 = 1 AS from_ext_value
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# csp_audit — script-effective Content-Security-Policy flags
# --------------------------------------------------------------------------

def q_csp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.csp_audit: script-src present, default-src fallback with
    wildcard + unsafe-eval, non-script-relevant policy, and no CSP."""
    from .fetch import csp_audit

    doc = F.col("doc_id")
    m = doc % 4
    hdr = (
        F.when(m == 0, F.lit(
            "default-src 'self'; script-src 'self' 'unsafe-inline'"))
        .when(m == 1, F.lit("default-src * 'unsafe-eval'"))
        .when(m == 2, F.lit("img-src https:; frame-ancestors 'none'"))
        .otherwise(F.lit(""))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("csp"))
    out = d.select("doc_id", csp_audit(F.col("csp")).alias("c"))
    return out.select(
        "doc_id", "c.n_directives", "c.has_default_src",
        "c.unsafe_inline", "c.unsafe_eval", "c.wildcard_script",
    ).orderBy("doc_id")


ORACLE_CSP_AUDIT = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 2
            ELSE 0 END AS INTEGER) AS n_directives,
       doc_id % 4 IN (0, 1) AS has_default_src,
       doc_id % 4 = 0 AS unsafe_inline,
       doc_id % 4 = 1 AS unsafe_eval,
       doc_id % 4 = 1 AS wildcard_script
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# dehyphenate — PDF/OCR line-break hyphen repair
# --------------------------------------------------------------------------

def q_dehyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.curate.dehyphenate: lowercase rejoin fires, explicit
    dash before a capital is preserved, clean text untouched."""
    from .textops.curate import dehyphenate

    doc = F.col("doc_id")
    m = doc % 3
    text = (
        F.when(m == 0, F.lit("informa- \n tion flows"))
        .when(m == 1, F.lit("US-\nBased deal"))
        .otherwise(F.lit("no hyphen here"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return dehyphenate(d).orderBy("doc_id")


ORACLE_DEHYPHENATE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'information flows'
            WHEN 1 THEN 'US-' || chr(10) || 'Based deal'
            ELSE 'no hyphen here' END AS text,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1 ELSE 0 END AS BIGINT)
         AS n_rejoined
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "content_disposition": q_content_disposition,
        "csp_audit": q_csp_audit,
        "dehyphenate": q_dehyphenate,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "content_disposition": ORACLE_CONTENT_DISPOSITION,
        "csp_audit": ORACLE_CSP_AUDIT,
        "dehyphenate": ORACLE_DEHYPHENATE,
    }
