"""Round-3 queries, part 36: Luhn-verified card detection, Unicode
hygiene audit, AI-generation / C2PA provenance sniff.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# luhn_scrub — checksum-verified payment-card PII
# --------------------------------------------------------------------------

def q_luhn_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.curate.luhn_cc_audit over a Luhn-valid Visa, an
    off-by-one invalid twin, a 23-digit serial (no 13-19 candidate at
    all under the lookaround bounds), a digit-free doc, and a 15-digit
    Luhn-valid Amex."""
    from .textops.curate import luhn_cc_audit

    doc = F.col("doc_id")
    m = doc % 5
    text = (
        F.when(m == 0, F.lit("pay 4111111111111111 now"))
        .when(m == 1, F.lit("ref 4111111111111112 code"))
        .when(m == 2, F.lit("serial 12345678901234567890123 x"))
        .when(m == 3, F.lit("no digits here"))
        .otherwise(F.lit("amex 378282246310005 ok"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return luhn_cc_audit(d).orderBy("doc_id")


ORACLE_LUHN = """
SELECT doc_id,
       CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 4 THEN 1
            ELSE 0 END AS BIGINT) AS n_candidates,
       CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 4 THEN 1 ELSE 0 END
            AS BIGINT) AS n_luhn_valid,
       CASE doc_id % 5 WHEN 0 THEN '1111' WHEN 4 THEN '0005' END
         AS first_valid_last4
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# unicode_hygiene — invisible/bidi/combining codepoint audit
# --------------------------------------------------------------------------

def q_unicode_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.curate.unicode_hygiene over zero-width (ZWSP+BOM), bidi
    override/isolate, soft-hyphen, and combining-mark fixtures — counts
    plus the scrubbed text (combining marks deliberately NOT removed)."""
    from .textops.curate import unicode_hygiene

    doc = F.col("doc_id")
    m = doc % 4
    text = (
        F.when(m == 0, F.lit("ab​cd﻿e"))
        .when(m == 1, F.lit("x‮evil⁦y"))
        .when(m == 2, F.lit("hy­phen"))
        .otherwise(F.lit("cafe\u0301x"))  # combining acute, NOT precomposed
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return unicode_hygiene(d).orderBy("doc_id")


ORACLE_UNICODE = """
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 2 ELSE 0 END AS BIGINT)
         AS n_zero_width,
       CAST(CASE doc_id % 4 WHEN 1 THEN 2 ELSE 0 END AS BIGINT) AS n_bidi,
       CAST(CASE doc_id % 4 WHEN 2 THEN 1 ELSE 0 END AS BIGINT)
         AS n_soft_hyphen,
       CAST(CASE doc_id % 4 WHEN 3 THEN 1 ELSE 0 END AS BIGINT)
         AS n_combining,
       CASE doc_id % 4
         WHEN 0 THEN 'abcde'
         WHEN 1 THEN 'xevily'
         WHEN 2 THEN 'hyphen'
         ELSE 'cafe' || chr(769) || 'x' END AS scrubbed,
       CAST(CASE doc_id % 4 WHEN 0 THEN 7 WHEN 1 THEN 8 WHEN 2 THEN 7
            ELSE 6 END AS BIGINT) AS len_raw,
       CAST(CASE doc_id % 4 WHEN 0 THEN 5 WHEN 1 THEN 6 WHEN 2 THEN 6
            ELSE 6 END AS BIGINT) AS len_scrubbed
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# ai_provenance — C2PA manifests + generator watermarks in image bytes
# --------------------------------------------------------------------------

def q_ai_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.ai_provenance_sniff over five synthesized payloads: a
    JPEG carrying an APP11 JUMBF c2pa manifest, a PNG with a Stable
    Diffusion parameters text block, a JPEG with a Midjourney software
    tag, a plain JPEG, and a PNG with a caBX chunk."""
    from .images import ai_provenance_sniff

    doc = F.col("doc_id")
    m = doc % 5
    png_magic = "PNG\r\n\n"
    payload = (
        F.when(m == 0, F.lit("ÿØxxÿë..jumb..c2pa.."))
        .when(m == 1, F.lit(png_magic + "tEXtparameters Stable Diffusion"))
        .when(m == 2, F.lit("ÿØSoftware Midjourney"))
        .when(m == 3, F.lit("ÿØplain"))
        .otherwise(F.lit(png_magic + "caBX...."))
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.encode(payload, "ISO-8859-1").alias("bytes"),
    )
    out = ai_provenance_sniff(d)
    return out.select("doc_id", "has_c2pa", "gen_tool", "ai_flagged") \
        .orderBy("doc_id")


ORACLE_AI_PROVENANCE = """
SELECT doc_id,
       doc_id % 5 IN (0, 4) AS has_c2pa,
       CASE doc_id % 5 WHEN 1 THEN 'stable-diffusion'
            WHEN 2 THEN 'midjourney' END AS gen_tool,
       doc_id % 5 IN (1, 2) AS ai_flagged
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "luhn_scrub": q_luhn_scrub,
        "unicode_hygiene": q_unicode_hygiene,
        "ai_provenance": q_ai_provenance,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "luhn_scrub": ORACLE_LUHN,
        "unicode_hygiene": ORACLE_UNICODE,
        "ai_provenance": ORACLE_AI_PROVENANCE,
    }
