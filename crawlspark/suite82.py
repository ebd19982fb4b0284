"""Round-3 queries, part 32: price extraction, JSON-LD breadcrumbs,
form-function audit, DDS texture sniff.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# price_extract
# --------------------------------------------------------------------------

def q_price_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.price_extract over a product page ($1,299.99 + $49),
    a euro/ISO mixed page where € is modal, and a priceless
    article."""
    from .extract import price_extract

    doc = F.col("doc_id")
    m = doc % 3
    body = (
        F.when(m == 0, F.lit("<p>Now $1,299.99 (was $49)</p>"))
        .when(m == 1, F.lit("<p>€5.00 or €7 — about 6.50 USD</p>"))
        .otherwise(F.lit("<p>No commerce here, just words.</p>"))
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    p = pages.select("doc_id", price_extract(F.col("body")).alias("p"))
    return p.select(
        "doc_id", "p.n_prices", "p.currency", "p.min_micros",
        "p.max_micros",
    ).orderBy("doc_id")


ORACLE_PRICE = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 0 END
            AS INTEGER) AS n_prices,
       CASE doc_id % 3 WHEN 0 THEN '$' WHEN 1 THEN '€' END AS currency,
       CAST(CASE doc_id % 3 WHEN 0 THEN 49000000 WHEN 1 THEN 5000000
            END AS BIGINT) AS min_micros,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1299990000 WHEN 1 THEN 7000000
            END AS BIGINT) AS max_micros
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# ld_breadcrumbs
# --------------------------------------------------------------------------

def q_ld_breadcrumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.ld_breadcrumbs over a 3-level BreadcrumbList, a
    non-breadcrumb ld+json block, and a block-less page."""
    from .extract import ld_breadcrumbs

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 3
    body = (
        F.when(m == 0, F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@type": "BreadcrumbList", "itemListElement": ['
                  '{"position": 2, "name": "Cameras"},'
                  '{"position": 1, "name": "Shop"},'
                  '{"position": 3, "name": "Model '), ds,
            F.lit('"}]}</script>')))
        .when(m == 1, F.lit('<script type="application/ld+json">'
                            '{"@type": "Article"}</script>'))
        .otherwise(F.lit("<p>nothing structured</p>"))
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    b = pages.select("doc_id", ld_breadcrumbs(F.col("body")).alias("b"))
    return b.select(
        "doc_id", "b.depth", "b.leaf_name", "b.trail",
    ).orderBy("doc_id")


ORACLE_BREADCRUMBS = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 3 END AS INTEGER) AS depth,
       CASE doc_id % 3 WHEN 0 THEN 'Model ' || doc_id END AS leaf_name,
       CASE doc_id % 3 WHEN 0 THEN 'Shop > Cameras > Model ' || doc_id
       END AS trail
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# form_audit
# --------------------------------------------------------------------------

def q_form_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.form_audit over a login form, a search box, a
    newsletter capture, and a formless article."""
    from .extract import form_audit

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit('<form><input type="text" name="user">'
                             '<input type="password"></form>'))
        .when(m == 1, F.lit('<form role="search">'
                            '<input name="q" type="text"></form>'))
        .when(m == 2, F.lit('<form><input type="email" '
                            'placeholder="subscribe"></form>'))
        .otherwise(F.lit("<article>just text</article>"))
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    a = pages.select("doc_id", form_audit(F.col("body")).alias("f"))
    return a.select(
        "doc_id", "f.n_forms", "f.has_login", "f.has_search",
        "f.has_upload", "f.has_email_capture",
    ).orderBy("doc_id")


ORACLE_FORM = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END AS INTEGER)
         AS n_forms,
       doc_id % 4 = 0 AS has_login,
       doc_id % 4 = 1 AS has_search,
       FALSE AS has_upload,
       doc_id % 4 = 2 AS has_email_capture
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# dds_sniff
# --------------------------------------------------------------------------

def _dds(h: int, w: int, mip: int, fourcc: bytes) -> str:
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    hdr[4:8] = struct.pack("<I", 124)
    hdr[12:16] = struct.pack("<I", h)
    hdr[16:20] = struct.pack("<I", w)
    hdr[28:32] = struct.pack("<I", mip)
    hdr[84:88] = fourcc
    return bytes(hdr).hex()


_DDS_DXT5 = _dds(512, 1024, 10, b"DXT5")
_DDS_DX10 = _dds(256, 256, 1, b"DX10")


def q_dds_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.dds_sniff over a mipmapped DXT5, a DX10-extended
    texture, and a non-DDS payload."""
    from .images import dds_sniff

    doc = F.col("doc_id")
    m = doc % 3
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_DDS_DXT5))
        .otherwise(F.lit(_DDS_DX10))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return dds_sniff(imgs).select(
        "doc_id", "dds_height", "dds_width", "dds_mipmaps", "dds_fourcc",
    ).orderBy("doc_id")


ORACLE_DDS = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 1 THEN 512 WHEN 2 THEN 256 END
            AS BIGINT) AS dds_height,
       CAST(CASE doc_id % 3 WHEN 1 THEN 1024 WHEN 2 THEN 256 END
            AS BIGINT) AS dds_width,
       CAST(CASE doc_id % 3 WHEN 1 THEN 10 WHEN 2 THEN 1 END AS BIGINT)
         AS dds_mipmaps,
       CASE doc_id % 3 WHEN 1 THEN 'DXT5' WHEN 2 THEN 'DX10' END
         AS dds_fourcc
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "price_extract": q_price_extract,
        "ld_breadcrumbs": q_ld_breadcrumbs,
        "form_audit": q_form_audit,
        "dds_sniff": q_dds_sniff,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "price_extract": ORACLE_PRICE,
        "ld_breadcrumbs": ORACLE_BREADCRUMBS,
        "form_audit": ORACLE_FORM,
        "dds_sniff": ORACLE_DDS,
    }
