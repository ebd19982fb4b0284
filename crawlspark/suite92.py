"""Round-3 queries, part 42: contrastive hard-negative mining over
phash near-dup pairs, typosquat host screen.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# image_hard_negatives — near-dup pixels, disagreeing captions
# --------------------------------------------------------------------------

def q_image_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.hard_negative_pairs over the shared planted phash
    near-dup fixture (suite2): every doc%5==0 pair is visually near;
    doc%10==0 duplicates keep the caption (jaccard 1000 -> dedup
    signal), the others get a disagreeing caption (jaccard 200 ->
    hard negative)."""
    from .mmcurate import hard_negative_pairs
    from .suite2 import _planted_near_dup_pairs

    pairs = _planted_near_dup_pairs(spark, sf_dir)
    doc = F.col("doc_id")
    ds = doc.cast("string")
    base = _docs(spark, sf_dir)
    caps_img = base.select(
        F.concat(F.lit("img-"), ds).alias("image_id"),
        F.concat(F.lit("cat photo n"), ds).alias("caption"),
    )
    caps_dup = base.filter(doc % 5 == 0).select(
        F.concat(F.lit("dup-"), ds).alias("image_id"),
        F.when(doc % 10 == 0, F.concat(F.lit("cat photo n"), ds))
        .otherwise(F.concat(F.lit("dog sketch n"), ds)).alias("caption"),
    )
    out = hard_negative_pairs(pairs, caps_img.unionByName(caps_dup))
    return out.orderBy("id_a")


ORACLE_HARD_NEGATIVES = """
SELECT 'dup-' || CAST(doc_id AS VARCHAR) AS id_a,
       'img-' || CAST(doc_id AS VARCHAR) AS id_b,
       CAST(1 + doc_id % 2 AS BIGINT) AS hamming,
       CAST(CASE WHEN doc_id % 10 = 0 THEN 1000 ELSE 200 END AS BIGINT)
         AS caption_jaccard_permille,
       doc_id % 10 <> 0 AS hard_negative
FROM documents WHERE doc_id % 5 = 0
ORDER BY id_a
"""


# --------------------------------------------------------------------------
# typosquats — Levenshtein brand-distance screen
# --------------------------------------------------------------------------

_BRANDS = ["example.com", "paypal.com"]


def q_typosquats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.typosquat_hosts: substitution / deletion / insertion
    variants of example.com flag at distance 1, the brand itself and
    unrelated hosts don't."""
    from .canon import typosquat_hosts

    doc = F.col("doc_id")
    m = doc % 5
    host = (
        F.when(m == 0, F.lit("examp1e.com"))
        .when(m == 1, F.lit("exampl.com"))
        .when(m == 2, F.lit("examples.com"))
        .when(m == 3, F.lit("example.com"))
        .otherwise(F.concat(F.lit("shop"), doc.cast("string"),
                            F.lit(".org")))
    )
    d = _docs(spark, sf_dir).select(host.alias("host"))
    return typosquat_hosts(d, _BRANDS, max_dist=1).orderBy("host")


ORACLE_TYPOSQUATS = """
SELECT host, 'example.com' AS brand, CAST(1 AS BIGINT) AS dist
FROM (VALUES ('examp1e.com'), ('exampl.com'), ('examples.com')) t(host)
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "image_hard_negatives": q_image_hard_negatives,
        "typosquats": q_typosquats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "image_hard_negatives": ORACLE_HARD_NEGATIVES,
        "typosquats": ORACLE_TYPOSQUATS,
    }
