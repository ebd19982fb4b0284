"""Round-3 queries, part 24: <picture> source selection, iframe embed
audit, referrer-policy audit, per-host image format adoption.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# picture_sources
# --------------------------------------------------------------------------

def q_picture_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.picture_sources over pages with doc%3 <picture> blocks
    (avif + webp sources + img fallback); exploded to one row per
    candidate."""
    from .extract import picture_sources

    doc = F.col("doc_id")
    n = doc % 3

    def pic(i) -> F.Column:
        tag = lambda ext: F.concat(
            F.lit("/img"), i.cast("string"), F.lit("-"),
            doc.cast("string"), F.lit("." + ext))
        return F.concat(
            F.lit('<picture><source type="image/avif" srcset="'),
            tag("avif"),
            F.lit('"><source type="image/webp" srcset="'), tag("webp"),
            F.lit('"><img src="'), tag("jpg"),
            F.lit('" alt="x"></picture>'),
        )

    body = F.concat(
        F.lit("<html>"),
        F.array_join(
            F.transform(
                F.when(n > 0, F.sequence(F.lit(1), n))
                .otherwise(F.array().cast("array<bigint>")),
                lambda i: pic(i - 1)),
            ""),
        F.lit("</html>"),
    )
    pages = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                        body.alias("body"))
    return (
        pages.select("doc_id",
                     F.explode(picture_sources(F.col("body")))
                     .alias("s"))
        .select("doc_id", "s.pic_ord", "s.source_ord", "s.mime",
                "s.url")
        .orderBy("doc_id", "pic_ord", "source_ord")
    )


ORACLE_PICTURE = """
WITH p AS (
  SELECT d.doc_id, t.ti AS pic_ord
  FROM documents d
  JOIN generate_series(0, 2) t(ti) ON t.ti < d.doc_id % 3
)
SELECT doc_id, CAST(pic_ord AS INTEGER) AS pic_ord,
       CAST(s.si AS INTEGER) AS source_ord,
       CASE s.si WHEN 0 THEN 'image/avif' WHEN 1 THEN 'image/webp'
            ELSE 'fallback' END AS mime,
       '/img' || pic_ord || '-' || doc_id ||
       CASE s.si WHEN 0 THEN '.avif' WHEN 1 THEN '.webp'
            ELSE '.jpg' END AS url
FROM p CROSS JOIN generate_series(0, 2) s(si)
ORDER BY doc_id, pic_ord, source_ord
"""


# --------------------------------------------------------------------------
# iframe_audit
# --------------------------------------------------------------------------

def q_iframe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.iframe_audit over pages with first-party, third-party
    and sandboxed embeds plus a srcless iframe."""
    from .extract import iframe_audit

    doc = F.col("doc_id")
    m = doc % 3
    host = F.concat(F.lit("p"), (doc % 9).cast("string"), F.lit(".com"))
    body = (
        F.when(m == 0, F.lit("<p>no embeds</p>"))
        .when(m == 1, F.concat(
            F.lit('<iframe src="https://'), host,
            F.lit('/own"></iframe>'
                  '<iframe src="https://ads.example/slot" sandbox>'
                  "</iframe>")))
        .otherwise(F.lit(
            '<iframe sandbox="allow-scripts" '
            'src="https://w.example/x"></iframe>'
            "<iframe></iframe>"))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), host.alias("host"), body.alias("body"))
    a = pages.select(
        "doc_id",
        iframe_audit(F.col("body"), F.col("host")).alias("a"))
    return a.select(
        "doc_id", "a.n_iframes", "a.n_third_party", "a.n_sandboxed",
    ).orderBy("doc_id")


ORACLE_IFRAME = """
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 0 ELSE 2 END AS INTEGER)
         AS n_iframes,
       CAST(CASE doc_id % 3 WHEN 0 THEN 0 ELSE 1 END AS INTEGER)
         AS n_third_party,
       CAST(CASE doc_id % 3 WHEN 0 THEN 0 ELSE 1 END AS INTEGER)
         AS n_sandboxed
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# referrer_policy
# --------------------------------------------------------------------------

def q_referrer_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.referrer_policy_audit over absent, strict, leaky
    legacy, unsafe-url and unknown-token declarations."""
    from .extract import referrer_policy_audit

    doc = F.col("doc_id")
    m = doc % 5
    body = (
        F.when(m == 0, F.lit("<html><p>none</p></html>"))
        .when(m == 1, F.lit('<meta name="referrer" '
                            'content="strict-origin">'))
        .when(m == 2, F.lit('<META NAME="referrer" '
                            'CONTENT="no-referrer-when-downgrade">'))
        .when(m == 3, F.lit('<meta name="referrer" '
                            'content="unsafe-url">'))
        .otherwise(F.lit('<meta name="referrer" content="always">'))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"))
    a = pages.select(
        "doc_id", referrer_policy_audit(F.col("body")).alias("r"))
    return a.select(
        "doc_id", "r.declared",
        F.col("r.known").cast("int").alias("known"),
        "r.leaky",
    ).orderBy("doc_id")


ORACLE_REFERRER = """
SELECT doc_id,
       CASE doc_id % 5 WHEN 1 THEN 'strict-origin'
            WHEN 2 THEN 'no-referrer-when-downgrade'
            WHEN 3 THEN 'unsafe-url' WHEN 4 THEN 'always' END
         AS declared,
       CAST(CASE doc_id % 5 WHEN 0 THEN NULL WHEN 4 THEN 0
            ELSE 1 END AS INTEGER) AS known,
       doc_id % 5 IN (2, 3) AS leaky
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# format_adoption
# --------------------------------------------------------------------------

def q_format_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host modern-format adoption: sniff_image_format over
    planted magic bytes rolled up per host — the modernization signal
    that predicts whether a host's images deserve the AVIF fetch
    path."""
    from .images import sniff_image_format

    doc = F.col("doc_id")
    m = doc % 4
    hexstr = (
        F.when(m == 0, F.lit("89504e470d0a1a0a"))           # png
        .when(m == 1, F.lit("ffd8ffe0"))                     # jpeg
        .when(m == 2, F.lit("52494646aaaaaaaa57454250"))     # webp
        .otherwise(F.lit("474946383961"))                    # gif
    )
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("f"), (doc % 6).cast("string"), F.lit(".com"))
        .alias("host"),
        F.unhex(hexstr).alias("bytes"),
    )
    tagged = imgs.withColumn(
        "fmt", sniff_image_format(F.col("bytes")))
    return (
        tagged.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.when(F.col("fmt") == "webp", 1).otherwise(0))
            .cast("long").alias("n_webp"),
            F.sum(F.when(F.col("fmt").isin("png", "jpeg"), 1)
                  .otherwise(0)).cast("long").alias("n_legacy"),
        )
        .withColumn("modern_permille",
                    F.expr("(1000 * n_webp) div n_images"))
        .orderBy("host")
    )


ORACLE_FORMAT_ADOPTION = """
WITH i AS (
  SELECT 'f' || (doc_id % 6) || '.com' AS host, doc_id % 4 AS m
  FROM documents
)
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(CASE WHEN m = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_webp,
       CAST(SUM(CASE WHEN m IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_legacy,
       CAST((1000 * SUM(CASE WHEN m = 2 THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT) AS modern_permille
FROM i
GROUP BY host
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "picture_sources": q_picture_sources,
        "iframe_audit": q_iframe_audit,
        "referrer_policy": q_referrer_policy,
        "format_adoption": q_format_adoption,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "picture_sources": ORACLE_PICTURE,
        "iframe_audit": ORACLE_IFRAME,
        "referrer_policy": ORACLE_REFERRER,
        "format_adoption": ORACLE_FORMAT_ADOPTION,
    }
