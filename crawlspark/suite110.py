"""Round-4 queries, part 1: SemDeDup with a bounded intra-cluster
comparator set (max_cluster_size — the skew guard-rail VERDICT r3 asked
for, mirroring minhash_lsh_pairs.max_bucket_size)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_semdedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann.semdedup with max_cluster_size=40 over the suite3 planted
    fixture (vec_id%9==0 variants shifted +0.5 on the last coordinate).
    Clusters at sf>=0.01 hold hundreds of members, so the cap genuinely
    restricts the comparator set: every row still compares against the
    40 centroid-closest members of its cluster, and the oracle replays
    exactly that rank-capped rule (not the uncapped one)."""
    from . import ann as _ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    variants = emb.filter(F.col("vec_id") % 9 == 0).select(
        (-(F.col("vec_id") + 1)).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63),
            F.array(F.element_at("embedding", 64) + F.lit(0.5)),
        ).alias("embedding"),
    )
    allv = emb.unionByName(variants)
    return _ann.semdedup(
        allv, n_centroids=8, eps_permille=800, max_cluster_size=40
    ).orderBy("vec_id")


ORACLE_SEMDEDUP_CAPPED = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
vart AS (
  SELECT -(vec_id + 1) AS vec_id,
         list_append(v[1:63], v[64] + 0.5) AS v
  FROM base WHERE vec_id % 9 = 0
),
e AS (SELECT * FROM base UNION ALL SELECT * FROM vart),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id >= 0 AND vec_id < 8),
ass AS (
  SELECT vec_id, v, cent_id, pm FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           CAST(floor(list_cosine_similarity(e.v, c.cv) * 1000) AS BIGINT) AS pm,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY CAST(floor(list_cosine_similarity(e.v, c.cv) * 1000) AS BIGINT) DESC,
                      c.cent_id
           ) AS rn
    FROM e CROSS JOIN cent c)
  WHERE rn = 1
),
assr AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cent_id ORDER BY pm DESC, vec_id ASC) AS pr
  FROM ass
),
drp AS (
  SELECT DISTINCT a.vec_id FROM ass a JOIN assr b
    ON a.cent_id = b.cent_id AND a.vec_id != b.vec_id
   AND b.pr <= 40
   AND (b.pm > a.pm OR (b.pm = a.pm AND b.vec_id < a.vec_id))
   AND floor(list_cosine_similarity(a.v, b.v) * 1000) >= 800
)
SELECT a.vec_id, a.cent_id, a.pm AS centroid_sim_permille,
       d.vec_id IS NULL AS kept
FROM ass a LEFT JOIN drp d ON a.vec_id = d.vec_id
ORDER BY a.vec_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"semdedup_capped": q_semdedup_capped,
            "html_soup": q_html_soup}


def oracle_sql() -> dict[str, str]:
    return {"semdedup_capped": ORACLE_SEMDEDUP_CAPPED,
            "html_soup": ORACLE_HTML_SOUP}


# --------------------------------------------------------------------------
# html_soup — adversarial tag-soup link extraction (VERDICT r3 item 6)
# --------------------------------------------------------------------------

def q_html_soup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.extract_links_udf over deliberately broken HTML, one shape
    per doc_id%6: unclosed anchor at EOF, comment+script decoy anchors,
    nested anchors (implicit close), '>' inside a quoted attribute plus an
    entity-encoded href, an anchor spoofed inside an attribute value, and
    duplicate href attributes (first wins) with an uppercase tag.  The
    expectations are what a browser DOM produces (reference parses with a
    real DOM, src/Steps/Dom/HtmlDocument.php:63-86)."""
    from .extract import extract_links_udf

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 6
    body = (
        F.when(m == 0, F.concat(
            F.lit('<div><p>x<a href="/u'), ds, F.lit('">deep link')))
        .when(m == 1, F.concat(
            F.lit('<!-- <a href="/no">x</a> -->'
                  '<script>var s = \'<a href=/no2>\';</script>'
                  '<a href="/ok'), ds, F.lit('">ok</a>')))
        .when(m == 2, F.concat(
            F.lit('<a href="/a'), ds, F.lit('">one <a href="/b'), ds,
            F.lit('">two</a>')))
        .when(m == 3, F.concat(
            F.lit('<a title="a > b" href="/p'), ds,
            F.lit('?x=1&amp;y=2">q</a>')))
        .when(m == 4, F.concat(
            F.lit('<img alt="<a href=/fake>"><a href=/r'), ds,
            F.lit(">r</a>")))
        .otherwise(F.concat(
            F.lit('<A HREF="/c'), ds, F.lit('" href="/zzz">Cap</A>')))
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), body.alias("body"))
    out = d.select(
        "doc_id", F.explode(extract_links_udf(F.col("body"))).alias("l"))
    return out.select(
        "doc_id",
        F.col("l.pos").cast("long").alias("pos"),
        F.col("l.href").alias("href"),
        F.col("l.text").alias("text"),
    ).orderBy("doc_id", "pos")


ORACLE_HTML_SOUP = """
WITH e AS (
  SELECT doc_id, 0 AS pos,
         CASE doc_id % 6
           WHEN 0 THEN '/u' || CAST(doc_id AS VARCHAR)
           WHEN 1 THEN '/ok' || CAST(doc_id AS VARCHAR)
           WHEN 2 THEN '/a' || CAST(doc_id AS VARCHAR)
           WHEN 3 THEN '/p' || CAST(doc_id AS VARCHAR) || '?x=1&y=2'
           WHEN 4 THEN '/r' || CAST(doc_id AS VARCHAR)
           ELSE '/c' || CAST(doc_id AS VARCHAR) END AS href,
         CASE doc_id % 6
           WHEN 0 THEN 'deep link' WHEN 1 THEN 'ok' WHEN 2 THEN 'one'
           WHEN 3 THEN 'q' WHEN 4 THEN 'r' ELSE 'Cap' END AS text
  FROM documents
  UNION ALL
  SELECT doc_id, 1, '/b' || CAST(doc_id AS VARCHAR), 'two'
  FROM documents WHERE doc_id % 6 = 2
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, href, text
FROM e ORDER BY doc_id, pos
"""
