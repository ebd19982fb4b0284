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
            "html_soup": q_html_soup,
            "image_stats": q_image_stats,
            "shot_boundaries": q_shot_boundaries,
            "sitemap_news": q_sitemap_news,
            "schedule_audit": q_schedule_audit,
            "dom_soup": q_dom_soup}


def oracle_sql() -> dict[str, str]:
    return {"semdedup_capped": ORACLE_SEMDEDUP_CAPPED,
            "html_soup": ORACLE_HTML_SOUP,
            "image_stats": ORACLE_IMAGE_STATS,
            "shot_boundaries": ORACLE_SHOT_BOUNDARIES,
            "sitemap_news": ORACLE_SITEMAP_NEWS,
            "schedule_audit": ORACLE_SCHEDULE_AUDIT,
            "dom_soup": ORACLE_DOM_SOUP}


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


# --------------------------------------------------------------------------
# image_stats — pixel-statistics curation filters over planted shapes
# --------------------------------------------------------------------------

def q_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.image_pixel_stats over analytically-known 8x8 RGB images:
    doc%2==0 -> solid gray v=doc%251 (contrast/sharpness/entropy all 0),
    doc%2==1 -> 1px checkerboard of a=doc%90 and b=a+110 (mean a+55,
    std 55, mean |4-neighbour Laplacian| 440, entropy exactly 1 bit)."""
    from .images import image_pixel_stats

    doc = F.col("doc_id")
    v = (doc % 251).cast("int")
    a = (doc % 90).cast("int")
    b = (a + 110).cast("int")
    hexpix = lambda c: F.repeat(F.format_string("%02x", c), 3)  # noqa: E731
    solid = F.unhex(F.repeat(F.format_string("%02x", v), 192))
    row_even = F.repeat(F.concat(hexpix(a), hexpix(b)), 4)   # w=8 pixels
    row_odd = F.repeat(F.concat(hexpix(b), hexpix(a)), 4)
    checker = F.unhex(F.repeat(F.concat(row_even, row_odd), 4))  # h=8 rows
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        F.when(doc % 2 == 0, solid).otherwise(checker).alias("bytes"),
        F.lit(8).alias("w"), F.lit(8).alias("h"),
        doc.alias("doc_id"),
    )
    return image_pixel_stats(d).orderBy("image_id")


ORACLE_IMAGE_STATS = """
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id % 251) * 1000
            ELSE (doc_id % 90 + 55) * 1000 END AS BIGINT) AS mean_permille,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 55000 END AS BIGINT)
         AS contrast_permille,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 440000 END AS BIGINT)
         AS sharpness_permille,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1000 END AS BIGINT)
         AS entropy_millibits
FROM documents
ORDER BY image_id
"""


# --------------------------------------------------------------------------
# shot_boundaries — scene segmentation over planted solid frames
# --------------------------------------------------------------------------

def q_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media.shot_boundaries over 20 solid 4x3 frames per video whose
    color steps by 10 every 5 frames: boundaries at frame 5/10/15,
    shot_id = frame_idx div 5, diff exactly 10000 permille at cuts and 0
    inside shots (first frame: no previous, diff NULL)."""
    from .media import shot_boundaries

    doc = F.col("doc_id")
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(doc % 10 == 0)
        .select(F.concat(F.lit("v"), doc.cast("string")).alias("video_id"))
        .crossJoin(spark.range(20).select(F.col("id").cast("int")
                                          .alias("frame_idx")))
    )
    color = (F.col("frame_idx").cast("long") / 5).cast("long") * 10
    d = d.withColumn(
        "bytes", F.unhex(F.repeat(F.format_string("%02x", color.cast("int")),
                                  36)))
    return shot_boundaries(d).orderBy("video_id", "frame_idx")


ORACLE_SHOT_BOUNDARIES = """
WITH v AS (SELECT 'v' || CAST(doc_id AS VARCHAR) AS video_id
           FROM documents WHERE doc_id % 10 = 0),
f AS (SELECT video_id, CAST(i AS INT) AS frame_idx
      FROM v, range(20) t(i))
SELECT video_id, frame_idx,
       CAST(CASE WHEN frame_idx = 0 THEN NULL
            WHEN frame_idx % 5 = 0 THEN 10000 ELSE 0 END AS BIGINT)
         AS diff_permille,
       frame_idx > 0 AND frame_idx % 5 = 0 AS is_boundary,
       CAST(frame_idx // 5 AS BIGINT) AS shot_id
FROM f ORDER BY video_id, frame_idx
"""


# --------------------------------------------------------------------------
# sitemap_news — Google News sitemap extension extraction
# --------------------------------------------------------------------------

def q_sitemap_news(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.sitemap_news_entries over a 3-url sitemap per doc: one
    news-annotated article, one plain <url> (contributes nothing), one
    second article with a different language/date."""
    from .extract import sitemap_news_entries

    doc = F.col("doc_id")
    ds = doc.cast("string")
    xml = F.concat(
        F.lit('<urlset><url><loc>https://n.example.com/a'), ds,
        F.lit('</loc><news:news><news:publication><news:name>Daily '),
        F.lit('Planet</news:name><news:language>en</news:language>'
              '</news:publication><news:publication_date>2026-08-20'
              '</news:publication_date><news:title>Story A</news:title>'
              '</news:news></url>'
              '<url><loc>https://n.example.com/plain</loc></url>'
              '<url><loc>https://n.example.com/b'),
        ds,
        F.lit('</loc><news:news><news:publication><news:name>Le '),
        F.lit('Monde</news:name><news:language>fr</news:language>'
              '</news:publication><news:publication_date>2026-08-21'
              '</news:publication_date><news:title>Story B</news:title>'
              '</news:news></url></urlset>'),
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), xml.alias("body"))
    out = d.select(
        "doc_id",
        F.explode(sitemap_news_entries(F.col("body"))).alias("e"))
    return out.select(
        "doc_id", "e.page_url", "e.publication", "e.language",
        "e.pub_date", "e.title",
    ).orderBy("doc_id", "page_url")


ORACLE_SITEMAP_NEWS = """
WITH e AS (
  SELECT doc_id,
         'https://n.example.com/a' || CAST(doc_id AS VARCHAR) AS page_url,
         'Daily Planet' AS publication, 'en' AS language,
         '2026-08-20' AS pub_date, 'Story A' AS title
  FROM documents
  UNION ALL
  SELECT doc_id, 'https://n.example.com/b' || CAST(doc_id AS VARCHAR),
         'Le Monde', 'fr', '2026-08-21', 'Story B'
  FROM documents
)
SELECT * FROM e ORDER BY doc_id, page_url
"""


# --------------------------------------------------------------------------
# schedule_audit — politeness-gap verification of an emitted schedule
# --------------------------------------------------------------------------

def q_schedule_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.schedule_audit over a planted schedule: hosts h(doc%50)
    with 3 fetches each — clean 100ms gaps for even hosts; odd hosts have
    one 30ms gap (violation under the 50ms floor) and one overlap."""
    from .politeness import schedule_audit

    doc = F.col("doc_id")
    h = (doc % 50).cast("long")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), h.alias("hid"))
    # fetch k in {0,1,2} per doc; duration 20ms each
    k = spark.range(3).select(F.col("id").alias("k"))
    rows = d.crossJoin(k).select(
        "doc_id",
        F.concat(F.lit("h"), F.col("hid").cast("string")).alias("host"),
        F.when(F.col("hid") % 2 == 0, F.col("k") * 120)
        .otherwise(
            F.when(F.col("k") == 0, F.lit(0))
            .when(F.col("k") == 1, F.lit(50))    # gap 50-20=30ms < 50 floor
            .otherwise(F.lit(60))                 # starts before 50+20=70: overlap
        ).cast("long").alias("fetch_start_ms"),
    )
    # docs sharing a host produce identical triples; audit one doc's worth
    rows = rows.filter(doc < 50).withColumn(
        "fetch_end_ms", F.col("fetch_start_ms") + 20)
    return schedule_audit(rows, min_gap_ms=50).orderBy("host")


ORACLE_SCHEDULE_AUDIT = """
SELECT 'h' || CAST(doc_id % 50 AS VARCHAR) AS host,
       CAST(3 AS BIGINT) AS n_fetches,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS BIGINT)
         AS n_gap_violations,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
         AS n_overlaps,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 100 ELSE -10 END AS BIGINT)
         AS min_gap_ms_observed
FROM documents WHERE doc_id < 50
ORDER BY host
"""


# --------------------------------------------------------------------------
# dom_soup — CSS-selector extraction over malformed markup (cssq hardening)
# --------------------------------------------------------------------------

def q_dom_soup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cssq.find_elements through the same pandas_udf path the Dom step
    uses, over four malformed shapes per doc: commented-out decoy
    element, script-embedded decoy, '>' inside a quoted attribute, and an
    unclosed element running to EOF.  Expectations are browser-DOM."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    doc = F.col("doc_id")
    ds = doc.cast("string")
    m = doc % 4
    body = (
        F.when(m == 0, F.concat(
            F.lit('<!-- <p class=t>no</p> --><p class=t>c'), ds,
            F.lit("</p>")))
        .when(m == 1, F.concat(
            F.lit('<script>var x="<p class=t>no</p>";</script>'
                  '<p class=t>s'), ds, F.lit("</p>")))
        .when(m == 2, F.concat(
            F.lit('<p class=t title="a > b">g'), ds, F.lit("</p>")))
        .otherwise(F.concat(F.lit('<div><p class=t>u'), ds))
    )

    @pandas_udf("string")
    def first_inner(bodies):
        from . import cssq

        def one(b):
            els = cssq.find_elements(b or "", "p.t")
            return els[0][2] if els else None

        return bodies.map(one)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", first_inner(F.col("body")).alias("inner_html")
    ).orderBy("doc_id")


ORACLE_DOM_SOUP = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'c' WHEN 1 THEN 's' WHEN 2 THEN 'g' ELSE 'u'
       END || CAST(doc_id AS VARCHAR) AS inner_html
FROM documents ORDER BY doc_id
"""
