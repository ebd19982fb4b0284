"""Round-3 queries, part 2: image-frontier variant folding, boilerplate
caption mining, fixed-size aspect-bucket batch assignment.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation (integer-exact).  The
variant-fold oracle derives the expected stem/rank from the fixture's
CONSTRUCTION (suffix CASE), not from the implementation's regexes, so a
regex bug in the op cannot hide in the oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# image_variant_fold — collapse resolution editions onto one fetch
# --------------------------------------------------------------------------

def q_image_variant_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution-variant image-URL folding (extract.fold_image_variants):
    per doc a family of CDN editions — WordPress ``-WxH`` crops
    (doc%4==1), srcset-style ``_Nw`` widths (doc%4==2), ``@2x`` DPR
    (doc%4==3), plus the original — folded to one chosen fetch per stem."""
    from .extract import fold_image_variants

    doc = F.col("doc_id")
    stem0 = F.concat(
        F.lit("https://img"), (doc % 5).cast("string"),
        F.lit(".example.com/m/"), doc.cast("string"),
    )
    fam = doc % 4

    def edition(suffix: str, only_fam: int) -> F.Column:
        return F.when(fam == only_fam, F.concat(stem0, F.lit(suffix)))

    arr = F.array(
        F.concat(stem0, F.lit(".jpg")),
        edition("-300x200.jpg", 1),
        edition("-600x400.jpg", 1),
        edition("_640w.jpg", 2),
        edition("_1280w.jpg", 2),
        edition("@2x.jpg", 3),
    )
    urls = (
        _docs(spark, sf_dir)
        .select(F.explode(arr).alias("url"))
        .filter(F.col("url").isNotNull())
    )
    return fold_image_variants(urls).orderBy("stem")


ORACLE_VARIANT_FOLD = """
WITH d AS (
  SELECT doc_id,
         'https://img' || (doc_id % 5) || '.example.com/m/' || doc_id AS s0
  FROM documents
),
u AS (
  SELECT s0 || '.jpg' AS url, s0 FROM d
  UNION ALL SELECT s0 || '-300x200.jpg', s0 FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT s0 || '-600x400.jpg', s0 FROM d WHERE doc_id % 4 = 1
  UNION ALL SELECT s0 || '_640w.jpg', s0 FROM d WHERE doc_id % 4 = 2
  UNION ALL SELECT s0 || '_1280w.jpg', s0 FROM d WHERE doc_id % 4 = 2
  UNION ALL SELECT s0 || '@2x.jpg', s0 FROM d WHERE doc_id % 4 = 3
),
r AS (
  SELECT s0 || '.jpg' AS stem, url,
         CASE WHEN ends_with(url, '@2x.jpg') THEN 2000000000
              WHEN ends_with(url, '-300x200.jpg') THEN 300
              WHEN ends_with(url, '-600x400.jpg') THEN 600
              WHEN ends_with(url, '_640w.jpg') THEN 640
              WHEN ends_with(url, '_1280w.jpg') THEN 1280
              ELSE 1000000000 END AS r
  FROM u
),
g AS (
  SELECT stem, COUNT(*) AS n_variants, CAST(MAX(r) AS BIGINT) AS chosen_rank
  FROM r GROUP BY stem
),
p AS (
  SELECT stem, url,
         ROW_NUMBER() OVER (PARTITION BY stem ORDER BY r DESC, url DESC) AS rn
  FROM r
)
SELECT g.stem, g.n_variants, p.url AS chosen_url, g.chosen_rank
FROM g JOIN p USING (stem)
WHERE p.rn = 1
ORDER BY g.stem
"""


# --------------------------------------------------------------------------
# caption_boilerplate — stock alt-text reused across many distinct images
# --------------------------------------------------------------------------

def q_caption_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-caption mining (mmcurate.caption_boilerplate): captions
    paired with >=3 DISTINCT images (by phash) are stock alt-text; the
    fixture plants two generic captions (with mixed case/padding the
    normalization must fold) over shared-phash image groups."""
    from .mmcurate import caption_boilerplate

    doc = F.col("doc_id")
    cap = (
        F.when(doc % 5 == 0, F.lit("  Stock Photo "))
        .when(doc % 5 == 1, F.lit("IMAGE"))
        .otherwise(F.concat(F.lit("photo of item "), doc.cast("string")))
    )
    pairs = _docs(spark, sf_dir).select(
        cap.alias("caption"),
        F.expr("doc_id div 3").alias("phash"),
    )
    return caption_boilerplate(pairs, min_distinct_images=3).orderBy(
        "caption_norm"
    )


ORACLE_CAPTION_BOILERPLATE = """
WITH p AS (
  SELECT CASE WHEN doc_id % 5 = 0 THEN 'stock photo'
              WHEN doc_id % 5 = 1 THEN 'image'
              ELSE 'photo of item ' || doc_id END AS caption_norm,
         doc_id // 3 AS ph
  FROM documents
)
SELECT caption_norm, COUNT(*) AS n_pairs,
       COUNT(DISTINCT ph) AS n_distinct_images,
       COUNT(DISTINCT ph) >= 3 AS is_boilerplate
FROM p GROUP BY caption_norm ORDER BY caption_norm
"""


# --------------------------------------------------------------------------
# bucket_batches — fixed-size same-aspect training batches, drop-last
# --------------------------------------------------------------------------

_BATCH = 8


def q_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size batch assignment within aspect buckets, drop-last
    (mmcurate.bucket_batches, batch=8) over the dims_for w/h replay; the
    oracle replays the per-bucket rank, global batch numbering, and the
    ragged-tail drop."""
    from .mmcurate import aspect_bucket_col, bucket_batches

    doc = F.col("doc_id")
    w, h = (32 + doc % 32).cast("long"), (32 + doc % 24).cast("long")
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        aspect_bucket_col(w, h).alias("bucket"),
    )
    return bucket_batches(imgs, batch_size=_BATCH).orderBy("image_id")


ORACLE_BUCKET_BATCHES = f"""
WITH imgs AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         32 + doc_id % 32 AS w, 32 + doc_id % 24 AS h
  FROM documents
),
b AS (
  SELECT image_id,
         CASE WHEN 4 * w < 3 * h THEN 'tall'
              WHEN 3 * w > 4 * h THEN 'wide'
              ELSE 'square' END AS bucket
  FROM imgs
),
r AS (
  SELECT image_id, bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY image_id) - 1 AS rn
  FROM b
),
c AS (SELECT bucket, COUNT(*) AS n, COUNT(*) // {_BATCH} AS nb
      FROM r GROUP BY bucket),
bases AS (
  SELECT bucket, nb,
         COALESCE(SUM(nb) OVER (ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bb
  FROM c
)
SELECT r.image_id, r.bucket,
       CAST(CASE WHEN rn // {_BATCH} < nb THEN bb + rn // {_BATCH} END
            AS BIGINT) AS batch_uid,
       CAST(rn % {_BATCH} AS BIGINT) AS slot,
       rn // {_BATCH} < nb AS kept
FROM r JOIN bases USING (bucket)
ORDER BY r.image_id
"""


# --------------------------------------------------------------------------
# compaction_plan — small-file rewrite groups for the streamed image table
# --------------------------------------------------------------------------

_SMALL = 32_000_000
_TARGET = 8_000_000


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (sinks.compaction_plan) over a
    synthesized manifest: 4 partitions, file sizes (doc%7+1) MB with every
    doc%10==9 file at 100 MB (over the small-file bar, excluded); 8 MB
    target groups, singleton groups dropped.  The oracle replays the
    filter, per-partition offset packing, global group numbering and the
    >=2-files rule."""
    from .sinks import compaction_plan

    doc = F.col("doc_id")
    manifest = _docs(spark, sf_dir).select(
        F.concat(F.lit("p"), (doc % 4).cast("string")).alias("partition"),
        F.concat(F.lit("f-"), F.lpad(doc.cast("string"), 6, "0"))
        .alias("file_id"),
        F.when(doc % 10 == 9, F.lit(100_000_000))
        .otherwise((doc % 7 + 1) * 1_000_000).cast("long").alias("bytes"),
    )
    out = compaction_plan(
        manifest, small_bytes=_SMALL, target_bytes=_TARGET
    )
    return out.select(
        "partition", "group_uid", "n_files", "total_bytes",
        F.concat_ws("|", F.col("file_ids")).alias("file_ids_joined"),
    ).orderBy("partition", "group_uid")


ORACLE_COMPACTION_PLAN = f"""
WITH m AS (
  SELECT 'p' || (doc_id % 4) AS part,
         'f-' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS file_id,
         CASE WHEN doc_id % 10 = 9 THEN 100000000
              ELSE (doc_id % 7 + 1) * 1000000 END AS bytes
  FROM documents
),
small AS (SELECT * FROM m WHERE bytes < {_SMALL}),
rows_ AS (
  SELECT part, file_id, bytes,
         COALESCE(SUM(bytes) OVER (PARTITION BY part ORDER BY file_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM small
),
sh AS (SELECT *, before // {_TARGET} AS shard_ix FROM rows_),
counts AS (SELECT part, MAX(shard_ix) + 1 AS n_shards FROM sh GROUP BY part),
bases AS (
  SELECT part, COALESCE(SUM(n_shards) OVER (ORDER BY part
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
  FROM counts
),
g AS (
  SELECT s.part, (b.base + s.shard_ix) AS group_uid,
         COUNT(*) AS n_files, CAST(SUM(s.bytes) AS BIGINT) AS total_bytes,
         string_agg(s.file_id, '|' ORDER BY s.file_id) AS file_ids_joined
  FROM sh s JOIN bases b USING (part)
  GROUP BY s.part, b.base + s.shard_ix
)
SELECT part AS partition, CAST(group_uid AS BIGINT) AS group_uid,
       n_files, total_bytes, file_ids_joined
FROM g WHERE n_files >= 2
ORDER BY partition, group_uid
"""


# --------------------------------------------------------------------------
# sitemap_cross_host — cross-submit admission gate
# --------------------------------------------------------------------------

def q_sitemap_cross_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-host sitemap admission (robots.cross_host_sitemap_admission):
    sitemap on host s(doc%5) lists a URL on host s(doc%3); even-numbered
    hosts declare the NEXT host's sitemap in their robots.txt, so
    cross-host entries split into robots_declared vs undeclared."""
    from .robots import cross_host_sitemap_admission

    doc = F.col("doc_id")
    entries = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("https://s"), (doc % 5).cast("string"),
                 F.lit(".test/sitemap.xml")).alias("sitemap_url"),
        F.concat(F.lit("https://s"), (doc % 3).cast("string"),
                 F.lit(".test/p/"), doc.cast("string")).alias("listed_url"),
    )
    decls = spark.createDataFrame(
        [(f"s{n}.test", f"https://s{(n + 1) % 5}.test/sitemap.xml")
         for n in range(5) if n % 2 == 0],
        "robots_host STRING, sitemap_url STRING",
    )
    return cross_host_sitemap_admission(entries, decls).orderBy("doc_id")


ORACLE_SITEMAP_CROSS_HOST = """
WITH e AS (
  SELECT doc_id,
         'https://s' || (doc_id % 5) || '.test/sitemap.xml' AS sitemap_url,
         'https://s' || (doc_id % 3) || '.test/p/' || doc_id AS listed_url,
         's' || (doc_id % 5) || '.test' AS sitemap_host,
         's' || (doc_id % 3) || '.test' AS listed_host
  FROM documents
),
decl AS (
  SELECT 's' || n || '.test' AS decl_host,
         'https://s' || ((n + 1) % 5) || '.test/sitemap.xml' AS decl_sitemap
  FROM (SELECT unnest([0, 2, 4]) AS n)
),
j AS (
  SELECT e.*, decl.decl_host
  FROM e LEFT JOIN decl
    ON e.listed_host = decl.decl_host AND e.sitemap_url = decl.decl_sitemap
)
SELECT doc_id, sitemap_url, listed_url, sitemap_host, listed_host,
       (sitemap_host = listed_host OR decl_host IS NOT NULL) AS admitted,
       CASE WHEN sitemap_host = listed_host THEN 'same_host'
            WHEN decl_host IS NOT NULL THEN 'robots_declared'
            ELSE 'cross_host_undeclared' END AS reason
FROM j ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# aimd_concurrency — congestion-controlled per-host fetch parallelism
# --------------------------------------------------------------------------

_AIMD_HOSTS = 20
_AIMD_STEPS = 8
_AIMD_CMAX = 16


def q_aimd_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIMD per-host concurrency (politeness.aimd_concurrency) over a
    20-host x 8-step outcome fixture (ok iff (doc*7+3)%5 != 0); the
    oracle unrolls the additive-increase / multiplicative-decrease
    recurrence step by step (house style: like the pagerank unroll)."""
    from .politeness import aimd_concurrency

    doc = F.col("doc_id")
    hist = (
        _docs(spark, sf_dir)
        .filter(doc < _AIMD_HOSTS * _AIMD_STEPS)
        .select(
            F.concat(F.lit("h"), (doc % _AIMD_HOSTS).cast("string"))
            .alias("host"),
            F.expr(f"doc_id div {_AIMD_HOSTS}").alias("ord"),
            ((doc * 7 + 3) % 5 != 0).alias("ok"),
        )
    )
    return aimd_concurrency(hist, c_max=_AIMD_CMAX).orderBy("host")


def _oracle_aimd() -> str:
    steps = []
    prev = "s0"
    for k in range(_AIMD_STEPS):
        ok = f"(((hn + {20 * k}) * 7 + 3) % 5 != 0)"
        cur = f"s{k + 1}"
        steps.append(
            f"{cur} AS (SELECT hn, "
            f"CASE WHEN {ok} THEN LEAST({_AIMD_CMAX}, c + 1) "
            f"ELSE GREATEST(1, c // 2) END AS c, "
            f"GREATEST(peak, CASE WHEN {ok} THEN LEAST({_AIMD_CMAX}, c + 1) "
            f"ELSE GREATEST(1, c // 2) END) AS peak, "
            f"halv + CASE WHEN {ok} THEN 0 ELSE 1 END AS halv "
            f"FROM {prev})"
        )
        prev = cur
    chain = ",\n".join(steps)
    return f"""
WITH h AS (SELECT unnest(generate_series(0, {_AIMD_HOSTS - 1})) AS hn),
s0 AS (SELECT hn, 1 AS c, 1 AS peak, 0 AS halv FROM h),
{chain}
SELECT 'h' || hn AS host, CAST(c AS BIGINT) AS final_c,
       CAST(peak AS BIGINT) AS max_c, CAST(halv AS BIGINT) AS n_halvings
FROM {prev} ORDER BY host
"""


# --------------------------------------------------------------------------
# redirect_loops — chain outcome classification (loop / cap / resolved)
# --------------------------------------------------------------------------

_REDIR_M = 480  # fixed cap, multiple of 10: redirect sources have
# residue <= 8 so every target doc+1/doc+2 stays < _REDIR_M — the
# fixture is closed by CONSTRUCTION at any table size >= 480, instead
# of wrapping targets mod the table size (a wrap lands doc n-1's
# redirect on doc 0, whose chain depends on n%10 — the oracle's
# residue-class table would be wrong for n = 2 or 6 mod 10)


def q_redirect_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain outcome classification (engine.redirect_status)
    over a fixture with healthy chains and cycles on docs < 480:
    doc%10==1 -> +1 -> +1 (two-hop resolve), ==2 -> +1 (one-hop),
    ==5 <-> ==6 (2-cycle), ==8 -> itself (self-loop); the oracle states
    the expected status/final/hops per residue class from the
    construction."""
    from . import graph
    from .engine import redirect_status

    doc = F.col("doc_id")
    docs = _docs(spark, sf_dir).filter(doc < _REDIR_M)
    r = doc % 10
    target = (
        F.when(r.isin(1, 2, 5), graph.url_col(doc + 1))
        .when(r == 6, graph.url_col(doc - 1))
        .when(r == 8, graph.url_col(doc))
    )
    pages = docs.select(
        graph.url_col(doc).alias("url"), target.alias("redirect_to")
    )
    return redirect_status(pages).orderBy("fetch_url")


def _oracle_redirect_loops() -> str:
    from . import graph

    u = lambda v: graph._URL_SQL.replace("doc", v)
    return f"""
WITH d AS (
  SELECT doc_id, doc_id % 10 AS r,
         doc_id + 1 AS n1, doc_id + 2 AS n2
  FROM documents
  WHERE doc_id < {_REDIR_M} AND doc_id % 10 IN (1, 2, 5, 6, 8)
)
SELECT {u("doc_id")} AS fetch_url,
       CASE WHEN r IN (5, 6, 8) THEN 'loop' ELSE 'resolved' END AS status,
       CASE WHEN r = 1 THEN {u("n2")}
            WHEN r = 2 THEN {u("n1")} END AS final_url,
       CAST(CASE WHEN r IN (5, 6, 8) THEN 10
                 WHEN r = 1 THEN 2 ELSE 1 END AS BIGINT) AS hops
FROM d ORDER BY fetch_url
"""


# --------------------------------------------------------------------------
# img_fetch_priority — author-hinted image scheduling order
# --------------------------------------------------------------------------

def q_img_fetch_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image fetch priority (extract.img_fetch_priority): every page
    carries a hero image (fetchpriority=high on doc%3==0, else
    undecorated-first), a plain body image, a loading=lazy image, and —
    on even docs — a fetchpriority=low one; the oracle replays the
    priority rules per position from the construction."""
    from .extract import img_fetch_priority

    doc = F.col("doc_id")
    s = doc.cast("string")
    hero = F.when(
        doc % 3 == 0,
        F.concat(F.lit('<img src="/hero/'), s,
                 F.lit('.jpg" fetchpriority="high">')),
    ).otherwise(F.concat(F.lit('<img src="/hero/'), s, F.lit('.jpg">')))
    body_img = F.concat(F.lit('<img src="/body/'), s, F.lit('.jpg">'))
    lazy = F.concat(F.lit('<img loading="lazy" src="/below/'), s,
                    F.lit('.jpg">'))
    low = F.when(
        doc % 2 == 0,
        F.concat(F.lit('<img src="/ad/'), s,
                 F.lit('.gif" fetchpriority="low">')),
    ).otherwise(F.lit(""))
    page = F.concat(F.lit("<html><body>"), hero, body_img, lazy, low,
                    F.lit("</body></html>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), page.alias("body"))
    out = d.select(
        "doc_id",
        F.explode(img_fetch_priority(F.col("body"))).alias("img"),
    )
    return out.select(
        "doc_id",
        F.col("img.img_ord").cast("long").alias("img_ord"),
        F.col("img.url").alias("url"),
        F.col("img.priority").cast("long").alias("priority"),
    ).orderBy("doc_id", "img_ord")


ORACLE_IMG_FETCH_PRIORITY = """
WITH d AS (SELECT doc_id FROM documents),
imgs AS (
  SELECT doc_id, 0 AS img_ord, '/hero/' || doc_id || '.jpg' AS url,
         CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS priority
  FROM d
  UNION ALL
  -- when the hero is author-declared high, the body image is the FIRST
  -- UNDECORATED image and inherits the likely-LCP slot (priority 1)
  SELECT doc_id, 1, '/body/' || doc_id || '.jpg',
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END
  FROM d
  UNION ALL
  SELECT doc_id, 2, '/below/' || doc_id || '.jpg', 3 FROM d
  UNION ALL
  SELECT doc_id, 3, '/ad/' || doc_id || '.gif', 3
  FROM d WHERE doc_id % 2 = 0
)
SELECT doc_id, CAST(img_ord AS BIGINT) AS img_ord, url,
       CAST(priority AS BIGINT) AS priority
FROM imgs ORDER BY doc_id, img_ord
"""


# --------------------------------------------------------------------------
# image_hotlinks — data-driven first-party / shared-CDN / third-party
# --------------------------------------------------------------------------

def q_image_hotlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-host classification (linkgraph.classify_image_hosts): pages
    on site(doc%10).test embed first-party images (doc%5==0), a CDN
    shared by 6 page domains (doc%5 in 1..3), or a partner domain each
    referenced by exactly one page domain (doc%5==4); the oracle states
    the reference counts and classes from the construction."""
    from .linkgraph import classify_image_hosts

    doc = F.col("doc_id")
    page = F.concat(F.lit("site"), (doc % 10).cast("string"),
                    F.lit(".test"))
    img = (
        F.when(doc % 5 == 0, page)
        .when(doc % 5 == 4,
              F.concat(F.lit("partner"), (doc % 2).cast("string"),
                       F.lit(".test")))
        .otherwise(F.lit("cdn-shared.test"))
    )
    edges = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), page.alias("page_domain"),
        img.alias("img_domain"),
    )
    return classify_image_hosts(edges, shared_cdn_min_domains=3).orderBy(
        "doc_id"
    )


ORACLE_IMAGE_HOTLINKS = """
SELECT doc_id,
       'site' || (doc_id % 10) || '.test' AS page_domain,
       CASE WHEN doc_id % 5 = 0 THEN 'site' || (doc_id % 10) || '.test'
            WHEN doc_id % 5 = 4 THEN 'partner' || (doc_id % 2) || '.test'
            ELSE 'cdn-shared.test' END AS img_domain,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 0
                 WHEN doc_id % 5 = 4 THEN 1
                 ELSE 6 END AS BIGINT) AS n_ref_domains,
       CASE WHEN doc_id % 5 = 0 THEN 'first_party'
            WHEN doc_id % 5 = 4 THEN 'third_party'
            ELSE 'shared_cdn' END AS hotlink_class
FROM documents ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "image_variant_fold": q_image_variant_fold,
        "caption_boilerplate": q_caption_boilerplate,
        "bucket_batches": q_bucket_batches,
        "compaction_plan": q_compaction_plan,
        "sitemap_admission_xhost": q_sitemap_cross_host,
        "aimd_concurrency": q_aimd_concurrency,
        "redirect_loops": q_redirect_loops,
        "img_fetch_priority": q_img_fetch_priority,
        "image_hotlinks": q_image_hotlinks,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "image_variant_fold": ORACLE_VARIANT_FOLD,
        "caption_boilerplate": ORACLE_CAPTION_BOILERPLATE,
        "bucket_batches": ORACLE_BUCKET_BATCHES,
        "compaction_plan": ORACLE_COMPACTION_PLAN,
        "sitemap_admission_xhost": ORACLE_SITEMAP_CROSS_HOST,
        "aimd_concurrency": _oracle_aimd(),
        "redirect_loops": _oracle_redirect_loops(),
        "img_fetch_priority": ORACLE_IMG_FETCH_PRIORITY,
        "image_hotlinks": ORACLE_IMAGE_HOTLINKS,
    }
