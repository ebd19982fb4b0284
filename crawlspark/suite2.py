"""Round-2 oracle-checked queries: paginator stop rules, SimpleWebsitePaginator.

Same contract as :mod:`crawlspark.suite` (queries() + oracle_sql()), merged by
``__spark_entry__``.  Inputs are synthesized deterministically from the sf
tables so the DuckDB oracles can reconstruct expected outputs in closed form.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph, robots
from . import paginate as _paginate

_CHAINS = 40


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# Http::paginate stop-rule family (StopRules/IsEmptyInJson.php etc.)
# --------------------------------------------------------------------------

def q_paginate_stop_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryParamsPaginator + IsEmptyInJson('items') stop rule: chain c's
    JSON API serves items on pages 1..1+c%5 and an empty items array after;
    the empty page IS still requested (stop AFTER processing,
    StopRules/IsEmptyInJson.php + Contains.php:17-25 semantics)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < _CHAINS)
    doc = F.col("doc_id")
    last = (F.lit(1) + doc % 5).cast("int")
    pages = d.select(
        doc.alias("chain"), last.alias("last"),
        F.explode(F.sequence(F.lit(1), last + 1)).alias("p"),
    ).select(
        F.concat(
            F.lit("http://h"), (F.col("chain") % graph.NHOSTS).cast("string"),
            F.lit("." + graph.DOMAIN + "/api/"), F.col("chain").cast("string"),
            F.lit("?page="), F.col("p").cast("string"),
        ).alias("url"),
        F.when(
            F.col("p") <= F.col("last"),
            F.concat(F.lit('{"items": ['), F.col("p").cast("string"), F.lit("]}")),
        ).otherwise(F.lit('{"items": []}')).alias("body"),
    )
    starts = [
        f"http://h{c % graph.NHOSTS}.{graph.DOMAIN}/api/{c}?page=1"
        for c in range(_CHAINS)
    ]
    return _paginate.paginate_query_params(
        spark, pages, starts, param="page", by=1,
        stop_rule=_paginate.IsEmptyInJsonRule("items"), max_pages=10,
    )


ORACLE_PAGINATE_STOP = f"""
WITH c AS (
  SELECT doc_id AS chain_id, unnest(generate_series(1, 2 + doc_id % 5)) AS p
  FROM documents WHERE doc_id < {_CHAINS}
)
SELECT chain_id, CAST(p - 1 AS BIGINT) AS page_ord,
       'http://h' || CAST(chain_id % {graph.NHOSTS} AS VARCHAR)
       || '.{graph.DOMAIN}/api/' || CAST(chain_id AS VARCHAR)
       || '?page=' || CAST(p AS VARCHAR) AS url
FROM c
"""


def q_paginate_qp_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryParamsPaginator::paramsInBody().decreaseUsingDotNotation(
    'page.number'): the page selector lives in the form-encoded POST body
    (request identity = url + body, QueryParamsPaginator.php:40-54,87-113),
    the nested key renders as page[number]=, and chains walk DOWN from the
    last page; the final request (page 0) is still issued and finds no page
    — stop-on-missing, like the reference's dead getNextRequest."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < _CHAINS)
    doc = F.col("doc_id")
    last = (F.lit(1) + doc % 5).cast("int")
    pages = d.select(
        doc.alias("chain"), last.alias("last"),
        F.explode(F.sequence(F.lit(1), last)).alias("p"),
    ).select(
        F.concat(
            F.lit("http://h"), (F.col("chain") % graph.NHOSTS).cast("string"),
            F.lit("." + graph.DOMAIN + "/search/"), F.col("chain").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("page[number]="), F.col("p").cast("string"), F.lit("&size=10")
        ).alias("req_body"),
        F.lit("results").alias("body"),
    )
    starts, start_bodies = [], []
    for c in range(_CHAINS):
        starts.append(f"http://h{c % graph.NHOSTS}.{graph.DOMAIN}/search/{c}")
        start_bodies.append(f"page[number]={1 + c % 5}&size=10")
    return _paginate.paginate_query_params(
        spark, pages, starts,
        ops=[_paginate.decrease("page.number", 1, dot=True)],
        params_in_body=True, start_bodies=start_bodies, max_pages=10,
    )


ORACLE_QP_BODY = f"""
WITH c AS (
  SELECT doc_id AS chain_id, 1 + doc_id % 5 AS last,
         unnest(generate_series(0, 1 + doc_id % 5)) AS page_ord
  FROM documents WHERE doc_id < {_CHAINS}
)
SELECT chain_id, CAST(page_ord AS BIGINT) AS page_ord,
       'http://h' || CAST(chain_id % {graph.NHOSTS} AS VARCHAR)
       || '.{graph.DOMAIN}/search/' || CAST(chain_id AS VARCHAR) AS url,
       'page[number]=' || CAST(last - page_ord AS VARCHAR) || '&size=10'
         AS req_body
FROM c
"""


# --------------------------------------------------------------------------
# SimpleWebsitePaginator (CSS-selected links, FIFO, parent provenance)
# --------------------------------------------------------------------------

def _cat_url(chain, p):
    return F.concat(
        F.lit("http://h"), (chain % graph.NHOSTS).cast("string"),
        F.lit("." + graph.DOMAIN + "/cat/"), chain.cast("string"),
        F.lit("?p="), p.cast("string"),
    )


def q_website_paginator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimpleWebsitePaginator('.pagination'): chain c's page i links to
    pages i+1 and i+2 (clamped to 3+c%4); FIFO discovery visits pages in
    numeric order, each exactly once, with found_on = the page the link was
    FIRST discovered on (parent-request inheritance,
    SimpleWebsitePaginator.php:57-74,187-215)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < _CHAINS)
    doc = F.col("doc_id")
    last = (F.lit(3) + doc % 4).cast("int")
    base = d.select(
        doc.alias("chain"), last.alias("last"),
        F.explode(F.sequence(F.lit(0), last)).alias("p"),
    )
    link = lambda n: F.when(  # noqa: E731
        n <= F.col("last"),
        F.concat(
            F.lit('<a href="/cat/'), F.col("chain").cast("string"),
            F.lit('?p='), n.cast("string"), F.lit('">n</a>'),
        ),
    ).otherwise(F.lit(""))
    pages = base.select(
        _cat_url(F.col("chain"), F.col("p")).alias("url"),
        F.concat(
            F.lit('<html><body><div class="pagination">'),
            link(F.col("p") + 1), link(F.col("p") + 2),
            F.lit("</div></body></html>"),
        ).alias("body"),
    )
    starts = [
        f"http://h{c % graph.NHOSTS}.{graph.DOMAIN}/cat/{c}?p=0"
        for c in range(_CHAINS)
    ]
    return _paginate.website_paginate(spark, pages, starts, ".pagination")


ORACLE_WEBSITE_PAGINATOR = f"""
WITH c AS (
  SELECT doc_id AS chain_id, unnest(generate_series(0, 3 + doc_id % 4)) AS p
  FROM documents WHERE doc_id < {_CHAINS}
)
SELECT chain_id, CAST(p AS BIGINT) AS page_ord,
       'http://h' || CAST(chain_id % {graph.NHOSTS} AS VARCHAR)
       || '.{graph.DOMAIN}/cat/' || CAST(chain_id AS VARCHAR)
       || '?p=' || CAST(p AS VARCHAR) AS url,
       CASE WHEN p = 0 THEN NULL ELSE
         'http://h' || CAST(chain_id % {graph.NHOSTS} AS VARCHAR)
         || '.{graph.DOMAIN}/cat/' || CAST(chain_id AS VARCHAR)
         || '?p=' || CAST(CASE WHEN p = 1 THEN 0 ELSE p - 2 END AS VARCHAR)
       END AS found_on
FROM c
"""


# --------------------------------------------------------------------------
# Csv enclosure/escape (src/Steps/Csv.php:96-157)
# --------------------------------------------------------------------------

def q_csv_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Csv::parseString with quoted fields: embedded separators and escaped
    quotes inside the enclosure must stay literal (reference Csv.php
    separator/enclosure/escape handling).  Parsing is JVM from_csv; the
    oracle reconstructs the expected fields by formula."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    line = F.concat(
        F.lit('"'), F.col("c_name"), F.lit(', \\"Inc\\""'),
        F.lit(","), F.col("c_custkey").cast("string"),
        F.lit(","), F.col("c_mktsegment"),
    )
    parsed = F.from_csv(
        line, "name STRING, custkey BIGINT, segment STRING",
        {"sep": ",", "quote": '"', "escape": "\\"},
    )
    return c.select(parsed.alias("p")).select(
        F.col("p.name").alias("name"),
        F.col("p.custkey").alias("custkey"),
        F.col("p.segment").alias("segment"),
    )


ORACLE_CSV_QUOTED = """
SELECT c_name || ', "Inc"' AS name,
       CAST(c_custkey AS BIGINT) AS custkey,
       c_mktsegment AS segment
FROM customer
"""


# --------------------------------------------------------------------------
# Dom extraction step: CSS-selected nodes -> per-node records
# (src/Steps/Dom.php:44-160, Html/DomQuery.php:122-156)
# --------------------------------------------------------------------------

def q_dom_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dom(each='.item').extract(name=text, link=@href) over a synthesized
    listing corpus — one record per matched node, document order, via the
    regex-backed CSS engine (crawlspark.cssq)."""
    from .crawler import Dom

    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    item = lambda v: F.concat(  # noqa: E731
        F.lit('<li class="item"><span class="name">n'), v.cast("string"),
        F.lit('</span><a class="lnk" href="/d/'), v.cast("string"),
        F.lit('">x</a></li>'),
    )
    body = F.concat(
        F.lit("<html><body><ul>"),
        item(doc * 3 + 1), item(doc * 5 + 2),
        F.lit("</ul></body></html>"),
    )
    io = d.select(
        doc.alias("_input_id"),
        doc.alias("_ord"),
        F.struct(
            F.lit("http://x.test/").alias("url"),
            F.lit(200).alias("status"),
            body.alias("body"),
        ).alias("value"),
    )
    step = Dom(each=".item").extract({"name": ".name", "link": ".lnk @href"})
    out = step.apply(io)
    return out.select(
        F.col("_input_id").alias("doc_id"),
        (F.col("_ord") % 1000).cast("int").alias("pos"),
        F.col("value.name").alias("name"),
        F.col("value.link").alias("link"),
    )


ORACLE_DOM_EXTRACT = """
SELECT doc_id, CAST(0 AS INTEGER) AS pos,
       'n' || CAST(doc_id * 3 + 1 AS VARCHAR) AS name,
       '/d/' || CAST(doc_id * 3 + 1 AS VARCHAR) AS link
FROM documents
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS pos,
       'n' || CAST(doc_id * 5 + 2 AS VARCHAR) AS name,
       '/d/' || CAST(doc_id * 5 + 2 AS VARCHAR) AS link
FROM documents
"""


# --------------------------------------------------------------------------
# robots.txt: user-agent group selection + Google wildcard patterns
# --------------------------------------------------------------------------

def q_robots_ua_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host robots GROUP selection (RobotsTxtHandler.php:43-97 delegates
    to crwlr/robots-txt group matching; Google semantics: the group whose
    user-agent token appears in the crawler's UA wins, longest token first,
    '*' as fallback).  Every host publishes three groups — '*' (blocks all
    /d/), 'spark' (blocks /x/), and 'crawlspark' (blocks /d/<host-digit>) —
    and the crawler UA contains both tokens, so the LONGEST ('crawlspark')
    must be the one applied: /x/ pages come back allowed, /d/ pages are
    blocked only when the doc id starts with its host digit."""
    pages = graph.pages(spark, sf_dir).withColumn(
        "path", F.parse_url(F.col("url"), F.lit("PATH"))
    )
    rows = []
    for hid in range(graph.NHOSTS):
        h = f"h{hid}.{graph.DOMAIN}"
        rows.append((h, "*", ["/d/"], [], []))
        rows.append((h, "spark", ["/x/"], [], []))
        rows.append((h, "crawlspark", [f"/d/{hid}"], [], []))
    rules = spark.createDataFrame(rows, robots.ROBOTS_SCHEMA)
    out = robots.with_robots_allowed(
        pages, rules,
        user_agent="Mozilla/5.0 (compatible; CrawlSpark/2.0; spark fetcher)",
    )
    return out.filter("robots_allowed").select("url")


ORACLE_ROBOTS_UA_GROUP = f"""
SELECT {graph._URL_SQL} AS url
FROM (SELECT doc_id AS doc FROM documents)
WHERE doc % {graph.BLOCKED_MOD} = {graph.BLOCKED_RESIDUE}
   OR CAST(doc AS VARCHAR) NOT LIKE CAST(doc % {graph.NHOSTS} AS VARCHAR) || '%'
"""


def q_robots_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Google wildcard robots rules through the full gate: 'Disallow:
    /d/*1$' blocks /d/ paths ending in 1, but the LONGER 'Allow: /d/*11$'
    (longest-match wins, RobotsTxtHandler longest-rule semantics) re-admits
    paths ending in 11; /x/ paths match neither pattern and pass."""
    pages = graph.pages(spark, sf_dir).withColumn(
        "path", F.parse_url(F.col("url"), F.lit("PATH"))
    )
    hosts = [f"h{i}.{graph.DOMAIN}" for i in range(graph.NHOSTS)]
    rules = spark.createDataFrame(
        [(h, "*", ["/d/*1$"], ["/d/*11$"], []) for h in hosts],
        robots.ROBOTS_SCHEMA,
    )
    out = robots.with_robots_allowed(pages, rules)
    return out.filter("robots_allowed").select("url")


ORACLE_ROBOTS_WILDCARD = f"""
SELECT {graph._URL_SQL} AS url
FROM (SELECT doc_id AS doc FROM documents)
WHERE doc % {graph.BLOCKED_MOD} = {graph.BLOCKED_RESIDUE}
   OR CAST(doc AS VARCHAR) NOT LIKE '%1'
   OR CAST(doc AS VARCHAR) LIKE '%11'
"""


# --------------------------------------------------------------------------
# dedup: transitive near-dup group assignment (distributed CC)
# --------------------------------------------------------------------------

def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup-group assignment: the pair relation's connected
    components with min-id representatives, computed by the alternating
    large-star/small-star algorithm (dedup.connected_components — the step
    after LSH/phash pair generation that actual dedup needs, since near-dup
    similarity is not transitive but the drop-policy must be).

    The edge set is a deterministic block-local functional graph over
    doc_id — two families u -> blk + (a*u + c) % 64 within u's 64-id block
    — giving components with cycles, pendant trees and varied sizes that
    the oracle can replay in closed form and chase with a recursive CTE."""
    from .textops import dedup as _dedup

    docs = _docs(spark, sf_dir).select("doc_id")
    doc = F.col("doc_id")
    blk = (doc - doc % 64)
    e1 = docs.select(doc.alias("id_a"), (blk + (5 * doc + 3) % 64).alias("id_b"))
    e2 = docs.filter(doc % 3 == 0).select(
        doc.alias("id_a"), (blk + (17 * doc + 11) % 64).alias("id_b")
    )
    edges = (
        e1.union(e2)
        .filter(F.col("id_a") != F.col("id_b"))
        # the last block is partial: drop edges to nonexistent doc ids
        .join(docs.select(doc.alias("id_b")), "id_b", "semi")
    )
    cc = _dedup.connected_components(edges)
    return docs.join(cc, docs["doc_id"] == cc["node"], "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


ORACLE_DEDUP_COMPONENTS = """
WITH RECURSIVE
n AS (SELECT doc_id FROM documents),
e0 AS (
  SELECT doc_id AS a, (doc_id // 64) * 64 + (5 * doc_id + 3) % 64 AS b FROM n
  UNION ALL
  SELECT doc_id, (doc_id // 64) * 64 + (17 * doc_id + 11) % 64
  FROM n WHERE doc_id % 3 = 0
),
e AS (SELECT a, b FROM e0 WHERE a <> b AND b IN (SELECT doc_id FROM n)),
sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM n
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
)
SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
"""


# --------------------------------------------------------------------------
# dedup: the full MinHash-LSH pair pipeline, end to end vs the oracle
# --------------------------------------------------------------------------

def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete near-dup pair pipeline (shingle -> minhash -> band ->
    bucket join -> exact-Jaccard verify) oracle-checked end to end:
    every doc_id % 5 == 0 gets a one-word-appended variant at -(doc_id+1)
    (negative ids can never collide with real doc ids at ANY scale factor;
    jaccard >= 0.88 against its original by construction), and both
    engines must emit the identical verified pair set.  Band keys use the
    replayable mode (raw band-value strings) and the bucket cap is off so
    candidate generation is bit-for-bit reproducible in DuckDB."""
    from .textops import dedup as _dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % 5 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" ztail")).alias("text"),
    )
    corpus = docs.unionByName(variants)
    return _dedup.minhash_lsh_pairs(
        corpus, k=8, bands=4, jaccard_threshold=0.5,
        max_bucket_size=None, replayable_band_key=True,
    )


def _oracle_lsh_pairs() -> str:
    from .textops import dedup as _dedup

    p = _dedup.HASH_P
    shingle = (
        "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
        "for i in range(1, len(w) - 1)])"
    )
    md5h = "CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)"
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> "
        f"({_dedup.MINHASH_A[i]}*h + {_dedup.MINHASH_B[i]}) % {p})) AS m{i}"
        for i in range(8)
    )
    bkeys = ", ".join(
        f"CAST(m{2 * i} AS VARCHAR) || ',' || CAST(m{2 * i + 1} AS VARCHAR)"
        for i in range(4)
    )
    band_eq = " OR ".join(f"a.bkeys[{i + 1}] = b.bkeys[{i + 1}]" for i in range(4))
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT -doc_id - 1, text || ' ztail' FROM documents WHERE doc_id % 5 = 0
),
sh AS (
  SELECT doc_id, {shingle} AS s_list
  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM corpus)
),
h AS (
  SELECT doc_id, s_list, list_transform(s_list, s -> {md5h}) AS hs FROM sh
),
sig AS (SELECT doc_id, s_list, {sig_cols} FROM h),
banded AS (SELECT doc_id, s_list, [{bkeys}] AS bkeys FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.s_list AS sa, b.s_list AS sb
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({band_eq})
)
SELECT id_a, id_b,
       CAST(floor(1000 * len(list_intersect(sa, sb))
                  / len(list_distinct(sa || sb))) AS BIGINT) AS jaccard_permille
FROM cand
WHERE floor(1000 * len(list_intersect(sa, sb))
            / len(list_distinct(sa || sb))) >= 500
"""


# --------------------------------------------------------------------------
# image payload: the north-rule per-row invariants as an oracle row
# --------------------------------------------------------------------------

def q_image_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule image invariants, per row, through the REAL distributed
    codec path (generate_images -> validate_images, two Arrow-batched
    mapInPandas stages): lossless roundtrip for png, PSNR >= 40 dB for lossy
    formats, phash recomputed from decoded pixels equal to the stored phash,
    and caption equality vs the re-derivation from the document text.  The
    oracle states the invariant (all three booleans TRUE) plus the
    SQL-derivable metadata — any codec / phash / caption drift anywhere in
    the distributed path flips a boolean and fails the value hash."""
    from . import images as _images

    imgs = _images.generate_images(spark, sf_dir)
    v = _images.validate_images(imgs)
    docs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias("image_id"),
        _images.ref_caption_col(F.col("text")).alias("ref_caption"),
    )
    return v.join(docs, "image_id").select(
        "image_id", "fmt", "lossless_ok", "phash_match",
        (F.col("psnr_mdb") >= 40_000).alias("psnr_ok"),
        (F.col("caption") == F.col("ref_caption")).alias("caption_ok"),
    )


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image detection by phash hamming distance, banded
    (pigeonhole-exact recall, images.near_dup_images_by_phash).  Fixture:
    the REAL codec-path phashes (generate_images), plus planted copies for
    every doc_id % 5 == 0 whose phash is flipped in 1 + doc_id % 2 known
    bit positions (XOR mask built JVM-side).  Measured at sf0.01 the
    original phashes sit >= 13 bits apart pairwise, so with <= 2 planted
    bits every non-planted pair stays >= 9 > max_dist=6 away — the exact
    expected pair set is the planted one, which the oracle states from
    doc_id arithmetic alone."""
    pairs = _planted_near_dup_pairs(spark, sf_dir)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _planted_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture: codec-path phashes + planted flipped copies for
    doc_id % 5 == 0 (1 + doc_id % 2 known bit flips), through the banded
    near-dup operator at max_dist=6.  Expected pair set = exactly the
    planted (dup-d, img-d) pairs (originals >= 13 bits apart at sf0.01)."""
    from . import images as _images

    imgs = _images.generate_images(spark, sf_dir).select("image_id", "phash")
    d = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long")
    copies = (
        imgs.filter(d % 5 == 0)
        .select(F.col("phash"), d.alias("d"))
        .withColumn("p1", (F.col("d") % 64).cast("int"))
        .withColumn("p2", ((F.col("p1") + 1 + (F.col("d") % 63).cast("int")) % 64).cast("int"))
        .select(
            F.concat(F.lit("dup-"), F.col("d").cast("string")).alias("image_id"),
            F.col("phash").bitwiseXOR(
                F.expr("shiftleft(CAST(1 AS BIGINT), p1)").bitwiseXOR(
                    F.when(
                        F.col("d") % 2 == 1,
                        F.expr("shiftleft(CAST(1 AS BIGINT), p2)"),
                    ).otherwise(F.lit(0).cast("long"))
                )
            ).alias("phash"),
        )
    )
    return _images.near_dup_images_by_phash(imgs.unionByName(copies), max_dist=6)


ORACLE_IMAGE_NEAR_DUP = """
SELECT 'dup-' || CAST(doc_id AS VARCHAR) AS id_a,
       'img-' || CAST(doc_id AS VARCHAR) AS id_b,
       CAST(1 + doc_id % 2 AS BIGINT) AS hamming
FROM documents WHERE doc_id % 5 = 0
"""


def q_image_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dedup GROUPING: the planted phash near-dup pairs fed through
    distributed connected components (large-star/small-star,
    textops.dedup.connected_components) — the step that turns pairwise
    near-dup hits into keep-one-per-cluster groups.  Expected: each planted
    pair collapses to a 2-node component whose representative is the
    lexicographically smaller id ('dup-d' < 'img-d')."""
    from .textops import dedup as _dedup

    pairs = _planted_near_dup_pairs(spark, sf_dir)
    return _dedup.connected_components(pairs, src="id_a", dst="id_b").select(
        "node", "component"
    )


ORACLE_IMAGE_DEDUP_GROUPS = """
SELECT 'dup-' || CAST(doc_id AS VARCHAR) AS node,
       'dup-' || CAST(doc_id AS VARCHAR) AS component
FROM documents WHERE doc_id % 5 = 0
UNION ALL
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS node,
       'dup-' || CAST(doc_id AS VARCHAR) AS component
FROM documents WHERE doc_id % 5 = 0
"""


def q_pipeline_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end: BFS crawl -> image payload fetch + PSNR/caption
    validation -> LAION-style pair curation -> phash near-dup dedup
    grouping -> canonical training rows with aspect buckets
    (pipeline.training_set).  The oracle replays the BFS reachability CTE,
    the curation arithmetic from doc_id/text, and expects every kept row to
    survive dedup as its own representative (original codec phashes are
    >= 13 bits apart — any spurious banding pair would drop a row and fail
    the hash)."""
    from . import pipeline as _pipeline
    from .frontier import CrawlConfig as _CC

    return _pipeline.training_set(spark, sf_dir, _CC(max_depth=6))


def _oracle_training_set() -> str:
    from . import graph as _g

    return f"""
WITH full_bfs AS (
{_g.bfs_oracle_sql(6)}
), prov AS (
  SELECT depth, CAST(regexp_extract(url, '/(\\d+)$', 1) AS BIGINT) AS doc_id
  FROM full_bfs
), {_ORACLE_MM_SIGNALS.lstrip()},
kept AS (
  SELECT s.image_id, p.depth, s.w, s.h
  FROM sig s
  JOIN prov p ON s.image_id = 'img-' || CAST(p.doc_id AS VARCHAR)
  WHERE (2 * s.w >= s.h AND 2 * s.h >= s.w) AND LEAST(s.w, s.h) >= 40
    AND (s.n_cap_tokens >= 3 AND s.n_cap_tokens <= 32)
    AND s.digit_permille <= 300
)
SELECT image_id, depth,
       CASE WHEN 4 * w < 3 * h THEN 'tall'
            WHEN 3 * w > 4 * h THEN 'wide'
            ELSE 'square' END AS bucket
FROM kept
"""


def q_image_caption_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image+caption pair curation over the codec-path payload
    table: aspect ratio in [1/2, 2] (integer cross-multiply), shorter side
    >= 40 px, caption token count in [3, 32], digit share <= 30%%.  Pure
    JVM expressions (mmcurate.caption_pair_filter) — at 100 TB this is a
    narrow map fused into the scan.  The oracle re-derives w/h from doc_id
    (images.dims_for) and the caption from the document text."""
    from . import images as _images
    from . import mmcurate as _mm

    return _mm.caption_pair_filter(_images.generate_images(spark, sf_dir))


_ORACLE_CAPTION_SQL = """
array_to_string(list_slice(
  list_filter(str_split_regex(text, '[ \t\n\x0b\f\r]+'), x -> x <> ''),
  1, 10), ' ')
"""

_ORACLE_MM_SIGNALS = f"""
imgs AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         CAST(32 + doc_id % 32 AS BIGINT) AS w,
         CAST(32 + doc_id % 24 AS BIGINT) AS h,
         {_ORACLE_CAPTION_SQL} AS caption
  FROM documents
),
sig AS (
  SELECT image_id, w, h,
         CAST(CASE WHEN caption = '' THEN 0
              ELSE len(str_split(caption, ' ')) END AS BIGINT) AS n_cap_tokens,
         CAST(CASE WHEN len(caption) = 0 THEN 0
              ELSE FLOOR((len(caption) - len(regexp_replace(caption, '[0-9]', '', 'g')))
                         * 1000 / len(caption)) END AS BIGINT) AS digit_permille
  FROM imgs
)
"""

ORACLE_IMAGE_CAPTION_FILTER = f"""
WITH {_ORACLE_MM_SIGNALS}
SELECT image_id, n_cap_tokens, digit_permille,
       (2 * w >= h AND 2 * h >= w) AS ar_ok,
       LEAST(w, h) >= 40 AS size_ok,
       (n_cap_tokens >= 3 AND n_cap_tokens <= 32) AS cap_ok,
       digit_permille <= 300 AS digit_ok,
       (2 * w >= h AND 2 * h >= w) AND LEAST(w, h) >= 40
         AND (n_cap_tokens >= 3 AND n_cap_tokens <= 32)
         AND digit_permille <= 300 AS keep
FROM sig
"""


def q_image_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style aspect-bucket batch stats: every pair assigned to
    tall/square/wide by integer-exact thresholds (ar < 3/4, <= 4/3, > 4/3),
    then per-bucket pair count, kept count, and the pad-to pixel envelope.
    One map-side combined groupBy on a 3-value key."""
    from . import images as _images
    from . import mmcurate as _mm

    return _mm.aspect_bucket_stats(_images.generate_images(spark, sf_dir))


ORACLE_IMAGE_ASPECT_BUCKETS = f"""
WITH {_ORACLE_MM_SIGNALS}
SELECT CASE WHEN 4 * w < 3 * h THEN 'tall'
            WHEN 3 * w > 4 * h THEN 'wide'
            ELSE 'square' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN (2 * w >= h AND 2 * h >= w) AND LEAST(w, h) >= 40
                      AND (n_cap_tokens >= 3 AND n_cap_tokens <= 32)
                      AND digit_permille <= 300 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       MIN(w) AS min_w, MAX(w) AS max_w, MIN(h) AS min_h, MAX(h) AS max_h
FROM sig
GROUP BY 1
"""


def _oracle_image_invariants() -> str:
    from .images import FMTS

    fmt_cases = " ".join(f"WHEN {i} THEN '{f}'" for i, f in enumerate(FMTS))
    return f"""
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
       CASE doc_id % 3 {fmt_cases} END AS fmt,
       TRUE AS lossless_ok,
       TRUE AS phash_match,
       TRUE AS psnr_ok,
       TRUE AS caption_ok
FROM documents
"""


# --------------------------------------------------------------------------
# audio/video payloads: frame-sample plan + decoded invariants as oracle rows
# --------------------------------------------------------------------------

def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the real distributed path (generate_video ->
    sample_frames, Arrow-batched in-task explode): every 2nd frame of each
    per-doc video becomes a row.  The oracle replays the closed-form
    metadata (n_frames = 4 + doc%5, dims 16+doc%16 x 16+doc%12) — a wrong
    batch shape, off-by-one in the stride, or dropped video fails the
    row/hash compare."""
    from . import media as _media

    video = _media.generate_video(spark, sf_dir)
    return _media.sample_frames(video, every=2).select(
        "video_id", "frame_idx", "w", "h"
    )


ORACLE_VIDEO_FRAME_SAMPLE = """
SELECT 'vid-' || CAST(doc_id AS VARCHAR) AS video_id,
       CAST(unnest(generate_series(0, (4 + doc_id % 5) - 1, 2)) AS INT)
         AS frame_idx,
       CAST(16 + doc_id % 16 AS INT) AS w,
       CAST(16 + doc_id % 12 AS INT) AS h
FROM documents
"""


def q_audio_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + feature invariants per row: exact integer duration
    from metadata, and the lossless-roundtrip check (decoded samples ==
    regenerated reference) asserted TRUE through the distributed path.
    RMS/ZCR are numpy-computed (not SQL-replayable) and are covered by the
    numpy-differential pytest instead."""
    from . import media as _media

    audio = _media.generate_audio(spark, sf_dir)
    return _media.audio_features(audio).select(
        "audio_id", "duration_ms", "roundtrip_ok"
    )


ORACLE_AUDIO_INVARIANTS = """
SELECT 'aud-' || CAST(doc_id AS VARCHAR) AS audio_id,
       (1024 + doc_id % 512) * 1000
         // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
             ELSE 44100 END) AS duration_ms,
       TRUE AS roundtrip_ok
FROM documents
"""


# --------------------------------------------------------------------------
# winnowing fingerprints (MOSS): rolling k-gram hash + window minima
# --------------------------------------------------------------------------

def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints (k=8 char-grams, window w=4) over the
    documents table — the distinct window-minimum hash set per doc with
    first positions, bit-for-bit vs the oracle's list-comprehension
    replay."""
    from .textops import quality as _quality

    return _quality.winnow_fingerprints(_docs(spark, sf_dir), k=8, w=4)


ORACLE_WINNOW_FINGERPRINT = """
WITH g AS (
  SELECT doc_id,
         [CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 8)) AS BIGINT)
          for i in range(1, length(text) - 8 + 2)] AS hs
  FROM documents
),
w AS (
  SELECT doc_id,
         unnest([list_min(hs[j:j+3]) for j in range(1, len(hs) - 4 + 2)]) AS fp,
         unnest(generate_series(1, len(hs) - 4 + 1)) AS pos
  FROM g
)
SELECT doc_id, fp, MIN(pos) AS first_pos FROM w GROUP BY doc_id, fp
"""




# --------------------------------------------------------------------------
# continuous crawl (streaming foreachBatch) as an oracle-checked query
# --------------------------------------------------------------------------

_CC_DEPTH = 3
_CC_BATCHES = [[1, 2], [2, 333]]  # 333 is robots-blocked: seeds bypass the gate


def q_continuous_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two seed micro-batches through streaming.continuous_crawl (foreachBatch
    BFS with persistent cross-batch seen state): batch 0 crawls like the
    batch engine; batch 1 crawls only what batch 0 never reached (a page
    crawled by any earlier batch is neither re-crawled nor re-expanded).
    The oracle replays both BFS phases in SQL sharing one cumulative seen
    chain.  Returns (doc, depth, batch_id)."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    from .streaming import continuous_crawl

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    root = _tempfile.mkdtemp(prefix="cc_query_")
    seeds_dir = _os.path.join(root, "seeds")
    state_dir = _os.path.join(root, "state")
    _os.makedirs(seeds_dir)
    for i, batch in enumerate(_CC_BATCHES):
        p = _os.path.join(seeds_dir, f"b{i}.json")
        with open(p, "w") as f:
            for d in batch:
                f.write(_json.dumps({"doc": d}) + "\n")
        _os.utime(p, (1_000_000_000 + 100 * i,) * 2)
    continuous_crawl(spark, seeds_dir, state_dir, n=n, max_depth=_CC_DEPTH)
    # batch_id is a partition directory since the idempotent-sink change;
    # partition-column inference reads it as INT — cast back to the long
    # the oracle declares
    return spark.read.parquet(f"{state_dir}/results").select(
        "doc", "depth", F.col("batch_id").cast("long").alias("batch_id")
    )


def _oracle_continuous_crawl() -> str:
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "edges AS (",
        "  SELECT d.doc_id AS src, p.pos,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
        "seen_init AS (SELECT CAST(NULL AS BIGINT) AS doc WHERE FALSE),",
    ]
    prev_seen = "seen_init"
    selects = []
    for bi, batch in enumerate(_CC_BATCHES):
        vals = ",".join(f"({d})" for d in batch)
        l0 = f"b{bi}_l0"
        parts += [
            # seeds bypass the robots gate (batch-engine parity) but not
            # the cross-batch seen set
            f"{l0} AS (SELECT DISTINCT CAST(v AS BIGINT) AS doc",
            f"  FROM (VALUES {vals}) t(v)",
            f"  WHERE v NOT IN (SELECT doc FROM {prev_seen})),",
            f"b{bi}_s0 AS (SELECT doc FROM {prev_seen}"
            f" UNION ALL SELECT doc FROM {l0}),",
        ]
        selects.append(f"SELECT doc, CAST(0 AS BIGINT) AS depth,"
                       f" CAST({bi} AS BIGINT) AS batch_id FROM {l0}")
        for d in range(1, _CC_DEPTH + 1):
            p = d - 1
            parts += [
                f"b{bi}_l{d} AS (",
                f"  SELECT DISTINCT e.dst AS doc",
                f"  FROM b{bi}_l{p} l JOIN edges e ON e.src = l.doc",
                f"  WHERE e.dst NOT IN (SELECT doc FROM b{bi}_s{p})",
                f"    AND e.dst % {graph.BLOCKED_MOD} <> {graph.BLOCKED_RESIDUE}",
                "),",
                f"b{bi}_s{d} AS (SELECT doc FROM b{bi}_s{p}"
                f" UNION ALL SELECT doc FROM b{bi}_l{d}),",
            ]
            selects.append(f"SELECT doc, CAST({d} AS BIGINT) AS depth,"
                           f" CAST({bi} AS BIGINT) AS batch_id FROM b{bi}_l{d}")
        prev_seen = f"b{bi}_s{_CC_DEPTH}"
    sql = "\n".join(parts)
    # strip the trailing comma of the last CTE
    sql = sql.rstrip()
    assert sql.endswith("),")
    sql = sql[:-1]
    return sql + "\n" + " UNION ALL ".join(selects)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "paginate_stop_rules": q_paginate_stop_rules,
        "paginate_qp_body": q_paginate_qp_body,
        "website_paginator": q_website_paginator,
        "csv_quoted": q_csv_quoted,
        "dom_extract": q_dom_extract,
        "robots_ua_group": q_robots_ua_group,
        "robots_wildcard": q_robots_wildcard,
        "dedup_components": q_dedup_components,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "image_invariants": q_image_invariants,
        "image_near_dup": q_image_near_dup,
        "image_dedup_groups": q_image_dedup_groups,
        "image_caption_filter": q_image_caption_filter,
        "image_aspect_buckets": q_image_aspect_buckets,
        "pipeline_training_set": q_pipeline_training_set,
        "video_frame_sample": q_video_frame_sample,
        "audio_invariants": q_audio_invariants,
        "winnow_fingerprint": q_winnow_fingerprint,
        "continuous_crawl": q_continuous_crawl,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "paginate_stop_rules": ORACLE_PAGINATE_STOP,
        "paginate_qp_body": ORACLE_QP_BODY,
        "website_paginator": ORACLE_WEBSITE_PAGINATOR,
        "csv_quoted": ORACLE_CSV_QUOTED,
        "dom_extract": ORACLE_DOM_EXTRACT,
        "robots_ua_group": ORACLE_ROBOTS_UA_GROUP,
        "robots_wildcard": ORACLE_ROBOTS_WILDCARD,
        "dedup_components": ORACLE_DEDUP_COMPONENTS,
        "minhash_lsh_pairs": _oracle_lsh_pairs(),
        "image_invariants": _oracle_image_invariants(),
        "image_near_dup": ORACLE_IMAGE_NEAR_DUP,
        "image_dedup_groups": ORACLE_IMAGE_DEDUP_GROUPS,
        "image_caption_filter": ORACLE_IMAGE_CAPTION_FILTER,
        "image_aspect_buckets": ORACLE_IMAGE_ASPECT_BUCKETS,
        "pipeline_training_set": _oracle_training_set(),
        "video_frame_sample": ORACLE_VIDEO_FRAME_SAMPLE,
        "audio_invariants": ORACLE_AUDIO_INVARIANTS,
        "winnow_fingerprint": ORACLE_WINNOW_FINGERPRINT,
        "continuous_crawl": _oracle_continuous_crawl(),
    }
