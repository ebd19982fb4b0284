"""The operator suite: every (queries(), oracle_sql()) pair for the driver's
correctness gate, one entry per implemented operator from SURVEY.md §2.

Every query runs over the fixed parquet tables; DuckDB oracles express the
identical computation in ANSI SQL.  Column names and types are aligned on
both sides (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import extract, graph, politeness, robots
from .canon import canonicalize_expr

# --------------------------------------------------------------------------
# shared synthetic constructions (must stay in lockstep with oracle SQL)
# --------------------------------------------------------------------------

# messy URL exercising every canonicalization rule
def _messy_url(doc):
    return F.concat(
        F.lit("HTTP://H"),
        (doc % graph.NHOSTS).cast("string"),
        F.lit(".Example.TEST:80/d/"),
        doc.cast("string"),
        F.lit("?b="),
        (doc % 7).cast("string"),
        F.lit("&a="),
        (doc % 3).cast("string"),
        F.lit("#s"),
        doc.cast("string"),
    )


_MESSY_SQL = (
    "'HTTP://H' || CAST(doc % 10 AS VARCHAR) || '.Example.TEST:80/d/' || "
    "CAST(doc AS VARCHAR) || '?b=' || CAST(doc % 7 AS VARCHAR) || '&a=' || "
    "CAST(doc % 3 AS VARCHAR) || '#s' || CAST(doc AS VARCHAR)"
)
_CANON_SQL = (
    "'http://h' || CAST(doc % 10 AS VARCHAR) || '.example.test/d/' || "
    "CAST(doc AS VARCHAR) || '?a=' || CAST(doc % 3 AS VARCHAR) || '&b=' || "
    "CAST(doc % 7 AS VARCHAR)"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# crawl-core operators
# --------------------------------------------------------------------------

def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host throttle schedule (Throttler.php deterministic lower bound)."""
    pages = graph.pages(spark, sf_dir).withColumn("ord", F.col("doc"))
    sched = politeness.throttle_schedule(
        pages, host_col="host", ord_col="ord", latency_col="latency_ms"
    )
    return sched.select(
        "url", "host", "seq", "wait_ms", "fetch_start_ms", "fetch_end_ms"
    )


ORACLE_POLITENESS = f"""
WITH p AS (
  SELECT doc_id AS doc, doc_id % 10 AS hid,
         CAST(100 + (doc_id*37) % 900 AS BIGINT) AS lat
  FROM documents
), w AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY hid ORDER BY doc) AS seq,
         LAG(lat) OVER (PARTITION BY hid ORDER BY doc) AS prevlat
  FROM p
), w2 AS (
  SELECT *, CASE WHEN prevlat IS NULL THEN 0 ELSE GREATEST(250, prevlat) END AS wait
  FROM w
), w3 AS (
  SELECT *,
    COALESCE(SUM(lat) OVER (PARTITION BY hid ORDER BY doc
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlat,
    SUM(wait) OVER (PARTITION BY hid ORDER BY doc
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumwait
  FROM w3_src
)
SELECT {graph._URL_SQL} AS url, {graph._HOST_SQL} AS host,
       CAST(seq AS BIGINT) AS seq, CAST(wait AS BIGINT) AS wait_ms,
       CAST(cumlat + cumwait AS BIGINT) AS fetch_start_ms,
       CAST(cumlat + cumwait + lat AS BIGINT) AS fetch_end_ms
FROM w3
""".replace("w3_src", "w2")


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_rule canonicalization: scheme/host lowercase, default-port strip,
    query sort, fragment drop — pure Column expressions (JVM-side)."""
    doc = F.col("doc_id")
    return _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        canonicalize_expr(_messy_url(doc)).alias("url_norm"),
    )


ORACLE_CANON = f"""
SELECT doc_id, {_CANON_SQL.replace('doc %', 'doc_id %').replace('CAST(doc AS', 'CAST(doc_id AS')} AS url_norm
FROM documents
"""


def q_url_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 32-bit fingerprint of the canonical URL (md5-prefix;
    the engine's hot path uses xxhash64 which DuckDB can't replay)."""
    doc = F.col("doc_id")
    norm = canonicalize_expr(_messy_url(doc))
    fp = F.conv(F.substring(F.md5(norm), 1, 8), 16, 10).cast("long")
    return _docs(spark, sf_dir).select(
        doc.alias("doc_id"), norm.alias("url_norm"), fp.alias("fp")
    )


ORACLE_FP = f"""
WITH c AS ({ORACLE_CANON.strip()})
SELECT doc_id, url_norm,
       CAST(('0x' || substr(md5(url_norm), 1, 8)) AS BIGINT) AS fp
FROM c
"""


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-seen dedup as LEFT ANTI join (HttpCrawl.php:282,325 semantics)."""
    docs = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    frontier = docs.filter(doc % 3 == 0).select(
        doc.alias("doc"), graph.url_col(doc).alias("url")
    )
    seen = docs.filter(doc % 5 == 0).select(doc.alias("doc"))
    return frontier.join(seen, "doc", "left_anti").select("url")


ORACLE_SEEN = f"""
SELECT {graph._URL_SQL} AS url
FROM (SELECT doc_id AS doc FROM documents WHERE doc_id % 3 = 0
      AND doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 5 = 0))
"""


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution <= 10 hops (HttpLoader.php:430-470)."""
    from .engine import redirect_closure

    docs = _docs(spark, sf_dir)
    n = docs.count()
    doc = F.col("doc_id")
    is_r = (doc % 31).isin(7, 8)
    pages = docs.select(
        graph.url_col(doc).alias("url"),
        F.when(is_r, graph.url_col((doc + 1) % n)).alias("redirect_to"),
    )
    cl = redirect_closure(pages)
    return cl.select(
        F.col("fetch_url").alias("url"),
        F.element_at("chain", -1).alias("final_url"),
        F.size("chain").cast("long").alias("hops"),
    )


def oracle_redirect() -> str:
    url_of_d = graph._URL_SQL.replace("doc", "d")
    url_of_fin = graph._URL_SQL.replace("doc", "fin")
    return f"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
r AS (
  SELECT doc_id AS d,
         CASE WHEN doc_id % 31 IN (7,8) THEN (doc_id + 1) % nn.c END AS t
  FROM documents CROSS JOIN nn
),
c1 AS (
  SELECT a.d AS d, a.t AS h1, b.t AS h2
  FROM r a LEFT JOIN r b ON b.d = a.t
  WHERE a.t IS NOT NULL
),
c2 AS (
  SELECT d, COALESCE(h2, h1) AS fin,
         CASE WHEN h2 IS NULL THEN 1 ELSE 2 END AS hops
  FROM c1
)
SELECT {url_of_d} AS url, {url_of_fin} AS final_url, CAST(hops AS BIGINT) AS hops
FROM c2
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots gate: longest-match Allow/Disallow, broadcast rules join."""
    pages = graph.pages(spark, sf_dir).withColumn(
        "path", F.parse_url(F.col("url"), F.lit("PATH"))
    )
    hosts = [f"h{i}.{graph.DOMAIN}" for i in range(graph.NHOSTS)]
    rules = spark.createDataFrame(
        [(h, "*", ["/x/"], ["/x/1"], []) for h in hosts], robots.ROBOTS_SCHEMA
    )
    out = robots.with_robots_allowed(pages, rules)
    return out.filter("robots_allowed").select("url")


ORACLE_ROBOTS = f"""
SELECT {graph._URL_SQL} AS url
FROM (SELECT doc_id AS doc FROM documents)
WHERE doc % 23 <> 11 OR CAST(doc AS VARCHAR) LIKE '1%'
"""


def q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized anchor extraction: document order, tag-stripped normalized
    text (Dom/Node.php:108-120 whitespace rule)."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    doc = F.col("doc_id")
    body = F.concat(
        F.lit('<html><body><p>intro</p><a href="/d/'),
        ((2 * doc + 1) % n).cast("string"),
        F.lit('">Link   One</a> <a  href=\'/d/'),
        ((5 * doc + 3) % n).cast("string"),
        F.lit("'>Link <b>Two</b></a><a name=\"x\">no href</a></body></html>"),
    )
    parsed = docs.select(doc.alias("doc_id"), extract.extract_links_udf(body).alias("ls"))
    return parsed.select("doc_id", F.explode("ls").alias("l")).select(
        "doc_id",
        F.col("l.pos").alias("pos"),
        F.col("l.href").alias("href"),
        F.col("l.text").alias("text"),
    )


def oracle_link_extract() -> str:
    return """
WITH nn AS (SELECT COUNT(*) AS c FROM documents)
SELECT doc_id, CAST(0 AS INTEGER) AS pos,
       '/d/' || CAST((2*doc_id + 1) % nn.c AS VARCHAR) AS href,
       'Link One' AS text
FROM documents CROSS JOIN nn
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS pos,
       '/d/' || CAST((5*doc_id + 3) % nn.c AS VARCHAR) AS href,
       'Link Two' AS text
FROM documents CROSS JOIN nn
"""


def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap <loc> extraction via native JVM xpath (attribute-tolerant)."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    doc = F.col("doc_id")
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset xmlns="x" foo="bar"><url><loc> '),
        graph.url_col(doc),
        F.lit(" </loc></url><url><loc>"),
        graph.url_col((doc + 1) % n),
        F.lit("</loc></url></urlset>"),
    )
    locs = extract.sitemap_locs_xpath(xml)
    return docs.select(doc.alias("doc_id"), F.posexplode(locs).alias("pos", "loc")).select(
        "doc_id", F.col("pos").cast("int").alias("pos"), F.trim("loc").alias("loc")
    )


def oracle_sitemap() -> str:
    u1 = graph._URL_SQL.replace("doc %", "doc_id %").replace("CAST(doc AS", "CAST(doc_id AS")
    return f"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
n2 AS (SELECT doc_id, (doc_id + 1) % nn.c AS doc FROM documents CROSS JOIN nn)
SELECT doc_id, CAST(0 AS INTEGER) AS pos, {u1} AS loc FROM documents
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS pos, {graph._URL_SQL} AS loc FROM n2
"""


# --------------------------------------------------------------------------
# step algebra: filters (Filterable.php conjunction + OR-chain)
# --------------------------------------------------------------------------

def q_filter_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringFilter contains/startsWith/endsWith + OR-chain + negation."""
    d = _docs(spark, sf_dir)
    cond = F.col("text").contains("spark") & (
        F.col("text").startswith("the") | F.col("source").endswith("3")
    ) & ~F.col("lang").startswith("z")
    return d.filter(cond).select("doc_id")


ORACLE_FILTER_STRING = """
SELECT doc_id FROM documents
WHERE text LIKE '%spark%'
  AND (text LIKE 'the%' OR source LIKE '%3')
  AND NOT lang LIKE 'z%'
"""


def q_filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ComparisonFilter Gt/Lte/NotEqual (strict typed compares)."""
    e = _events(spark, sf_dir)
    return e.filter(
        (F.col("value") > 100.0)
        & (F.col("value") <= 180.0)
        & (F.col("event_type") != "error")
    ).select("event_id")


ORACLE_FILTER_CMP = """
SELECT event_id FROM events
WHERE value > 100.0 AND value <= 180.0 AND event_type <> 'error'
"""


def q_filter_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UrlFilter scheme/host/pathStartsWith/pathMatches via parse_url."""
    d = _docs(spark, sf_dir).select(
        F.col("doc_id"), graph.url_col(F.col("doc_id")).alias("url")
    )
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    scheme = F.substring_index(F.col("url"), "://", 1)
    return d.filter(
        (scheme == "http")
        & host.isin(f"h3.{graph.DOMAIN}", f"h7.{graph.DOMAIN}")
        & path.startswith("/d/")
        & path.rlike("[0-4]$")
    ).select("doc_id", "url")


ORACLE_FILTER_URL = f"""
SELECT doc_id, {graph._URL_SQL.replace('doc %', 'doc_id %').replace('CAST(doc AS', 'CAST(doc_id AS')} AS url
FROM documents
WHERE doc_id % 10 = 3 AND doc_id % 23 <> 11
"""


def q_filter_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayFilter::arrayHasElement with a nested equality filter."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return d.filter(F.exists(words, lambda w: w == F.lit("spark"))).select("doc_id")


ORACLE_FILTER_ARRAY = """
SELECT doc_id FROM documents
WHERE list_contains(str_split(text, ' '), 'spark')
"""


# --------------------------------------------------------------------------
# step algebra: refiners
# --------------------------------------------------------------------------

def q_refine_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringRefiner afterFirst/afterLast/beforeFirst/replace (trimmed)."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    tok2 = F.substring_index(F.substring_index(t, " ", 2), " ", -1)
    return d.select(
        "doc_id",
        F.trim(tok2).alias("second_token"),
        F.trim(F.substring_index(t, " ", -1)).alias("after_last"),
        F.trim(F.substring_index(t, " ", 1)).alias("before_first"),
        F.replace(F.substring_index(t, " ", 1), F.lit("a"), F.lit("X")).alias("replaced"),
    )


ORACLE_REFINE_STRING = """
SELECT doc_id,
       trim(split_part(text, ' ', 2)) AS second_token,
       trim(split_part(text, ' ', -1)) AS after_last,
       trim(split_part(text, ' ', 1)) AS before_first,
       replace(split_part(text, ' ', 1), 'a', 'X') AS replaced
FROM documents
"""


def q_refine_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateTimeRefiner::reformat (DateTime/DateTimeFormat.php:12-49)."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour_str"),
        F.date_format("ts", "EEEE").alias("weekday"),
    )


ORACLE_REFINE_DT = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:00') AS hour_str,
       strftime(ts, '%A') AS weekday
FROM events
"""


def q_refine_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UrlRefiner withScheme/withoutQuery/withFragment (UrlRefiner.php:15-58)."""
    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        doc, canonicalize_expr(_messy_url(doc)).alias("url")
    )
    u = F.col("url")
    no_query = F.substring_index(u, "?", 1)
    https_url = F.concat(F.lit("https://"), F.substring_index(u, "://", -1))
    with_frag = F.concat(no_query, F.lit("#top"))
    return d.select(
        "doc_id",
        no_query.alias("no_query"),
        https_url.alias("https_url"),
        with_frag.alias("with_frag"),
    )


ORACLE_REFINE_URL = f"""
WITH c AS ({ORACLE_CANON.strip()})
SELECT doc_id,
       split_part(url_norm, '?', 1) AS no_query,
       'https://' || substr(url_norm, 8) AS https_url,
       split_part(url_norm, '?', 1) || '#top' AS with_frag
FROM c
"""


# --------------------------------------------------------------------------
# step algebra: keep/collect, group zip, unique, limits, paginate, json, csv
# --------------------------------------------------------------------------

def q_keep_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result::set same-key append -> collect_list (Result.php:27-35)."""
    e = _events(spark, sf_dir)
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.array_join(F.array_sort(F.collect_list("event_type")), "|").alias("types_str"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


ORACLE_KEEP_COLLECT = """
SELECT user_id, COUNT(*) AS n_events,
       string_agg(event_type, '|' ORDER BY event_type) AS types_str,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY user_id
"""


def q_one_output_per_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    """oneOutputPerInput: explode then collapse back per input row
    (Step.php:89-94,264-291)."""
    d = _docs(spark, sf_dir)
    w = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
    return w.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.min("word").alias("min_word"),
        F.max("word").alias("max_word"),
    )


ORACLE_ONE_OUTPUT = """
SELECT doc_id,
       CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
       list_aggregate(str_split(text, ' '), 'min') AS min_word,
       list_aggregate(str_split(text, ' '), 'max') AS max_word
FROM documents
"""


def q_group_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group: parallel sub-steps over the same input, outputs zipped into one
    record (Group.php:44-67,146-157) -> multiple exprs in one select."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.hour("ts").cast("long").alias("branch_hour"),
        F.floor(F.col("value") / 50).cast("long").alias("branch_bucket"),
        F.upper("event_type").alias("branch_type"),
    )


ORACLE_GROUP_ZIP = """
SELECT event_id, CAST(hour(ts) AS BIGINT) AS branch_hour,
       CAST(floor(value / 50) AS BIGINT) AS branch_bucket,
       upper(event_type) AS branch_type
FROM events
"""


def q_unique_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqueOutputs(key) -> dropDuplicates (BaseStep.php:185-197)."""
    return _docs(spark, sf_dir).select("lang", "source").dropDuplicates()


ORACLE_UNIQUE = "SELECT DISTINCT lang, source FROM documents"


def q_max_outputs_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxOutputs(n) -> deterministic limit (BaseStep.php:726-736)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.orderBy("o_orderkey").limit(50).select("o_orderkey", "o_totalprice")


ORACLE_LIMIT = """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50
"""


PAGINATE_PAGE_SIZE = 300
PAGINATE_MAX_PAGES = 5  # Paginator.php MAX_PAGES_DEFAULT=1000, capped for test


def q_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Http::paginate driver loop: follow 'next page' until empty or
    maxPages (Paginate.php:35-78).  Page membership needs a global rank;
    computed with ranks.global_rank's two-phase plan (range partition +
    per-partition offsets) so no single-partition window touches the
    full relation."""
    from . import ranks

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rn = ranks.global_rank(
        o.select("o_orderkey"), "o_orderkey", out="rn"
    )
    rn = rn.persist()
    pages = []
    for p in range(PAGINATE_MAX_PAGES):
        page = rn.filter(
            (F.col("rn") > p * PAGINATE_PAGE_SIZE)
            & (F.col("rn") <= (p + 1) * PAGINATE_PAGE_SIZE)
        )
        agg = page.agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        ).withColumn("page", F.lit(p).cast("long"))
        rows = agg.collect()[0]
        if rows["n_orders"] == 0:  # stop rule: empty page
            break
        pages.append(agg)
    out = pages[0]
    for pdf in pages[1:]:
        out = out.unionByName(pdf)
    rn.unpersist()
    return out.select("page", "n_orders", "min_key", "max_key")


ORACLE_PAGINATE = f"""
WITH rn AS (
  SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders
)
SELECT CAST(floor((rn - 1) / {PAGINATE_PAGE_SIZE}) AS BIGINT) AS page,
       COUNT(*) AS n_orders, MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM rn
WHERE rn <= {PAGINATE_PAGE_SIZE * PAGINATE_MAX_PAGES}
GROUP BY 1
"""


def q_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Json::get dot-notation -> get_json_object (Json.php:19-38)."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


ORACLE_JSON = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def q_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Csv::parseString positional mapping -> from_csv (Csv.php:96-157)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    line = F.concat_ws(",", "c_name", F.col("c_custkey").cast("string"), "c_mktsegment")
    parsed = F.from_csv(line, "name STRING, custkey BIGINT, segment STRING")
    return c.select(parsed.alias("p")).select(
        F.col("p.name").alias("name"),
        F.col("p.custkey").alias("custkey"),
        F.col("p.segment").alias("segment"),
    )


ORACLE_CSV = """
WITH l AS (
  SELECT c_name || ',' || CAST(c_custkey AS VARCHAR) || ',' || c_mktsegment AS line
  FROM customer
)
SELECT split_part(line, ',', 1) AS name,
       CAST(split_part(line, ',', 2) AS BIGINT) AS custkey,
       split_part(line, ',', 3) AS segment
FROM l
"""


def q_html_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Html::metaData title + meta map (Html/MetaData.php:36-61)."""
    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    body = F.concat(
        F.lit("<html><head><title> Doc\n"),
        doc.cast("string"),
        F.lit('  </title><meta name="lang" content="'),
        F.col("lang"),
        F.lit('"><meta property="og:source" content="'),
        F.col("source"),
        F.lit('"></head><body></body></html>'),
    )
    meta = extract.extract_meta_udf(body)
    return d.select(
        "doc_id",
        extract.extract_title_udf(body).alias("title"),
        meta.getItem("lang").alias("meta_lang"),
        meta.getItem("og:source").alias("meta_source"),
    )


ORACLE_HTML_META = """
SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       lang AS meta_lang, source AS meta_source
FROM documents
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "politeness_schedule": q_politeness_schedule,
        "url_canonicalize": q_url_canonicalize,
        "url_fingerprint": q_url_fingerprint,
        "seen_antijoin": q_seen_antijoin,
        "redirect_resolve": q_redirect_resolve,
        "robots_filter": q_robots_filter,
        "link_extract": q_link_extract,
        "sitemap_extract": q_sitemap_extract,
        "filter_string": q_filter_string,
        "filter_comparison": q_filter_comparison,
        "filter_url": q_filter_url,
        "filter_array": q_filter_array,
        "refine_string": q_refine_string,
        "refine_datetime": q_refine_datetime,
        "refine_url": q_refine_url,
        "keep_collect": q_keep_collect,
        "one_output_per_input": q_one_output_per_input,
        "group_zip": q_group_zip,
        "unique_output": q_unique_output,
        "max_outputs_limit": q_max_outputs_limit,
        "paginate": q_paginate,
        "json_get": q_json_get,
        "csv_parse": q_csv_parse,
        "html_meta": q_html_meta,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "politeness_schedule": ORACLE_POLITENESS,
        "url_canonicalize": ORACLE_CANON,
        "url_fingerprint": ORACLE_FP,
        "seen_antijoin": ORACLE_SEEN,
        "redirect_resolve": oracle_redirect(),
        "robots_filter": ORACLE_ROBOTS,
        "link_extract": oracle_link_extract(),
        "sitemap_extract": oracle_sitemap(),
        "filter_string": ORACLE_FILTER_STRING,
        "filter_comparison": ORACLE_FILTER_CMP,
        "filter_url": ORACLE_FILTER_URL,
        "filter_array": ORACLE_FILTER_ARRAY,
        "refine_string": ORACLE_REFINE_STRING,
        "refine_datetime": ORACLE_REFINE_DT,
        "refine_url": ORACLE_REFINE_URL,
        "keep_collect": ORACLE_KEEP_COLLECT,
        "one_output_per_input": ORACLE_ONE_OUTPUT,
        "group_zip": ORACLE_GROUP_ZIP,
        "unique_output": ORACLE_UNIQUE,
        "max_outputs_limit": ORACLE_LIMIT,
        "paginate": ORACLE_PAGINATE,
        "json_get": ORACLE_JSON,
        "csv_parse": ORACLE_CSV,
        "html_meta": ORACLE_HTML_META,
    }


# --------------------------------------------------------------------------
# training-data pipeline: dedup / quality / langid / tokens / fingerprint
# --------------------------------------------------------------------------

from .textops import dedup as _dedup  # noqa: E402
from .textops import quality as _quality  # noqa: E402
from . import ann as _ann  # noqa: E402

_SHINGLE_SQL = (
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
    "for i in range(1, len(w) - 1)])"
)
_MD5H = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.exact_dedup(_docs(spark, sf_dir))


ORACLE_DEDUP_EXACT = f"""
SELECT content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM (SELECT doc_id, {_MD5H.format(x='text')} AS content_hash FROM documents)
GROUP BY content_hash
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.pairwise_ngram_jaccard(_docs(spark, sf_dir))


ORACLE_NGRAM_JACCARD = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS s
  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
)
SELECT a.doc_id AS doc_id,
       CAST(floor(1000 * len(list_intersect(a.s, b.s))
                  / len(list_distinct(a.s || b.s))) AS BIGINT) AS jaccard_permille
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
"""


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = _dedup.minhash_signature(_docs(spark, sf_dir), k=4)
    return sigs.select(
        "doc_id",
        *[F.element_at("sig", i + 1).alias(f"m{i}") for i in range(4)],
    )


def oracle_minhash() -> str:
    p = _dedup.HASH_P
    hs = _MD5H.format(x="s")
    cols = ", ".join(
        f"list_min(list_transform(hs, h -> ({_dedup.MINHASH_A[i]}*h + {_dedup.MINHASH_B[i]}) % {p})) AS m{i}"
        for i in range(4)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLE_SQL} AS s_list
  FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents)
), h AS (
  SELECT doc_id, list_transform(s_list, s -> {hs}) AS hs FROM sh
)
SELECT doc_id, {cols} FROM h
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.simhash16(_docs(spark, sf_dir))


def oracle_simhash() -> str:
    h = _MD5H.format(x="s")
    bits = " + ".join(
        f"CASE WHEN 2 * len(list_filter(hs, x -> (x >> {i}) & 1 = 1)) - len(hs) > 0 "
        f"THEN {2 ** i} ELSE 0 END"
        for i in range(16)
    )
    return f"""
WITH w AS (
  SELECT doc_id, list_distinct(str_split(text, ' ')) AS ws FROM documents
), h AS (
  SELECT doc_id, list_transform(ws, s -> {h}) AS hs FROM w
)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM h
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quality.token_count(_docs(spark, sf_dir))


ORACLE_TOKEN_COUNT = """
SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_tokens_est,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quality.quality_score(_docs(spark, sf_dir))


ORACLE_QUALITY = """
WITH w AS (
  SELECT doc_id, str_split(text, ' ') AS ws, CAST(length(text) AS BIGINT) AS nc
  FROM documents
), s AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, nc,
         CAST(len(list_filter(ws, x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS stopword_cnt
  FROM w
)
SELECT doc_id, n_words, stopword_cnt,
       CAST(floor(nc * 1000 / n_words) AS BIGINT) AS mean_word_len_milli,
       CAST(floor(stopword_cnt * 1000 / n_words) AS BIGINT) AS stop_permille,
       CAST(least(n_words, 100) * 5
            + least(CAST(floor(stopword_cnt * 1000 / n_words) AS BIGINT), 300) AS BIGINT) AS quality_score
FROM s
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quality.lang_id(_docs(spark, sf_dir))


def oracle_lang_id() -> str:
    def cnt(m):
        t = "(' ' || text || ' ')"
        return f"CAST((length({t}) - length(replace({t}, ' {m} ', ''))) / {len(m) + 2} AS BIGINT)"

    def score(lang):
        return " + ".join(cnt(m) for m in _quality.LANG_MARKERS[lang])

    return f"""
WITH s AS (
  SELECT doc_id, {score('en')} AS score_en, {score('de')} AS score_de,
         {score('fr')} AS score_fr
  FROM documents
)
SELECT doc_id, score_en, score_de, score_fr,
       CASE WHEN greatest(score_en, score_de, score_fr) = 0 THEN 'other'
            WHEN score_en = greatest(score_en, score_de, score_fr) THEN 'en'
            WHEN score_de = greatest(score_en, score_de, score_fr) THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM s
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quality.doc_fingerprint(_docs(spark, sf_dir))


ORACLE_DOC_FP = f"""
SELECT doc_id,
       {_MD5H.format(x="substr(text, 1, 64) || CAST(length(text) AS VARCHAR)")} AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
# similarity search over embeddings
# --------------------------------------------------------------------------

def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = _ann.brute_topk(emb, n_queries=10, k=5)
    return out.select("query_id", F.col("rank").alias("nn_rank"), "neighbor_id")


ORACLE_ANN_BRUTE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= 10),
s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
      FROM q CROSS JOIN c),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM s)
SELECT query_id, CAST(rnk AS BIGINT) AS nn_rank, neighbor_id
FROM r WHERE rnk <= 5
"""


def q_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _ann.lsh_buckets(emb)


def oracle_lsh_bucket() -> str:
    terms = " + ".join(
        f"CASE WHEN e[{4*j+1}] + e[{4*j+2}] - e[{4*j+3}] - e[{4*j+4}] > 0 "
        f"THEN {2 ** j} ELSE 0 END"
        for j in range(_ann.LSH_BITS)
    )
    return f"""
SELECT vec_id, CAST({terms} AS BIGINT) AS bucket
FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = _ann.lsh_topk(emb, n_queries=10, k=5)
    return out.select("query_id", F.col("rank").alias("nn_rank"), "neighbor_id")


def oracle_lsh_topk() -> str:
    terms = " + ".join(
        f"CASE WHEN e[{4*j+1}] + e[{4*j+2}] - e[{4*j+3}] - e[{4*j+4}] > 0 "
        f"THEN {2 ** j} ELSE 0 END"
        for j in range(_ann.LSH_BITS)
    )
    return f"""
WITH b AS (
  SELECT vec_id, e, CAST({terms} AS BIGINT) AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
),
q AS (SELECT vec_id AS query_id, e AS qv, bucket FROM b WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, e AS cv, bucket FROM b WHERE vec_id >= 10),
s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS sim
      FROM q JOIN c USING (bucket)),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM s)
SELECT query_id, CAST(rnk AS BIGINT) AS nn_rank, neighbor_id
FROM r WHERE rnk <= 5
"""


# --------------------------------------------------------------------------
# event-time operators (streaming concepts as batch)
# --------------------------------------------------------------------------

SESSION_GAP_US = 1_800_000_000  # 30 min


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (session windows, batch form)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_s = F.when(
        prev.isNull() | (ts_us - prev > SESSION_GAP_US), 1
    ).otherwise(0)
    sess = e.withColumn(
        "session_ord",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_ord").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.max("event_id").alias("last_event_id"),
    )


ORACLE_SESSIONIZE = f"""
WITH x AS (
  SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), y AS (
  SELECT *, CASE WHEN prev IS NULL
                 OR date_diff('microsecond', prev, ts) > {SESSION_GAP_US}
            THEN 1 ELSE 0 END AS new_s
  FROM x
), z AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_ord
  FROM y
)
SELECT user_id, session_ord, COUNT(*) AS n_events,
       MIN(event_id) AS first_event_id, MAX(event_id) AS last_event_id
FROM z GROUP BY user_id, session_ord
"""


def q_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window aggregation."""
    e = _events(spark, sf_dir)
    return e.groupBy(
        F.date_format(F.date_trunc("HOUR", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


ORACLE_WINDOW_AGG = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
       COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


_EXTRA_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_signature": q_minhash_signature,
    "simhash": q_simhash,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_bucket": q_ann_lsh_bucket,
    "ann_lsh_topk": q_ann_lsh_topk,
    "sessionize": q_sessionize,
    "window_agg": q_window_agg,
}

_EXTRA_ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "minhash_signature": oracle_minhash(),
    "simhash": oracle_simhash(),
    "token_count": ORACLE_TOKEN_COUNT,
    "quality_score": ORACLE_QUALITY,
    "lang_id": oracle_lang_id(),
    "doc_fingerprint": ORACLE_DOC_FP,
    "ann_brute_topk": ORACLE_ANN_BRUTE,
    "ann_lsh_bucket": oracle_lsh_bucket(),
    "ann_lsh_topk": oracle_lsh_topk(),
    "sessionize": ORACLE_SESSIONIZE,
    "window_agg": ORACLE_WINDOW_AGG,
}

_BASE_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _BASE_QUERIES()
    out.update(_EXTRA_QUERIES)
    return out


_BASE_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _BASE_ORACLES()
    out.update(_EXTRA_ORACLES)
    return out


# --------------------------------------------------------------------------
# step algebra round 2: template / BOM / retry / JSON-LD / DomQuery / subcrawler
# --------------------------------------------------------------------------

from . import steps as _steps  # noqa: E402


def q_template_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TemplateString [crwl:var] resolution (Utils/TemplateString.php:12-31)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    url = _steps.template_resolve(
        "http://[crwl:seg].shop.test/c/[crwl:key]",
        seg=F.lower("c_mktsegment"), key=F.col("c_custkey"),
    )
    return c.select(F.col("c_custkey").alias("custkey"), url.alias("url"))


ORACLE_TEMPLATE = """
SELECT c_custkey AS custkey,
       'http://' || lower(c_mktsegment) || '.shop.test/c/' ||
       CAST(c_custkey AS VARCHAR) AS url
FROM customer
"""


def q_bom_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 BOM strip on text inputs (Step.php:302-309)."""
    d = _docs(spark, sf_dir)
    with_bom = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit(_steps.BOM), F.col("text"))
    ).otherwise(F.col("text"))
    return d.select(
        "doc_id", _steps.strip_bom(with_bom).alias("clean")
    )


ORACLE_BOM = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN chr(65279) || text ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       CASE WHEN starts_with(t, chr(65279)) THEN substr(t, 2) ELSE t END AS clean
FROM x
"""


def q_retry_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """429/503 retry policy (RetryErrorResponseHandler.php:18-30,49-102)."""
    e = _events(spark, sf_dir)
    status = (
        F.when(F.col("value") < 100, 200)
        .when(F.col("value") < 200, 429)
        .otherwise(503)
    )
    retry_after = F.when(
        F.col("user_id") % 3 == 0, F.floor(F.col("value") / 10).cast("int")
    )
    d = e.select("event_id", status.alias("status"), retry_after.alias("retry_after"))
    return d.select(
        "event_id", "status",
        *_steps.retry_schedule_cols(F.col("status"), F.col("retry_after")),
    )


ORACLE_RETRY = """
WITH x AS (
  SELECT event_id,
         CASE WHEN value < 100 THEN 200 WHEN value < 200 THEN 429 ELSE 503 END AS status,
         CASE WHEN user_id % 3 = 0 THEN CAST(floor(value / 10) AS INTEGER) END AS ra
  FROM events
)
SELECT event_id, status,
  CAST(CASE WHEN status IN (429,503) AND ra IS NOT NULL AND ra > 0
            THEN least(ra * 1000, 60000)
            WHEN status IN (429,503) THEN 10000 ELSE 0 END AS BIGINT) AS retry_wait1_ms,
  CAST(CASE WHEN status IN (429,503) AND ra IS NOT NULL AND ra > 0
            THEN least(ra * 1000, 60000)
            WHEN status IN (429,503) THEN 60000 ELSE 0 END AS BIGINT) AS retry_wait2_ms,
  status IN (429,503) AS aborts_after_retries
FROM x
"""


def q_schema_org(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Html::schemaOrg JSON-LD extraction (Html/SchemaOrg.php:55-105)."""
    d = _docs(spark, sf_dir)
    body = F.concat(
        F.lit('<html><head><script type="application/ld+json">'
              '{"@type": "Product", "name": "Doc '),
        F.col("doc_id").cast("string"),
        F.lit('", "inLanguage": "'),
        F.col("lang"),
        F.lit('"}</script></head><body></body></html>'),
    )
    block = F.element_at(_steps.extract_ldjson_udf(body), 1)
    return d.select(
        "doc_id",
        F.get_json_object(block, "$['@type']").alias("ld_type"),
        F.get_json_object(block, "$.name").alias("ld_name"),
        F.get_json_object(block, "$.inLanguage").alias("ld_lang"),
    )


ORACLE_SCHEMA_ORG = """
SELECT doc_id, 'Product' AS ld_type,
       'Doc ' || CAST(doc_id AS VARCHAR) AS ld_name,
       lang AS ld_lang
FROM documents
"""


def q_dom_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DomQuery first/last/nth/even selection (Html/DomQuery.php:83-120)."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        _steps.dom_select(words, "first").alias("first_m"),
        _steps.dom_select(words, "last").alias("last_m"),
        _steps.dom_select(words, "nth", 3).alias("nth3_m"),
        F.size(_steps.dom_select(words, "even")).cast("long").alias("n_even"),
        F.size(_steps.dom_select(words, "odd")).cast("long").alias("n_odd"),
    )


ORACLE_DOM_QUERY = """
WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       ws[1] AS first_m, ws[-1] AS last_m, ws[3] AS nth3_m,
       CAST(len(ws) // 2 AS BIGINT) AS n_even,
       CAST((len(ws) + 1) // 2 AS BIGINT) AS n_odd
FROM w
"""


def q_sub_crawler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subCrawlerFor: run a child pipeline per parent output value and attach
    the child's results to the parent row (BaseStep.php:316-392) — here the
    child pipeline aggregates each order's lineitems."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    child = l.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.array_join(
            F.array_sort(F.collect_list(F.col("l_linenumber").cast("string"))), ","
        ).alias("line_numbers"),
    )
    return (
        o.join(child, o["o_orderkey"] == child["l_orderkey"], "left")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("line_numbers", F.lit("")).alias("line_numbers"),
        )
    )


ORACLE_SUB_CRAWLER = """
SELECT o.o_orderkey AS orderkey,
       COALESCE(c.n_lines, 0) AS n_lines,
       COALESCE(c.line_numbers, '') AS line_numbers
FROM orders o LEFT JOIN (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         string_agg(CAST(l_linenumber AS VARCHAR), ','
                    ORDER BY CAST(l_linenumber AS VARCHAR)) AS line_numbers
  FROM lineitem GROUP BY l_orderkey
) c ON c.l_orderkey = o.o_orderkey
"""


_EXTRA2_QUERIES = {
    "template_string": q_template_string,
    "bom_strip": q_bom_strip,
    "retry_schedule": q_retry_schedule,
    "schema_org": q_schema_org,
    "dom_query": q_dom_query,
    "sub_crawler": q_sub_crawler,
}

_EXTRA2_ORACLES = {
    "template_string": ORACLE_TEMPLATE,
    "bom_strip": ORACLE_BOM,
    "retry_schedule": ORACLE_RETRY,
    "schema_org": ORACLE_SCHEMA_ORG,
    "dom_query": ORACLE_DOM_QUERY,
    "sub_crawler": ORACLE_SUB_CRAWLER,
}

_PREV2_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _PREV2_QUERIES()
    out.update(_EXTRA2_QUERIES)
    return out


_PREV2_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _PREV2_ORACLES()
    out.update(_EXTRA2_ORACLES)
    return out


# --------------------------------------------------------------------------
# round 3: TPC-H anchor, robots sitemaps, html refiner, charset, cosine dedup
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation anchor (DECIMAL sums for cross-engine
    exactness; Spark partial aggregation + AQE do the heavy lifting)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - disc))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
            AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_sitemaps_from_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap::getSitemapsFromRobotsTxt (GetSitemapsFromRobotsTxt.php:28-35):
    per-host rules table -> exploded sitemap URLs (broadcast-sized)."""
    hosts = spark.range(graph.NHOSTS).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit("." + graph.DOMAIN)
                 ).alias("host"),
        F.array(
            F.concat(F.lit("http://h"), F.col("id").cast("string"),
                     F.lit("." + graph.DOMAIN + "/sitemap.xml")),
            F.concat(F.lit("http://h"), F.col("id").cast("string"),
                     F.lit("." + graph.DOMAIN + "/sitemap2.xml")),
        ).alias("sitemaps"),
    )
    return hosts.select("host", F.explode("sitemaps").alias("sitemap_url"))


ORACLE_SITEMAPS_ROBOTS = f"""
WITH h AS (SELECT DISTINCT doc_id % 10 AS i FROM documents)
SELECT 'h' || CAST(i AS VARCHAR) || '.{graph.DOMAIN}' AS host,
       'http://h' || CAST(i AS VARCHAR) || '.{graph.DOMAIN}/sitemap.xml' AS sitemap_url
FROM h
UNION ALL
SELECT 'h' || CAST(i AS VARCHAR) || '.{graph.DOMAIN}' AS host,
       'http://h' || CAST(i AS VARCHAR) || '.{graph.DOMAIN}/sitemap2.xml' AS sitemap_url
FROM h
"""


def q_html_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HtmlRefiner::remove(selector) (Refiners/Html/RemoveFromHtml.php):
    drop matching nodes, here <script> and class='ad' divs, then extract
    the remaining text."""
    d = _docs(spark, sf_dir)
    body = F.concat(
        F.lit("<html><body><script>bad()</script><div class=\"ad\">AD "),
        F.col("doc_id").cast("string"),
        F.lit("</div><p>keep "),
        F.col("lang"),
        F.lit("</p></body></html>"),
    )
    cleaned = F.regexp_replace(body, r"<script\b[^>]*>.*?</script>", "")
    cleaned = F.regexp_replace(cleaned, r"<div class=\"ad\">.*?</div>", "")
    text = F.trim(F.regexp_replace(F.regexp_replace(cleaned, r"<[^>]+>", " "), r"\s+", " "))
    return d.select("doc_id", text.alias("clean_text"))


ORACLE_HTML_REMOVE = """
SELECT doc_id, 'keep ' || lang AS clean_text FROM documents
"""


def q_charset_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniff/fix (Dom/HtmlDocument.php:63-86): latin-1 mojibake
    repair for the common win1252-in-utf8 cases, as an expression."""
    d = _docs(spark, sf_dir)
    # deterministic mojibake: 'Ã©' (utf-8 bytes of é read as latin-1)
    corrupted = F.concat(F.lit("cafÃ© "), F.col("source"))
    fixed = F.replace(corrupted, F.lit("Ã©"), F.lit("é"))
    return d.select("doc_id", fixed.alias("fixed_text"))


ORACLE_CHARSET = """
SELECT doc_id, 'caf' || chr(233) || ' ' || source AS fixed_text FROM documents
"""


def q_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate join,
    cosine >= threshold verification (the embedding analog of minhash-LSH
    dedup). Output is integer-only (permille) for oracle exactness."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = emb.select(
        F.col("vec_id"), F.col("embedding"),
        _ann.lsh_bucket_expr(F.col("embedding")).alias("bucket"),
    )
    a = b.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "bucket")
    c = b.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "bucket")
    pairs = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = _ann.cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.floor(sim * 1000).cast("long").alias("cos_permille"))
        .filter(F.col("cos_permille") >= 200)
    )


def oracle_embedding_pairs() -> str:
    terms = " + ".join(
        f"CASE WHEN e[{4*j+1}] + e[{4*j+2}] - e[{4*j+3}] - e[{4*j+4}] > 0 "
        f"THEN {2 ** j} ELSE 0 END"
        for j in range(_ann.LSH_BITS)
    )
    return f"""
WITH b AS (
  SELECT vec_id, e, CAST({terms} AS BIGINT) AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
),
p AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         list_cosine_similarity(a.e, c.e) AS sim
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
)
SELECT id_a, id_b, CAST(floor(sim * 1000) AS BIGINT) AS cos_permille
FROM p WHERE floor(sim * 1000) >= 200
"""


_EXTRA3_QUERIES = {
    "pricing_summary": q_pricing_summary,
    "sitemaps_from_robots": q_sitemaps_from_robots,
    "html_remove": q_html_remove,
    "charset_fix": q_charset_fix,
    "embedding_cosine_pairs": q_embedding_cosine_pairs,
}

_EXTRA3_ORACLES = {
    "pricing_summary": ORACLE_PRICING,
    "sitemaps_from_robots": ORACLE_SITEMAPS_ROBOTS,
    "html_remove": ORACLE_HTML_REMOVE,
    "charset_fix": ORACLE_CHARSET,
    "embedding_cosine_pairs": oracle_embedding_pairs(),
}

_PREV3_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _PREV3_QUERIES()
    out.update(_EXTRA3_QUERIES)
    return out


_PREV3_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _PREV3_ORACLES()
    out.update(_EXTRA3_ORACLES)
    return out


# --------------------------------------------------------------------------
# round 4: json each, xml, csv mapping, query-param pagination + stop rules,
# header merge, retry manager, cookie jar, proxy rotation, IVF ANN,
# string-length filter
# --------------------------------------------------------------------------

from . import paginate as _paginate  # noqa: E402


def q_json_each(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Json::each — explode a JSON subtree, one output per element, with
    dot-notation property mapping (src/Steps/Json.php:50-79).  The JSON body
    is built then honestly re-parsed via from_json + explode (all JVM)."""
    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    n = (F.lit(1) + doc % 3).cast("int")
    body = F.to_json(
        F.struct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct((doc * 10 + i).cast("long").alias("v")),
            ).alias("items")
        )
    )
    parsed = F.from_json(body, "struct<items: array<struct<v: long>>>")
    return d.select(doc.alias("doc_id"), parsed.alias("p")).select(
        "doc_id", F.explode(F.col("p.items")).alias("item")
    ).select("doc_id", F.col("item.v").alias("v"))


ORACLE_JSON_EACH = """
WITH j AS (
  SELECT doc_id,
         '{"items":[' || array_to_string(
           [ '{"v":' || CAST(doc_id*10 + i AS VARCHAR) || '}'
             for i in generate_series(1, 1 + doc_id % 3) ], ',') || ']}' AS body
  FROM documents
)
SELECT doc_id,
       CAST(unnest(json_extract_string(body, '$.items[*].v')) AS BIGINT) AS v
FROM j
"""


def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Xml step (src/Steps/Xml.php, Dom.php:51-127): XPath extraction over
    an XML body — native F.xpath (JVM), posexplode for per-node outputs."""
    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    n = (F.lit(1) + doc % 3).cast("int")
    body = F.concat(
        F.lit("<rows>"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat(
                    F.lit("<r><t>"), F.col("source"), F.lit("-"),
                    i.cast("string"), F.lit("</t></r>"),
                ),
            ),
            "",
        ),
        F.lit("</rows>"),
    )
    vals = F.xpath(body, F.lit("rows/r/t/text()"))
    return d.select(doc.alias("doc_id"), vals.alias("vals")).select(
        "doc_id", F.posexplode("vals").alias("pos0", "t")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("item_ord"), "t")


ORACLE_XML = """
SELECT doc_id, CAST(i AS BIGINT) AS item_ord,
       source || '-' || CAST(i AS VARCHAR) AS t
FROM (SELECT doc_id, source,
             unnest(generate_series(1, 1 + doc_id % 3)) AS i
      FROM documents)
"""


def q_csv_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Csv positional column mapping + skipFirstLine (src/Steps/Csv.php:
    27-42,96-157): map column 0 -> id, column 2 -> src, ignore the rest;
    the first line is a header and is skipped."""
    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    line = F.when(doc == 0, F.lit("id,lang,source,n_chars")).otherwise(
        F.concat_ws(
            ",",
            doc.cast("string"), F.col("lang"), F.col("source"),
            F.col("n_chars").cast("string"),
        )
    )
    # JVM from_csv (not regex split): separators inside enclosures stay
    # literal, same parser as the facade Csv step (Csv.php:96-157)
    parsed = d.select(
        doc.alias("line_no"),
        F.from_csv(line, "c0 STRING, c1 STRING, c2 STRING, c3 STRING").alias("p"),
    )
    return parsed.filter(F.col("line_no") > 0).select(
        F.col("p.c0").cast("long").alias("id"),
        F.col("p.c2").alias("src"),
    )


ORACLE_CSV_MAP = """
WITH lines AS (
  SELECT doc_id AS line_no,
         CASE WHEN doc_id = 0 THEN 'id,lang,source,n_chars'
              ELSE CAST(doc_id AS VARCHAR) || ',' || lang || ',' || source
                   || ',' || CAST(n_chars AS VARCHAR) END AS line
  FROM documents
)
SELECT CAST(str_split(line, ',')[1] AS BIGINT) AS id,
       str_split(line, ',')[3] AS src
FROM lines WHERE line_no > 0
"""


_PQP_CHAINS = 40


def q_paginate_query_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryParamsPaginator increase('page') + Contains stop rule over a
    synthetic listing corpus: chain c has 1 + c%5 pages, the last page body
    carries the stop needle."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < _PQP_CHAINS)
    doc = F.col("doc_id")
    last = (F.lit(1) + doc % 5).cast("int")
    pages = d.select(
        doc.alias("chain"), last.alias("last"),
        F.explode(F.sequence(F.lit(1), last)).alias("p"),
    ).select(
        F.concat(
            F.lit("http://h"), (F.col("chain") % graph.NHOSTS).cast("string"),
            F.lit("." + graph.DOMAIN + "/list/"), F.col("chain").cast("string"),
            F.lit("?page="), F.col("p").cast("string"), F.lit("&size=10"),
        ).alias("url"),
        F.when(F.col("p") == F.col("last"), F.lit("data LAST"))
        .otherwise(F.lit("data")).alias("body"),
    )
    starts = [
        f"http://h{c % graph.NHOSTS}.{graph.DOMAIN}/list/{c}?page=1&size=10"
        for c in range(_PQP_CHAINS)
    ]
    return _paginate.paginate_query_params(
        spark, pages, starts, param="page", by=1,
        stop_contains="LAST", max_pages=8,
    )


ORACLE_PQP = f"""
WITH c AS (
  SELECT doc_id AS chain_id, unnest(generate_series(1, 1 + doc_id % 5)) AS p
  FROM documents WHERE doc_id < {_PQP_CHAINS}
)
SELECT chain_id, CAST(p - 1 AS BIGINT) AS page_ord,
       'http://h' || CAST(chain_id % {graph.NHOSTS} AS VARCHAR)
       || '.{graph.DOMAIN}/list/' || CAST(chain_id AS VARCHAR)
       || '?page=' || CAST(p AS VARCHAR) || '&size=10' AS url
FROM c
"""


def q_http_headers_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HttpHeaders::normalize + merge + addTo (src/Utils/HttpHeaders.php:
    12-61) in the exploded (row_id, header_name, pos, value) representation:
    right-side values append unless already present, order preserved."""
    d = _docs(spark, sf_dir)

    def headers(*rows):
        return F.explode(
            F.array(*[
                F.struct(
                    F.lit(n).alias("header_name"),
                    F.lit(p).cast("long").alias("pos"),
                    v.alias("value"),
                )
                for (n, p, v) in rows
            ])
        )

    left = d.select(
        F.col("doc_id").alias("row_id"),
        headers(
            ("Accept", 1, F.lit("text/html")),
            ("X-Tag", 1, F.col("source")),
        ).alias("h"),
    ).select("row_id", "h.header_name", "h.pos", "h.value")
    right = d.select(
        F.col("doc_id").alias("row_id"),
        headers(
            ("Accept", 1, F.lit("text/html")),
            ("Accept", 2, F.lit("*/*")),
            ("X-New", 1, F.col("lang")),
        ).alias("h"),
    ).select("row_id", "h.header_name", "h.pos", "h.value")
    return _steps.merge_headers_df(left, right, id_col="row_id")


ORACLE_HEADERS = """
SELECT doc_id AS row_id, 'Accept' AS header_name, CAST(1 AS BIGINT) AS pos,
       'text/html' AS value FROM documents
UNION ALL
SELECT doc_id, 'Accept', CAST(2 AS BIGINT), '*/*' FROM documents
UNION ALL
SELECT doc_id, 'X-New', CAST(1 AS BIGINT), lang FROM documents
UNION ALL
SELECT doc_id, 'X-Tag', CAST(1 AS BIGINT), source FROM documents
"""


_RETRY_STATUSES = [200, 301, 404, 429, 503, 400, 500]


def q_retry_manager(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RetryManager::shallBeRetried with only()/except() status scoping
    (src/Loader/Http/Cache/RetryManager.php:22-49)."""
    e = _events(spark, sf_dir)
    status = F.element_at(
        F.array(*[F.lit(s) for s in _RETRY_STATUSES]),
        (F.col("event_id") % len(_RETRY_STATUSES) + 1).cast("int"),
    )
    return e.select(
        "event_id",
        status.cast("long").alias("status"),
        _steps.retry_filter(status).cast("long").alias("retry_default"),
        _steps.retry_filter(status, only=[429, 503]).cast("long")
        .alias("retry_only_429_503"),
        _steps.retry_filter(status, except_=[404]).cast("long")
        .alias("retry_except_404"),
    )


def oracle_retry_manager() -> str:
    cases = " ".join(
        f"WHEN {i} THEN {s}" for i, s in enumerate(_RETRY_STATUSES)
    )
    return f"""
WITH s AS (
  SELECT event_id,
         CAST(CASE event_id % {len(_RETRY_STATUSES)} {cases} END AS BIGINT) AS status
  FROM events
)
SELECT event_id, status,
       CAST(CASE WHEN status >= 400 THEN 1 ELSE 0 END AS BIGINT) AS retry_default,
       CAST(CASE WHEN status IN (429, 503) THEN 1 ELSE 0 END AS BIGINT)
         AS retry_only_429_503,
       CAST(CASE WHEN status >= 400 AND status <> 404 THEN 1 ELSE 0 END AS BIGINT)
         AS retry_except_404
FROM s
"""


def q_cookie_jar_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CookieJar domain matching (src/Loader/Http/Cookies/CookieJar.php:
    95-130): cookies are keyed by registrable domain and sent to any host
    under it; host-scoped cookies only match their exact host.

    Scale shape: "host == domain OR host endswith '.'+domain" is
    equivalent to an EQUI-join between the jar's domain key and the
    host's dot-suffix chain (<= #labels per host, bounded fan-out), so
    the plan is a hash join, never an O(requests x jar) nested loop —
    a real jar grows with hosts visited and cannot be nested-looped."""
    d = _docs(spark, sf_dir)
    reqs = d.select(
        "doc_id",
        F.concat(
            F.lit("h"), (F.col("doc_id") % graph.NHOSTS).cast("string"),
            F.lit("." + graph.DOMAIN),
        ).alias("host"),
    )
    jar = spark.createDataFrame(
        [(graph.DOMAIN, "sid"), (f"h3.{graph.DOMAIN}", "pref")],
        "domain STRING, cookie_name STRING",
    )
    labels = F.split(F.col("host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    expanded = reqs.select(
        "doc_id", F.explode(suffixes).alias("suffix")
    )
    return expanded.join(
        F.broadcast(jar), F.col("suffix") == F.col("domain")
    ).select("doc_id", "cookie_name")


ORACLE_COOKIES = f"""
SELECT doc_id, 'sid' AS cookie_name FROM documents
UNION ALL
SELECT doc_id, 'pref' FROM documents WHERE doc_id % {graph.NHOSTS} = 3
"""


_PROXIES = ["http://proxy0:8080", "http://proxy1:8080", "http://proxy2:8080"]


def q_proxy_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ProxyManager round-robin (src/Loader/Http/ProxyManager.php:32-45):
    the k-th request uses proxies[k % n]."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", _steps.proxy_for(F.col("doc_id"), _PROXIES).alias("proxy")
    )


def oracle_proxy() -> str:
    cases = " ".join(f"WHEN {i} THEN '{p}'" for i, p in enumerate(_PROXIES))
    return f"""
SELECT doc_id, CASE doc_id % {len(_PROXIES)} {cases} END AS proxy
FROM documents
"""


def q_filter_string_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StringLengthFilter — 6 comparison ops on strlen (byte length, PHP
    strlen; src/Steps/Filters/Enums/StringLengthFilterRule.php:19-31)."""
    d = _docs(spark, sf_dir)
    n = F.octet_length(F.col("text"))
    return d.filter(
        (n > 120) & (n <= 200) & (F.octet_length(F.col("lang")) == 2)
    ).select("doc_id", n.cast("long").alias("text_bytes"))


ORACLE_FILTER_STRLEN = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS text_bytes
FROM documents
WHERE strlen(text) > 120 AND strlen(text) <= 200
  AND strlen(lang) = 2
"""


_IVF = dict(n_queries=10, k=5, n_centroids=8, nprobe=2)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = _ann.ivf_topk(emb, **_IVF)
    return out.select("query_id", F.col("rank").alias("nn_rank"), "neighbor_id")


def oracle_ivf_topk() -> str:
    nq, k = _IVF["n_queries"], _IVF["k"]
    nc, npr = _IVF["n_centroids"], _IVF["nprobe"]
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id - {nq} AS cent_id, v AS cv FROM e
         WHERE vec_id >= {nq} AND vec_id < {nq + nc}),
assigned AS (
  SELECT neighbor_id, cv, cent_id FROM (
    SELECT c.vec_id AS neighbor_id, c.v AS cv, ct.cent_id,
           ROW_NUMBER() OVER (PARTITION BY c.vec_id
             ORDER BY list_cosine_similarity(c.v, ct.cv) DESC, ct.cent_id) AS arn
    FROM (SELECT * FROM e WHERE vec_id >= {nq}) c CROSS JOIN cent ct
  ) WHERE arn = 1
),
probes AS (
  SELECT query_id, qv, cent_id FROM (
    SELECT q.vec_id AS query_id, q.v AS qv, ct.cent_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.v, ct.cv) DESC, ct.cent_id) AS qrn
    FROM (SELECT * FROM e WHERE vec_id < {nq}) q CROSS JOIN cent ct
  ) WHERE qrn <= {npr}
),
s AS (
  SELECT p.query_id, a.neighbor_id,
         list_cosine_similarity(p.qv, a.cv) AS sim
  FROM probes p JOIN assigned a USING (cent_id)
),
r AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, CAST(rnk AS BIGINT) AS nn_rank, neighbor_id
FROM r WHERE rnk <= {k}
"""


_EXTRA4_QUERIES = {
    "json_each": q_json_each,
    "xml_extract": q_xml_extract,
    "csv_column_mapping": q_csv_column_mapping,
    "paginate_query_params": q_paginate_query_params,
    "http_headers_merge": q_http_headers_merge,
    "retry_manager": q_retry_manager,
    "cookie_jar_match": q_cookie_jar_match,
    "proxy_rotation": q_proxy_rotation,
    "filter_string_length": q_filter_string_length,
    "ann_ivf_topk": q_ann_ivf_topk,
}

_EXTRA4_ORACLES = {
    "json_each": ORACLE_JSON_EACH,
    "xml_extract": ORACLE_XML,
    "csv_column_mapping": ORACLE_CSV_MAP,
    "paginate_query_params": ORACLE_PQP,
    "http_headers_merge": ORACLE_HEADERS,
    "retry_manager": oracle_retry_manager(),
    "cookie_jar_match": ORACLE_COOKIES,
    "proxy_rotation": oracle_proxy(),
    "filter_string_length": ORACLE_FILTER_STRLEN,
    "ann_ivf_topk": oracle_ivf_topk(),
}

_PREV4_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _PREV4_QUERIES()
    out.update(_EXTRA4_QUERIES)
    return out


_PREV4_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _PREV4_ORACLES()
    out.update(_EXTRA4_ORACLES)
    return out


# --------------------------------------------------------------------------
# round 5: sitemap withData, Html::each
# --------------------------------------------------------------------------


def q_sitemap_with_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap::getUrlsFromSitemap()->withData() (src/Steps/Sitemap/
    GetUrlsFromSitemap.php:31-37,75-91): per <url> node emit
    (url, lastmod, changefreq, priority).  Four parallel native xpath
    pulls zipped + exploded — all JVM, one pass over the body."""
    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    n = (F.lit(1) + doc % 3).cast("int")
    freq = F.element_at(
        F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
        (doc % 3 + 1).cast("int"),
    )
    entry = lambda i: F.concat(
        F.lit("<url><loc>http://h"), (doc % graph.NHOSTS).cast("string"),
        F.lit("." + graph.DOMAIN + "/d/"), doc.cast("string"), F.lit("-"),
        i.cast("string"),
        F.lit("</loc><lastmod>2026-01-0"), ((doc + i) % 9 + 1).cast("string"),
        F.lit("</lastmod><changefreq>"), freq,
        F.lit("</changefreq><priority>0."), (i % 10).cast("string"),
        F.lit("</priority></url>"),
    )
    body = F.concat(
        F.lit("<urlset>"),
        F.array_join(F.transform(F.sequence(F.lit(1), n), entry), ""),
        F.lit("</urlset>"),
    )
    z = F.arrays_zip(
        F.xpath(body, F.lit("urlset/url/loc/text()")).alias("url"),
        F.xpath(body, F.lit("urlset/url/lastmod/text()")).alias("lastmod"),
        F.xpath(body, F.lit("urlset/url/changefreq/text()")).alias("changefreq"),
        F.xpath(body, F.lit("urlset/url/priority/text()")).alias("priority"),
    )
    # two-step: materialize the zipped array first — referencing doc_id from
    # inside the transform() lambda next to a same-select alias of doc_id
    # trips Spark's lateral-column-alias resolver (INTERNAL_ERROR)
    return d.withColumn("z", z).select(
        "doc_id", F.explode("z").alias("u")
    ).select(
        "doc_id", F.col("u.url").alias("url"), F.col("u.lastmod").alias("lastmod"),
        F.col("u.changefreq").alias("changefreq"),
        F.col("u.priority").alias("priority"),
    )


ORACLE_SITEMAP_DATA = f"""
WITH x AS (
  SELECT doc_id, unnest(generate_series(1, 1 + doc_id % 3)) AS i
  FROM documents
)
SELECT doc_id,
       'http://h' || CAST(doc_id % {graph.NHOSTS} AS VARCHAR) || '.{graph.DOMAIN}/d/'
         || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR) AS url,
       '2026-01-0' || CAST((doc_id + i) % 9 + 1 AS VARCHAR) AS lastmod,
       CASE doc_id % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
            ELSE 'monthly' END AS changefreq,
       '0.' || CAST(i % 10 AS VARCHAR) AS priority
FROM x
"""


def q_html_each(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Html::each(selector) with a mapped extraction (src/Steps/Dom.php:
    60-75,154-175): one output record per matched node.  The per-node field
    pulls are JVM regexp_extract_all over the body (our HTML path is
    regex-based — no lxml in this container), zipped + exploded."""
    d = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    n = (F.lit(1) + doc % 4).cast("int")
    item = lambda i: F.concat(
        F.lit('<div class="product"><h2>item-'), doc.cast("string"),
        F.lit("-"), i.cast("string"), F.lit("</h2><span class=\"price\">"),
        (doc * 10 + i * 3).cast("string"), F.lit("</span></div>"),
    )
    body = F.concat(
        F.lit("<html><body>"),
        F.array_join(F.transform(F.sequence(F.lit(1), n), item), ""),
        F.lit("</body></html>"),
    )
    names = F.regexp_extract_all(body, F.lit(r"<h2>([^<]*)</h2>"), 1)
    prices = F.regexp_extract_all(
        body, F.lit(r'<span class="price">(\d+)</span>'), 1
    )
    z = F.arrays_zip(names.alias("name"), prices.alias("price"))
    return d.withColumn("z", z).select(
        "doc_id", F.explode("z").alias("m")
    ).select(
        "doc_id", F.col("m.name").alias("name"),
        F.col("m.price").cast("long").alias("price"),
    )


ORACLE_HTML_EACH = """
SELECT doc_id,
       'item-' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR) AS name,
       CAST(doc_id * 10 + i * 3 AS BIGINT) AS price
FROM (SELECT doc_id, unnest(generate_series(1, 1 + doc_id % 4)) AS i
      FROM documents)
"""


_EXTRA5_QUERIES = {
    "sitemap_with_data": q_sitemap_with_data,
    "html_each": q_html_each,
}

_EXTRA5_ORACLES = {
    "sitemap_with_data": ORACLE_SITEMAP_DATA,
    "html_each": ORACLE_HTML_EACH,
}

_PREV5_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _PREV5_QUERIES()
    out.update(_EXTRA5_QUERIES)
    return out


_PREV5_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _PREV5_ORACLES()
    out.update(_EXTRA5_ORACLES)
    return out


# --------------------------------------------------------------------------
# round 6: end-to-end pipeline provenance (crawl -> validated image payloads)
# --------------------------------------------------------------------------

from . import pipeline as _pipeline  # noqa: E402
from .frontier import CrawlConfig as _CrawlConfig  # noqa: E402


def q_pipeline_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl->payload pipeline's SQL-expressible projection: one
    validated image+caption row per crawled page, with crawl provenance.
    Binary columns (bytes) and the numpy phash are excluded from the oracle
    compare; validity booleans are asserted as all-true counts instead."""
    t = _pipeline.crawl_to_image_table(spark, sf_dir, _CrawlConfig(max_depth=6))
    return t.filter(F.col("valid") & F.col("caption_ok")).select(
        "url", "depth", "ord", "image_id", "w", "h", "fmt", "caption"
    )


def oracle_pipeline() -> str:
    from . import graph as _g
    from .images import CAPTION_WORDS, FMTS

    bfs = _g.bfs_oracle_sql(6)
    fmt_cases = " ".join(f"WHEN {i} THEN '{f}'" for i, f in enumerate(FMTS))
    return f"""
WITH full_bfs AS (
{bfs}
), prov AS (
  SELECT url, depth, ord,
         CAST(regexp_extract(url, '/(\\d+)$', 1) AS BIGINT) AS doc_id
  FROM full_bfs
)
SELECT p.url, p.depth, p.ord,
       'img-' || CAST(p.doc_id AS VARCHAR) AS image_id,
       CAST(32 + p.doc_id % 32 AS INT) AS w,
       CAST(32 + p.doc_id % 24 AS INT) AS h,
       CASE p.doc_id % 3 {fmt_cases} END AS fmt,
       array_to_string(regexp_split_to_array(trim(d.text), '\\s+')[1:{CAPTION_WORDS}], ' ') AS caption
FROM prov p JOIN documents d ON d.doc_id = p.doc_id
"""


_EXTRA6_QUERIES = {"pipeline_provenance": q_pipeline_provenance}
_EXTRA6_ORACLES = {"pipeline_provenance": oracle_pipeline()}

_PREV6_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _PREV6_QUERIES()
    out.update(_EXTRA6_QUERIES)
    return out


_PREV6_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _PREV6_ORACLES()
    out.update(_EXTRA6_ORACLES)
    return out


# --------------------------------------------------------------------------
# round 7: UrlRefiner authority ops
# --------------------------------------------------------------------------


def q_refine_url_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UrlRefiner withHost/withPort/withoutPort/withPath
    (src/Steps/Refiners/Url/WithHost.php, WithPort.php, WithoutPort.php,
    WithPath.php) — authority rebuild as pure Column expressions."""
    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        doc, canonicalize_expr(_messy_url(doc)).alias("url")
    )
    u = F.col("url")
    scheme = F.substring_index(u, "://", 1)
    rest = F.substring_index(u, "://", -1)
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    host = F.substring_index(hostport, ":", 1)
    after = F.substring(rest, F.length(hostport) + 1, F.lit(2 ** 31 - 1))
    path_q = F.when(after == "", F.lit("/")).otherwise(after)
    return d.select(
        "doc_id",
        F.concat(scheme, F.lit("://mirror.example.org"), path_q).alias("with_host"),
        F.concat(scheme, F.lit("://"), host, F.lit(":8443"), path_q).alias("with_port"),
        F.concat(scheme, F.lit("://"), host, path_q).alias("without_port"),
        F.concat(scheme, F.lit("://"), host, F.lit("/alt"),
                 F.when(F.instr(path_q, "?") > 0,
                        F.concat(F.lit("?"), F.substring_index(path_q, "?", -1)))
                 .otherwise(F.lit(""))).alias("with_path"),
    )


ORACLE_REFINE_URL_AUTH = f"""
WITH c AS ({ORACLE_CANON.strip()}),
p AS (
  SELECT doc_id,
         split_part(url_norm, '://', 1) AS scheme,
         split_part(split_part(split_part(url_norm, '://', 2), '/', 1), '?', 1) AS hostport,
         substr(split_part(url_norm, '://', 2),
                strlen(split_part(split_part(split_part(url_norm, '://', 2), '/', 1), '?', 1)) + 1) AS after
  FROM c
), q AS (
  SELECT doc_id, scheme,
         split_part(hostport, ':', 1) AS host,
         CASE WHEN after = '' THEN '/' ELSE after END AS path_q
  FROM p
)
SELECT doc_id,
       scheme || '://mirror.example.org' || path_q AS with_host,
       scheme || '://' || host || ':8443' || path_q AS with_port,
       scheme || '://' || host || path_q AS without_port,
       scheme || '://' || host || '/alt' ||
         CASE WHEN instr(path_q, '?') > 0 THEN '?' || split_part(path_q, '?', 2)
              ELSE '' END AS with_path
FROM q
"""

_EXTRA7_QUERIES = {"refine_url_authority": q_refine_url_authority}
_EXTRA7_ORACLES = {"refine_url_authority": ORACLE_REFINE_URL_AUTH}

_PREV7_QUERIES = queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:  # noqa: F811
    out = _PREV7_QUERIES()
    out.update(_EXTRA7_QUERIES)
    return out


_PREV7_ORACLES = oracle_sql


def oracle_sql() -> dict[str, str]:  # noqa: F811
    out = _PREV7_ORACLES()
    out.update(_EXTRA7_ORACLES)
    return out


def event_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: for each user, the earliest time step 1
    occurred, the earliest step 2 STRICTLY AFTER that, the earliest
    step 3 strictly after step 2, ... — the sequence-respecting
    conversion measurement (a user who purchased before ever viewing
    does NOT count as converted).

    Dataflow shape per step: one filtered map-side-combined groupBy
    (min ts among qualifying events) + one equi-join on user — no
    window over the raw event stream, no per-user sort; at 10^10 events
    each step is a shuffle of O(users) rows after the partial min.

    Returns (user, steps_completed, t1_us..tk_us) with epoch-micro
    longs, NULL from the first uncompleted step on.
    """
    base = events.select(
        F.col(user_col), F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    users = base.select(user_col).distinct()
    out = users
    prev_col = None
    for i, step in enumerate(steps, start=1):
        cand = base.filter(F.col("et") == step)
        if prev_col is not None:
            cand = cand.join(out.select(user_col, prev_col), user_col).filter(
                F.col(prev_col).isNotNull() & (F.col("ts_us") > F.col(prev_col))
            )
        t = cand.groupBy(user_col).agg(F.min("ts_us").alias(f"t{i}_us"))
        out = out.join(t, user_col, "left")
        prev_col = f"t{i}_us"
    completed = None
    for i in range(1, len(steps) + 1):
        c = F.col(f"t{i}_us").isNotNull().cast("int")
        completed = c if completed is None else completed + c
    return out.withColumn("steps_completed", completed.cast("int"))
