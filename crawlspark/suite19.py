"""Round-2 continuation queries, part 17: hreflang reciprocity
validation, due-set conditional revalidation, caption language routing.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_hreflang


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# hreflang_reciprocal — one-way hreflang is spam/misconfiguration
# --------------------------------------------------------------------------

def q_hreflang_reciprocal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity check over hreflang declarations: (2k, 2k+1) en/de
    pairs back-reference each other (valid); every 5th page also
    declares an /xx/ orphan that never links back (invalid — search
    engines ignore one-way hreflang, and so should the variant-folding
    dedup).  One self-join of the declaration edge list on the reversed
    pair."""
    doc = F.col("doc_id")
    pair = (doc - doc % 2).cast("string")
    url_en = F.concat(F.lit("http://x.test/en/"), pair)
    url_de = F.concat(F.lit("http://x.test/de/"), pair)
    own = F.when(doc % 2 == 0, url_en).otherwise(url_de)
    other = F.when(doc % 2 == 0, url_de).otherwise(url_en)
    orphan = F.concat(F.lit("http://x.test/xx/"), doc.cast("string"))
    body = F.concat(
        F.lit('<link rel="alternate" hreflang="alt" href="'), other,
        F.lit('">'),
        F.when(doc % 5 == 0, F.concat(
            F.lit('<link rel="alternate" hreflang="xx" href="'), orphan,
            F.lit('">'))).otherwise(F.lit("")),
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), own.alias("page_url"), body.alias("body")
    )
    decls = pages.select(
        "doc_id", "page_url",
        F.explode(
            F.transform(extract_hreflang(F.col("body")), lambda a: a["url"])
        ).alias("alt_url"),
    )
    back = decls.select(
        F.col("page_url").alias("b_page"), F.col("alt_url").alias("b_alt")
    ).distinct()
    out = decls.join(
        back,
        (decls["alt_url"] == back["b_page"])
        & (decls["page_url"] == back["b_alt"]),
        "left",
    )
    return out.select(
        "doc_id", "page_url", "alt_url",
        F.col("b_page").isNotNull().alias("reciprocal"),
    )


ORACLE_HREFLANG_RECIP = """
WITH d AS (
  SELECT doc_id, CAST(doc_id - doc_id % 2 AS VARCHAR) AS pair,
         doc_id % 2 AS side
  FROM documents
)
SELECT doc_id,
       CASE WHEN side = 0 THEN 'http://x.test/en/' || pair
            ELSE 'http://x.test/de/' || pair END AS page_url,
       CASE WHEN side = 0 THEN 'http://x.test/de/' || pair
            ELSE 'http://x.test/en/' || pair END AS alt_url,
       TRUE AS reciprocal
FROM d
UNION ALL
SELECT doc_id,
       CASE WHEN side = 0 THEN 'http://x.test/en/' || pair
            ELSE 'http://x.test/de/' || pair END,
       'http://x.test/xx/' || CAST(doc_id AS VARCHAR),
       FALSE
FROM d WHERE doc_id % 5 = 0
"""


# --------------------------------------------------------------------------
# due_revalidation — recrawl due set x cache validators -> request batch
# --------------------------------------------------------------------------

_DR_NOW = 10_000_000


def q_due_revalidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed freshness chain: per-URL fetch history -> adaptive
    recrawl schedule (change-streak backoff) -> the DUE slice at now ->
    joined with cache validators -> conditional-GET plan.  Static pages
    that backed off past now stay out of the batch entirely; due pages
    with validators go out as cheap 304 candidates."""
    from .politeness import recrawl_schedule
    from .sinks import revalidation_plan

    doc = F.col("doc_id")
    s = doc.cast("string")
    url = F.concat(F.lit("http://r.test/p/"), s)
    # two fetches per url: changed for doc%3==0 (stays hot), unchanged
    # otherwise (backs off)
    h1 = _docs(spark, sf_dir).select(
        url.alias("url"), F.lit(1_000_000).cast("long").alias("fetch_ts"),
        F.concat(F.lit("v1-"), s).alias("content_hash"),
    )
    h2 = _docs(spark, sf_dir).select(
        url.alias("url"), F.lit(5_000_000).cast("long").alias("fetch_ts"),
        F.when(doc % 3 == 0, F.concat(F.lit("v2-"), s))
        .otherwise(F.concat(F.lit("v1-"), s)).alias("content_hash"),
    )
    sched = recrawl_schedule(h1.unionByName(h2))
    due = sched.filter(F.col("next_fetch_ts") <= _DR_NOW).select("url")
    cache = _docs(spark, sf_dir).select(
        url.alias("url"),
        F.when(doc % 2 == 0, F.concat(F.lit("e"), s)).alias("etag"),
        F.lit(None).cast("long").alias("last_modified_ts"),
        F.lit(5_000_000).cast("long").alias("fetched_ts"),
    )
    plan = revalidation_plan(
        cache.join(due, "url"), now_ts=_DR_NOW, ttl_s=3600
    )
    return plan.select("url", "action", "cond_header", "cond_value")


def _oracle_due_revalidation() -> str:
    # change-streak replay: doc%3==0 -> 2 changes, streak 0, interval
    # 3600 -> due. else 1 change then unchanged -> streak 1, interval
    # 7200 -> next = 5_000_000 + 7200 <= now -> ALSO due (now is far
    # out).  Both tiers are due; the plan splits on the etag parity.
    return f"""
SELECT 'http://r.test/p/' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 2 = 0 THEN 'revalidate' ELSE 'refetch' END
         AS action,
       CASE WHEN doc_id % 2 = 0 THEN 'If-None-Match' END AS cond_header,
       CASE WHEN doc_id % 2 = 0 THEN 'e' || CAST(doc_id AS VARCHAR) END
         AS cond_value
FROM documents
"""


# --------------------------------------------------------------------------
# caption_langs — language routing of harvested captions
# --------------------------------------------------------------------------

def q_caption_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang_id over the harvested image captions (marker-based n-gram
    heuristic on short text) — routes image+caption pairs to
    per-language training mixes; fixture captions carry each language's
    marker words."""
    from .textops.quality import lang_id

    doc = F.col("doc_id")
    s = doc.cast("string")
    cap = (
        F.when(doc % 3 == 0, F.concat(F.lit("the cat and the hat "), s))
        .when(doc % 3 == 1, F.concat(F.lit("der hund und die katze "), s))
        .otherwise(F.concat(F.lit("le chat et la maison "), s))
    )
    pairs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        cap.alias("text"),
    )
    return lang_id(pairs, text_col="text").select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string"))
        .alias("image_id"),
        F.col("pred_lang").alias("caption_lang"),
    )


ORACLE_CAPTION_LANGS = """
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
       CASE CAST(doc_id % 3 AS INTEGER)
         WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS caption_lang
FROM documents
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hreflang_reciprocal": q_hreflang_reciprocal,
        "due_revalidation": q_due_revalidation,
        "caption_langs": q_caption_langs,
        "safety_route": q_safety_route,
        "head_tail": q_head_tail,
        "indexnow": q_indexnow,
        "cloaking": q_cloaking,
        "corpus_report": q_corpus_report,
        "honeypot_links": q_honeypot_links,
        "retry_after_forms": q_retry_after_forms,
        "warc_revisits": q_warc_revisits,
        "bitext": q_bitext,
        "degree_cap": q_degree_cap,
        "retention": q_retention,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hreflang_reciprocal": ORACLE_HREFLANG_RECIP,
        "due_revalidation": _oracle_due_revalidation(),
        "caption_langs": ORACLE_CAPTION_LANGS,
        "safety_route": _oracle_safety_route(),
        "head_tail": ORACLE_HEAD_TAIL,
        "indexnow": ORACLE_INDEXNOW,
        "cloaking": ORACLE_CLOAKING,
        "corpus_report": ORACLE_CORPUS_REPORT,
        "honeypot_links": ORACLE_HONEYPOT,
        "retry_after_forms": _oracle_retry_after(),
        "warc_revisits": ORACLE_WARC_REVISITS,
        "bitext": ORACLE_BITEXT,
        "degree_cap": ORACLE_DEGREE_CAP,
        "retention": ORACLE_RETENTION,
    }


# --------------------------------------------------------------------------
# safety_route — three-way image safety gate (stub model, real plumbing)
# --------------------------------------------------------------------------

def q_safety_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """image_safety_route over an arithmetic phash fixture (Knuth
    multiplicative spread — the codec phash itself is not
    SQL-derivable): the frozen hashed-linear score + keep/review/drop
    thresholds, nibble arithmetic replayed exactly by the oracle."""
    from .mmcurate import image_safety_route

    doc = F.col("doc_id")
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        ((doc * 2654435761) % 9223372036854775783).cast("long")
        .alias("phash"),
    )
    return image_safety_route(imgs)


def _oracle_safety_route() -> str:
    from .mmcurate import (
        SAFETY_DROP_MICRO,
        SAFETY_REVIEW_MICRO,
        SAFETY_WEIGHTS_MICRO,
    )

    wlist = "list_value(" + ", ".join(str(w) for w in SAFETY_WEIGHTS_MICRO) + ")"
    terms = " + ".join(
        f"list_extract({wlist}, CAST(((ph >> {4 * k}) & 15) + 1 AS INTEGER))"
        for k in range(16)
    )
    return f"""
WITH p AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         (doc_id * 2654435761) % 9223372036854775783 AS ph
  FROM documents
),
s AS (SELECT image_id, CAST({terms} AS BIGINT) AS score FROM p)
SELECT image_id, score AS safety_micro,
       CASE WHEN score >= {SAFETY_DROP_MICRO} THEN 'drop'
            WHEN score >= {SAFETY_REVIEW_MICRO} THEN 'review'
            ELSE 'keep' END AS route
FROM s
"""


# --------------------------------------------------------------------------
# head_tail — over-budget document truncation
# --------------------------------------------------------------------------

def q_head_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """truncate_head_tail over the corpus text (24+8 budget): long docs
    keep their opening and conclusion with an ellipsis; short docs pass
    through byte-identical."""
    from .textops.curate import truncate_head_tail

    return truncate_head_tail(_docs(spark, sf_dir).select("doc_id", "text"))


ORACLE_HEAD_TAIL = """
WITH t AS (
  SELECT doc_id,
         list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       len(toks) > 32 AS truncated,
       CASE WHEN len(toks) <= 32
            THEN COALESCE(list_aggregate(toks, 'string_agg', ' '), '')
            ELSE list_aggregate(list_slice(toks, 1, 24), 'string_agg', ' ')
                 || ' ... ' ||
                 list_aggregate(list_slice(toks, len(toks) - 7, len(toks)),
                                'string_agg', ' ')
       END AS text_out
FROM t
"""


# --------------------------------------------------------------------------
# indexnow — per-host change-notification batches
# --------------------------------------------------------------------------

def q_indexnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """indexnow_batches at batch_max=40 over 5 hosts (~100 changed URLs
    each -> 3 batches per host, last one short): deterministic url-order
    packing, member arrays bounded per row.  Arrays compare exactly
    (DuckDB rebuilds the same sorted slices)."""
    from .sinks import indexnow_batches

    doc = F.col("doc_id")
    changed = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 5).cast("string")).alias("host"),
        F.concat(F.lit("http://h"), (doc % 5).cast("string"),
                 F.lit(".test/c/"), F.lpad(doc.cast("string"), 4, "0"))
        .alias("url"),
    )
    out = indexnow_batches(changed, batch_max=40)
    return out.select(
        "host", "batch_no", "n_urls",
        F.concat_ws("|", F.col("urls")).alias("urls_joined"),
    )


ORACLE_INDEXNOW = """
WITH c AS (
  SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS host,
         'http://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/c/' ||
           lpad(CAST(doc_id AS VARCHAR), 4, '0') AS url
  FROM documents
),
r AS (
  SELECT host, url,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) AS rn
  FROM c
)
SELECT host, CAST((rn - 1) // 40 AS BIGINT) AS batch_no,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       string_agg(url, '|' ORDER BY url) AS urls_joined
FROM r GROUP BY host, (rn - 1) // 40
"""


# --------------------------------------------------------------------------
# cloaking — UA-conditional content detection
# --------------------------------------------------------------------------

def q_cloaking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect_cloaking over paired bot/browser fetch views: every 7th
    URL serves a wholesale different page to the bot (cloaked); every
    11th differs only by a nonce (hash differs, tiny skew — NOT
    flagged); the rest are identical."""
    from .textops.quality import detect_cloaking

    doc = F.col("doc_id")
    s = doc.cast("string")
    url = F.concat(F.lit("http://c.test/p/"), s)
    bot = _docs(spark, sf_dir).select(
        url.alias("url"),
        F.when(doc % 7 == 0, F.concat(F.lit("spamA"), s))
        .when(doc % 11 == 0, F.concat(F.lit("nonceA"), s))
        .otherwise(F.concat(F.lit("same"), s)).alias("content_hash"),
        F.when(doc % 7 == 0, F.lit(500)).otherwise(F.lit(4000) + doc % 50)
        .cast("long").alias("n_chars"),
    )
    browser = _docs(spark, sf_dir).select(
        url.alias("url"),
        F.when(doc % 7 == 0, F.concat(F.lit("realB"), s))
        .when(doc % 11 == 0, F.concat(F.lit("nonceB"), s))
        .otherwise(F.concat(F.lit("same"), s)).alias("content_hash"),
        (F.lit(4000) + doc % 50 + F.when(doc % 11 == 0, 7).otherwise(0))
        .cast("long").alias("n_chars"),
    )
    return detect_cloaking(bot, browser)


ORACLE_CLOAKING = """
WITH d AS (
  SELECT doc_id,
         'http://c.test/p/' || CAST(doc_id AS VARCHAR) AS url,
         CASE WHEN doc_id % 7 = 0 THEN 'spamA' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 11 = 0 THEN 'nonceA' || CAST(doc_id AS VARCHAR)
              ELSE 'same' || CAST(doc_id AS VARCHAR) END AS bot_hash,
         CASE WHEN doc_id % 7 = 0 THEN 'realB' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 11 = 0 THEN 'nonceB' || CAST(doc_id AS VARCHAR)
              ELSE 'same' || CAST(doc_id AS VARCHAR) END AS browser_hash,
         CASE WHEN doc_id % 7 = 0 THEN 500
              ELSE 4000 + doc_id % 50 END AS bl,
         4000 + doc_id % 50 +
           CASE WHEN doc_id % 11 = 0 THEN 7 ELSE 0 END AS rl
  FROM documents
)
SELECT url, bot_hash, browser_hash,
       CAST((1000 * abs(bl - rl)) // GREATEST(GREATEST(bl, rl), 1)
         AS BIGINT) AS len_skew_permille,
       bot_hash <> browser_hash
         AND (1000 * abs(bl - rl)) // GREATEST(GREATEST(bl, rl), 1) > 300
         AS cloaked
FROM d
"""


# --------------------------------------------------------------------------
# corpus_report — one-row executive summary (query #200)
# --------------------------------------------------------------------------

def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus health summary a pipeline posts after every
    build: doc count, language count, dominant language + its permille
    share, mean/max document length — all integer, two map-side-combined
    aggregation levels (per-lang then rollup)."""
    d = _docs(spark, sf_dir)
    per_lang = d.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("ch"),
        F.max("n_chars").alias("mx"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), F.asc("lang"))
    top = per_lang.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") == 1
    ).select(F.col("lang").alias("top_lang"), F.col("n").alias("__topn"))
    tot = per_lang.agg(
        F.sum("n").alias("n_docs"), F.count("*").alias("n_langs"),
        F.sum("ch").alias("__ch"), F.max("mx").alias("max_chars"),
    )
    return tot.crossJoin(F.broadcast(top)).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_langs").cast("long").alias("n_langs"),
        "top_lang",
        F.expr("(1000 * __topn) div n_docs").cast("long")
        .alias("top_lang_permille"),
        F.expr("__ch div n_docs").cast("long").alias("mean_chars"),
        F.col("max_chars").cast("long").alias("max_chars"),
    )


ORACLE_CORPUS_REPORT = """
WITH per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS ch,
         CAST(MAX(n_chars) AS BIGINT) AS mx
  FROM documents GROUP BY lang
),
top AS (
  SELECT lang AS top_lang, n AS topn
  FROM per ORDER BY n DESC, lang LIMIT 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(ch) AS BIGINT) AS ch, MAX(mx) AS max_chars
  FROM per
)
SELECT n_docs, n_langs, top_lang,
       CAST((1000 * topn) // n_docs AS BIGINT) AS top_lang_permille,
       CAST(ch // n_docs AS BIGINT) AS mean_chars, max_chars
FROM tot, top
"""


# --------------------------------------------------------------------------
# honeypot_links — hidden anchors the frontier must not follow
# --------------------------------------------------------------------------

def q_honeypot_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hidden_links over a body with one visible anchor, a
    display:none trap, a visibility:hidden trap (doc%2==0 only), a
    bare-hidden-attribute trap, and an aria-hidden="true" anchor that
    must NOT flag (it is invisible to screen readers, not to eyes)."""
    from .extract import hidden_links

    doc = F.col("doc_id")
    s = doc.cast("string")
    body = F.concat(
        F.lit('<a href="/visible/'), s, F.lit('">ok</a>'),
        F.lit('<a style="display:none" href="/trap-d/'), s,
        F.lit('">t</a>'),
        F.when(doc % 2 == 0, F.concat(
            F.lit('<a style="visibility:hidden" href="/trap-v/'), s,
            F.lit('">t</a>'))).otherwise(F.lit("")),
        F.lit('<a hidden href="/trap-h/'), s, F.lit('">t</a>'),
        F.lit('<a aria-hidden="true" href="/aria/'), s, F.lit('">a</a>'),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", F.explode(hidden_links(F.col("body"))).alias("hidden_url")
    )


ORACLE_HONEYPOT = """
SELECT doc_id, '/trap-d/' || CAST(doc_id AS VARCHAR) AS hidden_url
FROM documents
UNION ALL
SELECT doc_id, '/trap-v/' || CAST(doc_id AS VARCHAR)
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, '/trap-h/' || CAST(doc_id AS VARCHAR)
FROM documents
"""


# --------------------------------------------------------------------------
# retry_after_forms — delta-seconds AND HTTP-date Retry-After
# --------------------------------------------------------------------------

_RA_NOW = 1_750_000_000  # fixed epoch second (UTC session)


def q_retry_after_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retry_after_seconds over all three header forms: a plain delta,
    an IMF-fixdate built from a known future epoch (parse must recover
    the exact delta), a PAST HTTP-date (clamps to 0), and garbage
    (null).  The date string is generated from the same epoch the
    oracle subtracts, so the expected wait is pure arithmetic."""
    from .robots import retry_after_seconds

    doc = F.col("doc_id")
    future = F.lit(_RA_NOW) + 300 + doc % 1000
    hdr = (
        F.when(doc % 4 == 0, (F.lit(60) + doc % 120).cast("string"))
        .when(doc % 4 == 1, F.concat(
            F.from_unixtime(future, "EEE, dd MMM yyyy HH:mm:ss"),
            F.lit(" GMT")))
        .when(doc % 4 == 2, F.concat(
            F.from_unixtime(F.lit(_RA_NOW - 500),
                            "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" GMT")))
        .otherwise(F.lit("soon"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), hdr.alias("header"))
    return d.select(
        "doc_id", "header",
        retry_after_seconds(F.col("header"), _RA_NOW).alias("wait_s"),
    )


def _oracle_retry_after() -> str:
    return f"""
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN CAST(60 + doc_id % 120 AS VARCHAR)
         WHEN 1 THEN strftime(to_timestamp({_RA_NOW} + 300 + doc_id % 1000),
                              '%a, %d %b %Y %H:%M:%S') || ' GMT'
         WHEN 2 THEN strftime(to_timestamp({_RA_NOW - 500}),
                              '%a, %d %b %Y %H:%M:%S') || ' GMT'
         ELSE 'soon'
       END AS header,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 60 + doc_id % 120
         WHEN 1 THEN 300 + doc_id % 1000
         WHEN 2 THEN 0
       END AS wait_s
FROM documents
"""


# --------------------------------------------------------------------------
# warc_revisits — response vs revisit record typing
# --------------------------------------------------------------------------

def q_warc_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """warc_record_types over a fetch log where every doc%4==0 payload
    is fetched three times (two later fetches become revisit records
    pointing at the first URL by (ts, url) order); unique payloads stay
    plain responses."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    base = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://w.test/a/"), s).alias("url"),
        (F.lit(1000) + doc).cast("long").alias("fetch_ts"),
        F.when(doc % 4 == 0, F.concat(F.lit("shared"), s))
        .otherwise(F.concat(F.lit("uniq"), s)).alias("content_hash"),
    )
    dups = _docs(spark, sf_dir).filter(doc % 4 == 0).select(
        F.explode(F.array(
            F.concat(F.lit("http://w.test/b/"), s),
            F.concat(F.lit("http://w.test/c/"), s),
        )).alias("url"),
        (F.lit(2000) + doc).cast("long").alias("fetch_ts"),
        F.concat(F.lit("shared"), s).alias("content_hash"),
    )
    from .warc import warc_record_types

    return warc_record_types(base.unionByName(dups))


ORACLE_WARC_REVISITS = """
SELECT 'http://w.test/a/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(1000 + doc_id AS BIGINT) AS fetch_ts,
       CASE WHEN doc_id % 4 = 0 THEN 'shared' ELSE 'uniq' END
         || CAST(doc_id AS VARCHAR) AS content_hash,
       'response' AS record_type,
       CAST(NULL AS VARCHAR) AS refers_to_url
FROM documents
UNION ALL
SELECT 'http://w.test/' || p.p || '/' || CAST(doc_id AS VARCHAR),
       CAST(2000 + doc_id AS BIGINT),
       'shared' || CAST(doc_id AS VARCHAR),
       'revisit',
       'http://w.test/a/' || CAST(doc_id AS VARCHAR)
FROM documents CROSS JOIN (VALUES ('b'), ('c')) AS p(p)
WHERE doc_id % 4 = 0
"""


# --------------------------------------------------------------------------
# bitext — translation-pair candidates from hreflang clusters
# --------------------------------------------------------------------------

def q_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitext_candidates over 3-doc clusters (en pivot + de + fr):
    de lengths stay plausible, every 3rd fr edition is a stub whose
    ratio falls below 500 permille and gets flagged implausible."""
    from .textops.curate import bitext_candidates

    doc = F.col("doc_id")
    g = (doc - doc % 3)
    lang = (
        F.when(doc % 3 == 0, F.lit("en"))
        .when(doc % 3 == 1, F.lit("de")).otherwise(F.lit("fr"))
    )
    n_chars = (
        F.when(doc % 3 == 0, F.lit(1000) + g % 500)
        .when(doc % 3 == 1, F.lit(1200) + g % 500)
        .otherwise(
            F.when(g % 9 == 0, F.lit(100))  # stub fr edition
            .otherwise(F.lit(900) + g % 500))
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("c"), g.cast("string")).alias("cluster_key"),
        doc.alias("doc_id"), lang.alias("lang"),
        n_chars.cast("long").alias("n_chars"),
    )
    return bitext_candidates(d)


ORACLE_BITEXT = """
WITH d AS (
  SELECT doc_id, doc_id - doc_id % 3 AS g,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS lang,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 1000 + (doc_id - doc_id % 3) % 500
           WHEN 1 THEN 1200 + (doc_id - doc_id % 3) % 500
           ELSE CASE WHEN (doc_id - doc_id % 3) % 9 = 0 THEN 100
                     ELSE 900 + (doc_id - doc_id % 3) % 500 END
         END AS n_chars
  FROM documents
),
pv AS (SELECT g, doc_id AS src_id, n_chars AS sl FROM d
       WHERE lang = 'en'),
other AS (SELECT g, doc_id AS tgt_id, lang AS tgt_lang, n_chars AS tl
          FROM d WHERE lang <> 'en')
SELECT 'c' || CAST(p.g AS VARCHAR) AS cluster_key,
       p.src_id, 'en' AS src_lang, o.tgt_id, o.tgt_lang,
       CAST((1000 * o.tl) // GREATEST(p.sl, 1) AS BIGINT)
         AS len_ratio_permille,
       (1000 * o.tl) // GREATEST(p.sl, 1) BETWEEN 500 AND 2000
         AS plausible
FROM pv p JOIN other o USING (g)
"""


# --------------------------------------------------------------------------
# degree_cap — supernode guard before graph jobs
# --------------------------------------------------------------------------

def q_degree_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cap_out_degree at cap=6 over a graph where every 10th source is
    a supernode with 15 out-edges (keeps its first 6 by dst order,
    src_degree still reports 15 so normalization stays honest) and the
    rest have 3."""
    from .linkgraph import cap_out_degree

    doc = F.col("doc_id")
    n_out = F.when(doc % 10 == 0, 15).otherwise(3)
    edges = _docs(spark, sf_dir).select(
        doc.alias("src"),
        F.explode(F.sequence(F.lit(1), n_out)).alias("__k"),
    ).select(
        "src",
        F.concat(F.lit("d"), F.lpad(F.col("__k").cast("string"), 2, "0"),
                 F.lit("-"), F.col("src").cast("string")).alias("dst"),
    )
    return cap_out_degree(edges, cap=6)


ORACLE_DEGREE_CAP = """
WITH e AS (
  SELECT doc_id AS src, k.generate_series AS k,
         CASE WHEN doc_id % 10 = 0 THEN 15 ELSE 3 END AS n_out
  FROM documents, generate_series(1, 15) AS k
  WHERE k.generate_series <= CASE WHEN doc_id % 10 = 0 THEN 15 ELSE 3 END
)
SELECT src,
       'd' || lpad(CAST(k AS VARCHAR), 2, '0') || '-' ||
         CAST(src AS VARCHAR) AS dst,
       CAST(n_out AS BIGINT) AS src_degree
FROM e WHERE k <= 6
"""


# --------------------------------------------------------------------------
# retention — keep-last-N capture sweep
# --------------------------------------------------------------------------

def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """retention_sweep keep_last=2 over URLs with 1-4 captures
    (doc%4+1): the newest two stay, older captures tombstone."""
    from .checkpoint import retention_sweep

    doc = F.col("doc_id")
    caps = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://a.test/p/"), doc.cast("string")).alias("url"),
        F.explode(F.sequence(F.lit(1), (doc % 4 + 1).cast("int")))
        .alias("__c"),
    ).select(
        "url", (F.lit(1000) + F.col("__c") * 100).cast("long")
        .alias("fetch_ts"),
    )
    return retention_sweep(caps, keep_last=2)


ORACLE_RETENTION = """
WITH c AS (
  SELECT 'http://a.test/p/' || CAST(doc_id AS VARCHAR) AS url,
         1000 + k.generate_series * 100 AS fetch_ts,
         doc_id % 4 + 1 AS n_caps
  FROM documents, generate_series(1, 4) AS k
  WHERE k.generate_series <= doc_id % 4 + 1
),
r AS (
  SELECT url, CAST(fetch_ts AS BIGINT) AS fetch_ts,
         CAST(ROW_NUMBER() OVER (PARTITION BY url ORDER BY fetch_ts DESC)
           AS BIGINT) AS capture_rank
  FROM c
)
SELECT url, fetch_ts, capture_rank, capture_rank <= 2 AS keep FROM r
"""
