"""Round-2 continuation queries, part 7: feed autodiscovery + parsing,
AMP/canonical folding, and content-addressed storage accounting.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying (or arithmetically stating) the identical result.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import amp_canonical_fold, discover_feeds, feed_items
from .sinks import content_store_stats


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# feed_discovery — RSS/Atom autodiscovery links
# --------------------------------------------------------------------------

def q_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed autodiscovery over a 3-shape corpus: an RSS link (doc%3==0),
    BOTH an Atom and an RSS link (doc%3==1 — order preserved), none
    (doc%3==2 contributes no rows)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    rss = F.concat(
        F.lit('<link rel="alternate" type="application/rss+xml" '
              'href="http://f.test/r'), s, F.lit('.xml">'))
    atom = F.concat(
        F.lit('<link rel="alternate" type="application/atom+xml" '
              'href="http://f.test/a'), s, F.lit('.xml">'))
    head = (
        F.when(doc % 3 == 0, rss)
        .when(doc % 3 == 1, F.concat(atom, rss))
        .otherwise(F.lit('<link rel="stylesheet" href="/s.css">'))
    )
    body = F.concat(F.lit("<html><head>"), head,
                    F.lit("</head><body></body></html>"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", F.explode(discover_feeds(F.col("body"))).alias("f")
    ).select(
        "doc_id",
        F.col("f.feed_url").alias("feed_url"),
        F.col("f.kind").alias("kind"),
    )


ORACLE_FEED_DISCOVERY = """
SELECT doc_id,
       'http://f.test/r' || CAST(doc_id AS VARCHAR) || '.xml' AS feed_url,
       'rss' AS kind
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'http://f.test/a' || CAST(doc_id AS VARCHAR) || '.xml',
       'atom'
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT doc_id, 'http://f.test/r' || CAST(doc_id AS VARCHAR) || '.xml',
       'rss'
FROM documents WHERE doc_id % 3 = 1
"""


# --------------------------------------------------------------------------
# feed_items — RSS <item> / Atom <entry> extraction
# --------------------------------------------------------------------------

def q_feed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed parsing: even docs are RSS feeds with two items
    (element-text links), odd docs Atom feeds with one entry
    (href-attribute link) — per-item block alignment is the point."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    rss_body = F.concat(
        F.lit("<rss><channel><item><link>http://n.test/p"), s,
        F.lit("a</link><title>ta "), (doc % 13).cast("string"),
        F.lit("</title><pubDate>D"), (doc % 28).cast("string"),
        F.lit("</pubDate></item><item><link>http://n.test/p"), s,
        F.lit("b</link><title>tb "), (doc % 7).cast("string"),
        F.lit("</title><pubDate>D"), (doc % 28).cast("string"),
        F.lit("</pubDate></item></channel></rss>"),
    )
    atom_body = F.concat(
        F.lit('<feed><entry><link href="http://n.test/e'), s,
        F.lit('"/><title>te '), (doc % 11).cast("string"),
        F.lit("</title><updated>U"), (doc % 30).cast("string"),
        F.lit("</updated></entry></feed>"),
    )
    body = F.when(doc % 2 == 0, rss_body).otherwise(atom_body)
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("body"))
    return d.select(
        "doc_id", F.explode(feed_items(F.col("body"))).alias("i")
    ).select(
        "doc_id",
        F.col("i.url").alias("url"),
        F.col("i.title").alias("title"),
        F.col("i.published").alias("published"),
    )


ORACLE_FEED_ITEMS = """
SELECT doc_id,
       'http://n.test/p' || CAST(doc_id AS VARCHAR) || 'a' AS url,
       'ta ' || CAST(doc_id % 13 AS VARCHAR) AS title,
       'D' || CAST(doc_id % 28 AS VARCHAR) AS published
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 'http://n.test/p' || CAST(doc_id AS VARCHAR) || 'b',
       'tb ' || CAST(doc_id % 7 AS VARCHAR),
       'D' || CAST(doc_id % 28 AS VARCHAR)
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 'http://n.test/e' || CAST(doc_id AS VARCHAR),
       'te ' || CAST(doc_id % 11 AS VARCHAR),
       'U' || CAST(doc_id % 30 AS VARCHAR)
FROM documents WHERE doc_id % 2 = 1
"""


# --------------------------------------------------------------------------
# amp_fold — AMP/alternate editions fold onto their canonical URL
# --------------------------------------------------------------------------

def q_amp_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMP folding: every 3rd page is an /amp/ edition carrying a
    rel=canonical back-link (folds, is_alternate), every 3rd declares a
    self-canonical (no-op), the rest have no canonical tag (no-op)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    canon_url = F.concat(F.lit("http://w.test/p"), s)
    url = F.when(doc % 3 == 0,
                 F.concat(F.lit("http://w.test/amp/p"), s)
                 ).otherwise(canon_url)
    body = (
        F.when(doc % 3 == 0, F.concat(
            F.lit('<link rel="canonical" href="'), canon_url, F.lit('">')))
        .when(doc % 3 == 1, F.concat(
            F.lit('<link rel="canonical" href="'), canon_url, F.lit('">')))
        .otherwise(F.lit("<html></html>"))
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), url.alias("url"), body.alias("body")
    )
    out = amp_canonical_fold(pages)
    return pages.select("doc_id").join(
        out.withColumn(
            "doc_id",
            F.regexp_extract(F.col("url"), r"p(\d+)$", 1).cast("long"),
        ),
        "doc_id",
    ).select("doc_id", "url", "fold_url", "is_alternate")


ORACLE_AMP_FOLD = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN 'http://w.test/amp/p' || CAST(doc_id AS VARCHAR)
            ELSE 'http://w.test/p' || CAST(doc_id AS VARCHAR) END AS url,
       'http://w.test/p' || CAST(doc_id AS VARCHAR) AS fold_url,
       doc_id % 3 = 0 AS is_alternate
FROM documents
"""


# --------------------------------------------------------------------------
# content_store — content-addressed storage accounting
# --------------------------------------------------------------------------

def q_content_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """content_store_stats over a corpus where content duplicates by
    doc_id%40 (mirror pages): per stored object the ref count and the
    bytes saved vs storing every fetch."""
    doc = F.col("doc_id")
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("h:"), (doc % 40).cast("string"))
        .alias("content_hash"),
        (F.lit(1000) + (doc % 40) * 13).cast("long").alias("n_bytes"),
    )
    return content_store_stats(pages)


ORACLE_CONTENT_STORE = """
WITH p AS (
  SELECT 'h:' || CAST(doc_id % 40 AS VARCHAR) AS content_hash,
         1000 + (doc_id % 40) * 13 AS n_bytes
  FROM documents
)
SELECT content_hash,
       CAST(COUNT(*) AS BIGINT) AS n_refs,
       CAST(MIN(n_bytes) AS BIGINT) AS bytes_stored,
       CAST(SUM(n_bytes) - MIN(n_bytes) AS BIGINT) AS bytes_saved
FROM p GROUP BY content_hash
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "feed_discovery": q_feed_discovery,
        "feed_items": q_feed_items,
        "amp_fold": q_amp_fold,
        "content_store": q_content_store,
        "cc_scrub": q_cc_scrub,
        "vocab_stats": q_vocab_stats,
        "www_fold": q_www_fold,
        "seen_occupancy": q_seen_occupancy,
        "frontier_prune": q_frontier_prune,
        "epoch_plan": q_epoch_plan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "feed_discovery": ORACLE_FEED_DISCOVERY,
        "feed_items": ORACLE_FEED_ITEMS,
        "amp_fold": ORACLE_AMP_FOLD,
        "content_store": ORACLE_CONTENT_STORE,
        "cc_scrub": ORACLE_CC_SCRUB,
        "vocab_stats": ORACLE_VOCAB_STATS,
        "www_fold": ORACLE_WWW_FOLD,
        "seen_occupancy": ORACLE_SEEN_OCCUPANCY,
        "frontier_prune": ORACLE_FRONTIER_PRUNE,
        "epoch_plan": ORACLE_EPOCH_PLAN,
    }


# --------------------------------------------------------------------------
# cc_scrub — Luhn-validated payment-card redaction
# --------------------------------------------------------------------------

def q_cc_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-card scrubbing on a constant-card fixture: two VALID test
    numbers (Visa 4111..., Amex 378282246310005) must redact; a
    checksum-failing neighbor (...1112) and an 18-nines run must
    survive untouched — Luhn is the gate, not the digit-run shape."""
    from .textops.curate import scrub_credit_cards

    doc = F.col("doc_id")
    text = F.when(
        doc % 2 == 0,
        F.lit("pay 4111111111111111 or 378282246310005 "
              "ref 4111111111111112 id 999999999999999999"),
    ).otherwise(F.lit("no cards here 555"))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return scrub_credit_cards(d)


ORACLE_CC_SCRUB = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0
            THEN 'pay [CC] or [CC] ref 4111111111111112 id 999999999999999999'
            ELSE 'no cards here 555' END AS clean_text,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_cc
FROM documents
"""


# --------------------------------------------------------------------------
# vocab_stats — per-language corpus vocabulary diagnostics
# --------------------------------------------------------------------------

def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vocab_stats grouped by the corpus lang column: token/type counts,
    hapax share, top-token share (integer permille), replayed by the
    oracle's two-level word aggregation."""
    from .textops.curate import vocab_stats

    return vocab_stats(_docs(spark, sf_dir).select("lang", "text"))


ORACLE_VOCAB_STATS = """
WITH words AS (
  SELECT lang AS g, w
  FROM documents,
       UNNEST(list_filter(str_split_regex(text, '\\s+'), x -> x <> ''))
         AS t(w)
),
wc AS (SELECT g, w, COUNT(*) AS c FROM words GROUP BY g, w),
agg AS (
  SELECT g,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         CAST(MAX(c) AS BIGINT) AS top
  FROM wc GROUP BY g
)
SELECT g AS lang, n_tokens, n_types,
       CAST((1000 * hapax) // n_types AS BIGINT) AS hapax_permille,
       CAST((1000 * top) // n_tokens AS BIGINT) AS top_token_permille
FROM agg
"""


# --------------------------------------------------------------------------
# www_fold — www-prefix host-alias dedup
# --------------------------------------------------------------------------

def q_www_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fold_www_dedup over a corpus where every 4th URL was seen under
    BOTH www and bare hosts (bare must win and fold the count); the rest
    under exactly one prefix (doc%2 picks which)."""
    from .canon import fold_www_dedup

    doc = F.col("doc_id")
    path = F.concat(F.lit("site"), (doc % 29).cast("string"),
                    F.lit(".test/p/"), doc.cast("string"))
    single = F.when(doc % 2 == 0,
                    F.concat(F.lit("http://www."), path)
                    ).otherwise(F.concat(F.lit("http://"), path))
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), path.alias("path"),
                                    single.alias("single_url"))
    dual = d.filter(doc % 4 == 0).select(
        F.explode(F.array(
            F.concat(F.lit("http://www."), F.col("path")),
            F.concat(F.lit("http://"), F.col("path")),
        )).alias("url")
    )
    rest = d.filter(doc % 4 != 0).select(F.col("single_url").alias("url"))
    return fold_www_dedup(dual.unionByName(rest))


ORACLE_WWW_FOLD = """
WITH d AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 29 AS VARCHAR) || '.test/p/' ||
           CAST(doc_id AS VARCHAR) AS path
  FROM documents
)
SELECT 'http://' || path AS hostless_key,
       'http://' || path AS url,
       CAST(2 AS BIGINT) AS n_variants
FROM d WHERE doc_id % 4 = 0
UNION ALL
SELECT 'http://' || path,
       CASE WHEN doc_id % 2 = 0 THEN 'http://www.' || path
            ELSE 'http://' || path END,
       CAST(1 AS BIGINT)
FROM d WHERE doc_id % 4 <> 0
"""


# --------------------------------------------------------------------------
# seen_occupancy — north-rule cuckoo filter health observable
# --------------------------------------------------------------------------

_OCC_BUCKETS = 16
_OCC_CAPACITY = 1024


def q_seen_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the partitioned cuckoo seen-filter over the corpus doc ids
    (16 buckets, capacity 1024) and report per-bucket occupancy — the
    fleet-health view of the north-rule seen structure.  n_keys is the
    distinct-key count per bucket (insert dedups), nothing saturates at
    this fill level; the oracle replays the bucket arithmetic."""
    from .seen import PartitionedSeenFilter, filter_occupancy

    f = PartitionedSeenFilter(spark, num_buckets=_OCC_BUCKETS,
                              capacity_per_bucket=_OCC_CAPACITY)
    keys = _docs(spark, sf_dir).select(F.col("doc_id").alias("k"))
    f.update(keys, "k")
    return filter_occupancy(f.states, _OCC_CAPACITY).select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_keys", "load_permille", "saturated",
    )


ORACLE_SEEN_OCCUPANCY = f"""
SELECT CAST(doc_id % {_OCC_BUCKETS} AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST((1000 * COUNT(*)) // {_OCC_CAPACITY} AS BIGINT)
         AS load_permille,
       FALSE AS saturated
FROM documents
GROUP BY doc_id % {_OCC_BUCKETS}
"""


# --------------------------------------------------------------------------
# frontier_prune — age + trap + dead-host compaction
# --------------------------------------------------------------------------

_PRUNE_NOW = 1_000_000
_PRUNE_MAX_AGE = 100_000


def q_frontier_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prune_frontier end to end: rows older than 100k s age out
    (doc%5==0 made stale), host h3 is dead (broadcast anti-join), and
    the mined trap template /t/N on host h1 drops its members; the
    oracle replays all three cuts."""
    from .scheduler import prune_frontier

    doc = F.col("doc_id")
    s = doc.cast("string")
    host = F.concat(F.lit("h"), (doc % 7).cast("string"))
    url = F.when(
        doc % 3 == 0, F.concat(F.lit("http://"), host, F.lit(".test/t/"), s)
    ).otherwise(F.concat(F.lit("http://"), host, F.lit(".test/p/"), s))
    ts = F.when(doc % 5 == 0, F.lit(_PRUNE_NOW - 200_000)
                ).otherwise(F.lit(_PRUNE_NOW - 50_000))
    frontier = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), host.alias("host"), url.alias("url"),
        ts.cast("long").alias("enqueued_ts"),
    )
    traps = spark.createDataFrame(
        # url_template collapses EVERY digit run, including the host's
        # ('h1' -> 'hN') — the mined template is the fully collapsed form
        [("h1.test", "http://hN.test/t/N", True)],
        "host STRING, template STRING, trap BOOLEAN",
    )
    # NOTE: host in the frontier is 'hX' but url authority is 'hX.test';
    # the trap table keys on the URL-template's host form
    frontier = frontier.withColumn(
        "host", F.concat(F.col("host"), F.lit(".test"))
    )
    dead = spark.createDataFrame([("h3.test",)], "host STRING")
    out = prune_frontier(
        frontier, now_ts=_PRUNE_NOW, max_age_s=_PRUNE_MAX_AGE,
        trap_templates=traps, dead_hosts=dead,
    )
    return out.select("doc_id", "host", "url", "enqueued_ts")


ORACLE_FRONTIER_PRUNE = f"""
WITH f AS (
  SELECT doc_id,
         'h' || CAST(doc_id % 7 AS VARCHAR) || '.test' AS host,
         CASE WHEN doc_id % 3 = 0
              THEN 'http://h' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.test/t/' || CAST(doc_id AS VARCHAR)
              ELSE 'http://h' || CAST(doc_id % 7 AS VARCHAR) ||
                   '.test/p/' || CAST(doc_id AS VARCHAR) END AS url,
         CASE WHEN doc_id % 5 = 0 THEN {_PRUNE_NOW - 200_000}
              ELSE {_PRUNE_NOW - 50_000} END AS enqueued_ts
  FROM documents
)
SELECT doc_id, host, url, CAST(enqueued_ts AS BIGINT) AS enqueued_ts
FROM f
WHERE {_PRUNE_NOW} - enqueued_ts <= {_PRUNE_MAX_AGE}
  AND host <> 'h3.test'
  AND NOT (host = 'h1.test' AND doc_id % 3 = 0)
"""


# --------------------------------------------------------------------------
# epoch_plan — training-run source mixing plan
# --------------------------------------------------------------------------

_EPOCH_TOTAL = 1_000_000


def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """epoch_plan over per-source corpus counts (derived from the
    documents source column) with quality weights: small high-weight
    sources upsample past 1000 permille, big low-weight ones subsample;
    integer arithmetic replayed by the oracle."""
    from .textops.curate import epoch_plan

    counts = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "weight",
            F.when(F.col("source") == "web", 1)
            .when(F.col("source") == "books", 5)
            .otherwise(3).cast("long"),
        )
    )
    return epoch_plan(counts, total_docs_per_epoch=_EPOCH_TOTAL)


ORACLE_EPOCH_PLAN = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(CASE source WHEN 'web' THEN 1 WHEN 'books' THEN 5
              ELSE 3 END AS BIGINT) AS weight
  FROM documents GROUP BY source
),
t AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM c)
SELECT source, n_docs, weight,
       CAST(({_EPOCH_TOTAL} * weight) // tw AS BIGINT) AS target_docs,
       CAST((1000 * (({_EPOCH_TOTAL} * weight) // tw)) // n_docs AS BIGINT)
         AS repeat_permille
FROM c, t
"""
