"""Round-3 queries, part 3: multimodal sequence packing (dual token +
image budgets), sitemap lastmod trust scoring, tail-latency hedging
plans, and consistent-hash ring fetcher assignment with bounded-load
read-out.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops.dedup import BASE_HASH_SQL


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# interleave_pack
# --------------------------------------------------------------------------

_MM_TOK_CAP = 512
_MM_IMG_CAP = 6
_MM_IMG_COST = 64


def q_interleave_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curate.pack_multimodal: docs carry text tokens + doc_id%4 images at
    64 tokens each; bins close when EITHER the 512-token or the 6-image
    running budget crosses a capacity multiple.  Two distributed prefix
    sums over one salted-hash order, never a single-partition window."""
    from .textops.curate import pack_multimodal

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        (F.col("doc_id") % 4).cast("long").alias("n_images"),
    )
    return pack_multimodal(
        d, token_capacity=_MM_TOK_CAP, image_capacity=_MM_IMG_CAP,
        image_token_cost=_MM_IMG_COST)


ORACLE_INTERLEAVE_PACK = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(doc_id % 4 AS BIGINT) AS n_images,
         CAST(len(str_split(text, ' ')) + {_MM_IMG_COST} * (doc_id % 4)
              AS BIGINT) AS seq_cost,
         {BASE_HASH_SQL.format(x="'mmpack' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens, n_images, seq_cost,
         SUM(seq_cost) OVER (ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) - seq_cost AS cost_start,
         SUM(n_images) OVER (ORDER BY h, doc_id
           ROWS UNBOUNDED PRECEDING) - n_images AS img_start
  FROM t
),
b AS (
  SELECT doc_id, n_tokens, n_images, seq_cost,
         CAST(FLOOR(cost_start / {_MM_TOK_CAP}) AS BIGINT) AS tok_bin,
         CAST(FLOOR(img_start / {_MM_IMG_CAP}) AS BIGINT) AS img_bin
  FROM c
)
SELECT doc_id, n_tokens, n_images, seq_cost,
       greatest(tok_bin, img_bin) AS bin_id,
       CASE WHEN tok_bin = img_bin THEN 'both'
            WHEN tok_bin > img_bin THEN 'tokens'
            ELSE 'images' END AS bound_by
FROM b
"""


# --------------------------------------------------------------------------
# lastmod_trust
# --------------------------------------------------------------------------

def q_lastmod_trust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.sitemap_lastmod_trust over 30 hosts whose lastmod
    accuracy differs by construction: hosts 0-9 mislabel ~1/29 of URLs
    (trusted), 10-19 ~1/4 (noisy/untrusted band), 20-29 every other URL
    (untrusted); claim = lastmod > prev_fetch, truth = hash changed."""
    from .politeness import sitemap_lastmod_trust

    doc = F.col("doc_id")
    grp = doc % 30
    claimed = (doc % 100) > 50
    flip = (
        F.when(grp < 10, doc % 29 == 0)
        .when(grp < 20, doc % 4 == 0)
        .otherwise(doc % 2 == 0)
    )
    actual = claimed != flip
    snap = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), grp.cast("string")).alias("host"),
        F.when(claimed, 100).otherwise(10).cast("long").alias("lastmod_ts"),
        F.lit(50).cast("long").alias("prev_fetch_ts"),
        F.lit("a").alias("prev_hash"),
        F.when(actual, "b").otherwise("a").alias("cur_hash"),
    )
    return sitemap_lastmod_trust(snap, min_samples=10).orderBy("host")


ORACLE_LASTMOD_TRUST = """
WITH t AS (
  SELECT 'h' || CAST(doc_id % 30 AS VARCHAR) AS host,
         (doc_id % 100) > 50 AS claimed,
         ((doc_id % 100) > 50) <> (CASE
            WHEN doc_id % 30 < 10 THEN doc_id % 29 = 0
            WHEN doc_id % 30 < 20 THEN doc_id % 4 = 0
            ELSE doc_id % 2 = 0 END) AS actual
  FROM documents
),
g AS (
  SELECT host, COUNT(*) AS n_urls,
         SUM(CASE WHEN claimed AND actual THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN claimed AND NOT actual THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN NOT claimed AND actual THEN 1 ELSE 0 END) AS fn,
         SUM(CASE WHEN NOT claimed AND NOT actual THEN 1 ELSE 0 END) AS tn
  FROM t GROUP BY host
),
p AS (
  SELECT host, n_urls, tp, fp, fn, tn,
         CASE WHEN tp + fp > 0 THEN CAST(1000 * tp // (tp + fp) AS BIGINT)
         END AS precision_permille,
         CASE WHEN tp + fn > 0 THEN CAST(1000 * tp // (tp + fn) AS BIGINT)
         END AS recall_permille
  FROM g
)
SELECT host, CAST(n_urls AS BIGINT) AS n_urls,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       precision_permille, recall_permille,
       CASE WHEN n_urls < 10 THEN 'insufficient'
            WHEN COALESCE(precision_permille, 1000) >= 900
             AND COALESCE(recall_permille, 1000) >= 900 THEN 'trusted'
            WHEN COALESCE(precision_permille, 1000) >= 500
             AND COALESCE(recall_permille, 1000) >= 500 THEN 'noisy'
            ELSE 'untrusted' END AS trust
FROM p
ORDER BY host
"""


# --------------------------------------------------------------------------
# hedged_fetch
# --------------------------------------------------------------------------

def q_hedged_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.hedged_fetch_plan over 25 hosts x pseudo-random latencies:
    hedge delay = exact p95 order statistic per host, empirical hedged
    completion pairs each request with the next on the host (wrapping);
    the oracle replays the rank, the lead pairing and the permille
    arithmetic."""
    from .fetch import hedged_fetch_plan

    doc = F.col("doc_id")
    samples = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 25).cast("string")).alias("host"),
        doc.alias("req_id"),
        (1 + (doc * 7919) % 2000).cast("long").alias("latency_ms"),
    )
    return hedged_fetch_plan(samples).orderBy("host")


ORACLE_HEDGED_FETCH = """
WITH s AS (
  SELECT 'h' || CAST(doc_id % 25 AS VARCHAR) AS host,
         doc_id AS rid,
         CAST(1 + (doc_id * 7919) % 2000 AS BIGINT) AS lat
  FROM documents
),
r AS (
  SELECT host, rid, lat,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY lat, rid) AS rk,
         COUNT(*) OVER (PARTITION BY host) AS n
  FROM s
),
d AS (
  SELECT host, lat AS hedge_delay_ms FROM r
  WHERE rk = CAST(CEIL(95 * n / 100.0) AS BIGINT)
),
p AS (
  SELECT s.host, s.lat,
         COALESCE(LEAD(s.lat) OVER (PARTITION BY s.host ORDER BY s.rid),
                  FIRST_VALUE(s.lat) OVER (PARTITION BY s.host
                    ORDER BY s.rid
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING)) AS partner,
         d.hedge_delay_ms
  FROM s JOIN d ON s.host = d.host
),
g AS (
  SELECT host, COUNT(*) AS n_requests,
         MIN(hedge_delay_ms) AS hedge_delay_ms,
         SUM(lat) AS sum_latency_ms,
         SUM(least(lat, hedge_delay_ms + partner)) AS sum_hedged_ms,
         SUM(CASE WHEN lat > hedge_delay_ms THEN 1 ELSE 0 END) AS n_hedged
  FROM p GROUP BY host
)
SELECT host, CAST(n_requests AS BIGINT) AS n_requests, hedge_delay_ms,
       CAST(sum_latency_ms AS BIGINT) AS sum_latency_ms,
       CAST(sum_hedged_ms AS BIGINT) AS sum_hedged_ms,
       CAST(n_hedged AS BIGINT) AS n_hedged,
       CAST(1000 * n_hedged // n_requests AS BIGINT) AS hedge_rate_permille,
       CAST(1000 * (sum_latency_ms - sum_hedged_ms) // sum_latency_ms
            AS BIGINT) AS latency_cut_permille
FROM g
ORDER BY host
"""


# --------------------------------------------------------------------------
# ch_ring_assign
# --------------------------------------------------------------------------

_CH_FETCHERS = ["fetcher-a", "fetcher-b", "fetcher-c", "fetcher-d",
                "fetcher-e"]
_CH_VNODES = 16


def q_ch_ring_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.consistent_ring_assign: 5 fetchers x 16 virtual nodes, hosts
    to their clockwise ring successor, bounded-load cap 1.25x fair share;
    the oracle rebuilds the ring from the same md5 positions and replays
    the successor min and the per-fetcher spill rank."""
    from .fetch import consistent_ring_assign

    hosts = _docs(spark, sf_dir).select(
        F.concat(F.lit("host-"), (F.col("doc_id") % 200).cast("string"))
        .alias("host")
    ).distinct()
    return consistent_ring_assign(
        hosts, _CH_FETCHERS, vnodes=_CH_VNODES, load_cap_permille=1250,
    ).orderBy("host")


def _oracle_ch_ring() -> str:
    fl = ", ".join(f"('{f}')" for f in _CH_FETCHERS)
    key = BASE_HASH_SQL.format(x="host")
    pos = BASE_HASH_SQL.format(
        x="fetcher || '#' || CAST(replica AS VARCHAR)")
    return f"""
WITH hosts AS (
  SELECT DISTINCT 'host-' || CAST(doc_id % 200 AS VARCHAR) AS host
  FROM documents
),
ring AS (
  SELECT f.fetcher, r.replica, {pos} AS pos
  FROM (VALUES {fl}) AS f(fetcher)
  CROSS JOIN (SELECT UNNEST(generate_series(0, {_CH_VNODES - 1}))
              AS replica) AS r
),
j AS (
  SELECT h.host, ring.fetcher, ring.pos,
         ((ring.pos - {key}) % 4294967296 + 4294967296) % 4294967296
           AS delta
  FROM hosts h CROSS JOIN ring
),
best AS (
  SELECT host, fetcher, delta AS ring_delta,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY delta, pos, fetcher) AS rn
  FROM j
),
b2 AS (SELECT host, fetcher, ring_delta FROM best WHERE rn = 1),
cap AS (
  SELECT (1250 * COUNT(*) + 1000 * {len(_CH_FETCHERS)} - 1)
         // (1000 * {len(_CH_FETCHERS)}) AS c
  FROM b2
)
SELECT host, fetcher, ring_delta,
       CAST(ROW_NUMBER() OVER (PARTITION BY fetcher
            ORDER BY ring_delta, host) AS BIGINT) AS rank_in_fetcher,
       ROW_NUMBER() OVER (PARTITION BY fetcher
            ORDER BY ring_delta, host) > (SELECT c FROM cap)
         AS would_spill
FROM b2
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "interleave_pack": q_interleave_pack,
        "lastmod_trust": q_lastmod_trust,
        "hedged_fetch": q_hedged_fetch,
        "ch_ring_assign": q_ch_ring_assign,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "interleave_pack": ORACLE_INTERLEAVE_PACK,
        "lastmod_trust": ORACLE_LASTMOD_TRUST,
        "hedged_fetch": ORACLE_HEDGED_FETCH,
        "ch_ring_assign": _oracle_ch_ring(),
    }
