"""Round-3 queries, part 15: HTTP/2 connection coalescing, weak-ETag
strength gates, RFC 9309 robots byte cap, WebDataset shard planning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# h2_coalesce
# --------------------------------------------------------------------------

def q_h2_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.h2_connection_coalescing: 20 IPs each serving a cert with
    SANs [cdn<i>.example, *.t<i>.example]; hosts per doc%4 hit the
    exact SAN, the wildcard, miss on depth (a.b.t<i>.example), or sit
    on an uncovered name; the oracle states the coalescing verdicts."""
    from .fetch import h2_connection_coalescing

    doc = F.col("doc_id")
    i = (doc % 20).cast("string")
    m = doc % 4
    ip = F.concat(F.lit("10.0.0."), i)
    host = (
        F.when(m == 0, F.concat(F.lit("cdn"), i, F.lit(".example")))
        .when(m == 1, F.concat(F.lit("img"), doc.cast("string"),
                               F.lit(".t"), i, F.lit(".example")))
        .when(m == 2, F.concat(F.lit("a.b.t"), i, F.lit(".example")))
        .otherwise(F.concat(F.lit("other"), doc.cast("string"),
                            F.lit(".net")))
    )
    hosts = _docs(spark, sf_dir).select(host.alias("host"),
                                        ip.alias("ip"))
    k = (doc % 20).cast("string")
    certs = _docs(spark, sf_dir).filter(doc < 20).select(
        F.concat(F.lit("10.0.0."), k).alias("ip"),
        F.explode(F.array(
            F.concat(F.lit("cdn"), k, F.lit(".example")),
            F.concat(F.lit("*.t"), k, F.lit(".example")),
        )).alias("san"),
    )
    return h2_connection_coalescing(hosts, certs).orderBy("host", "ip")


ORACLE_H2 = """
WITH u AS (
  SELECT doc_id, doc_id % 20 AS i, doc_id % 4 AS m,
         '10.0.0.' || (doc_id % 20) AS ip,
         CASE doc_id % 4
           WHEN 0 THEN 'cdn' || (doc_id % 20) || '.example'
           WHEN 1 THEN 'img' || doc_id || '.t' || (doc_id % 20)
                       || '.example'
           WHEN 2 THEN 'a.b.t' || (doc_id % 20) || '.example'
           ELSE 'other' || doc_id || '.net'
         END AS host
  FROM documents
)
SELECT host, ip, m IN (0, 1) AS coalesced,
       CASE WHEN m IN (0, 1) THEN ip ELSE 'solo:' || host END AS conn_key
FROM u
ORDER BY host, ip
"""


# --------------------------------------------------------------------------
# etag_strength
# --------------------------------------------------------------------------

def q_etag_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.etag_strength_decisions over strong, weak, unquoted-bad
    and empty etags crossed with the two conditional uses; weak
    validators must be rejected on the if_range path only."""
    from .sinks import etag_strength_decisions

    doc = F.col("doc_id")
    m = doc % 4
    etag = (
        F.when(m == 0, F.concat(F.lit('"v'), doc.cast("string"),
                                F.lit('"')))
        .when(m == 1, F.concat(F.lit('W/"v'), doc.cast("string"),
                               F.lit('"')))
        .when(m == 2, F.lit("naked-token"))
        .otherwise(F.lit(""))
    )
    use = F.when(doc % 2 == 0, F.lit("if_none_match")) \
        .otherwise(F.lit("if_range"))
    cache = _docs(spark, sf_dir).select(etag.alias("etag"),
                                        use.alias("use"))
    # nullable boolean columns hash differently in the driver compare
    # (repo gotcha) -> emit is_weak as 0/1 int
    return etag_strength_decisions(cache).withColumn(
        "is_weak", F.col("is_weak").cast("int")
    ).orderBy("etag", "use")


ORACLE_ETAG = """
WITH u AS (
  SELECT doc_id, doc_id % 4 AS m,
         CASE doc_id % 4
           WHEN 0 THEN '"v' || doc_id || '"'
           WHEN 1 THEN 'W/"v' || doc_id || '"'
           WHEN 2 THEN 'naked-token'
           ELSE ''
         END AS etag,
         CASE WHEN doc_id % 2 = 0 THEN 'if_none_match'
              ELSE 'if_range' END AS use
  FROM documents
)
SELECT etag, use,
       CAST(CASE WHEN m = 0 THEN 0 WHEN m = 1 THEN 1 END AS INTEGER)
         AS is_weak,
       CASE WHEN m = 0 THEN 'v' || doc_id
            WHEN m = 1 THEN 'v' || doc_id END AS opaque,
       CASE WHEN m IN (0, 1) AND use = 'if_none_match' THEN TRUE
            WHEN m = 0 AND use = 'if_range' THEN TRUE
            ELSE FALSE END AS usable
FROM u
ORDER BY etag, use
"""


# --------------------------------------------------------------------------
# robots_cap
# --------------------------------------------------------------------------

_CAP = 256  # small cap so the oracle stays readable; semantics identical


def q_robots_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.truncate_robots_body with a 256-byte cap: a short body
    passes untouched; a long one is cut at the cap with the partial
    last line dropped, and the post-cap Disallow never parses.  The
    query returns the byte accounting plus whether '/hidden' survived
    into the capped parse (it must not)."""
    from .robots import parse_clean_params, truncate_robots_body

    doc = F.col("doc_id")
    filler = F.repeat(F.lit("# pad pad pad pad pad pad pad\n"), 8)  # 240 B
    long_body = F.concat(
        filler,
        F.lit("User-agent: *\nDisallow: /hidden\n"),
    )
    short_body = F.lit("User-agent: *\nDisallow: /a\n")
    robots = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.when(doc % 2 == 0, long_body).otherwise(short_body)
        .alias("body"),
    )
    t = truncate_robots_body(robots, cap=_CAP)
    return t.select(
        "doc_id",
        F.octet_length("body").cast("long").alias("body_bytes"),
        F.octet_length("body_capped").cast("long").alias("capped_bytes"),
        "robots_truncated", "bytes_dropped",
        F.col("body_capped").contains("/hidden").alias("hidden_survived"),
    ).orderBy("doc_id")


ORACLE_ROBOTS_CAP = f"""
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 272 ELSE 27 END AS BIGINT)
         AS body_bytes,
       -- cap 256 lands inside 'Disallow: /hidden\\n' (bytes 241-272);
       -- the partial line is dropped back to the newline at byte 254
       CAST(CASE WHEN doc_id % 2 = 0 THEN 254 ELSE 27 END AS BIGINT)
         AS capped_bytes,
       doc_id % 2 = 0 AS robots_truncated,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 18 ELSE 0 END AS BIGINT)
         AS bytes_dropped,
       FALSE AS hidden_survived
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# webdataset_shards
# --------------------------------------------------------------------------

def q_webdataset_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.webdataset_shard_plan over 500 synthetic samples of
    1-10 KB packed into 64 KB shards; the oracle replays the
    exclusive prefix sum in window SQL and the floor-div shard
    assignment."""
    from .sinks import webdataset_shard_plan

    doc = F.col("doc_id")
    samples = _docs(spark, sf_dir).select(
        F.concat(F.lit("img"), F.lpad(doc.cast("string"), 6, "0"))
        .alias("image_id"),
        ((1 + doc % 10) * 1024).cast("long").alias("n_bytes"),
    )
    return webdataset_shard_plan(
        samples, target_bytes=64 * 1024).orderBy("image_id")


ORACLE_WEBDATASET = """
WITH s AS (
  SELECT 'img' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS image_id,
         CAST((1 + doc_id % 10) * 1024 AS BIGINT) AS n_bytes
  FROM documents
),
p AS (
  SELECT image_id, n_bytes,
         CAST(COALESCE(SUM(n_bytes) OVER (ORDER BY image_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS pre
  FROM s
)
SELECT image_id, n_bytes,
       pre // 65536 AS shard_id,
       pre % 65536 AS offset_in_shard
FROM p
ORDER BY image_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "h2_coalesce": q_h2_coalesce,
        "etag_strength": q_etag_strength,
        "robots_cap": q_robots_cap,
        "webdataset_shards": q_webdataset_shards,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "h2_coalesce": ORACLE_H2,
        "etag_strength": ORACLE_ETAG,
        "robots_cap": ORACLE_ROBOTS_CAP,
        "webdataset_shards": ORACLE_WEBDATASET,
    }
