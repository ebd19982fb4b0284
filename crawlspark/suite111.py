"""Round-5 queries, part 1: driver-gated observables for the previously
pytest-only side-effecting components (VERDICT r4 item 4).

Each query replays a reference store/cache/checkpoint behavior through the
REAL sink code path (write to a scratch dir, read back, return the
read-back as a DataFrame) so the DuckDB oracle checks the end-to-end
round-trip, not a pure-Spark restatement:

- file_cache_ttl     — ResponseCache upsert (latest stored_at wins) + TTL
                       read-back + gzip-at-rest transparency
                       (reference: src/Cache/FileCache.php:77-120,
                       src/Loader/Http/HttpLoader.php:543-609)
- store_csv_roundtrip — SimpleCsvFileStore " | " array flattening through
                       a real CSV write + read
                       (reference: src/Stores/SimpleCsvFileStore.php:24-79)
- store_json_roundtrip — JsonFileStore line-JSON write + read
                       (reference: src/Stores/JsonFileStore.php:24-37)
- resume_identity    — kill-and-resume: crawl to depth 2 with
                       checkpointing, resume to depth 4; the resumed
                       output must match the independent BFS oracle
                       bit-for-bit (north_rule checkpoint/resume)
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed timeline for the cache fixture: generation A at stored_at
# 1000..1799, generation B (every 3rd key) at 2000..2099, read at now=2050
# with ttl=600 so the liveness cutoff is 1450 — some un-upserted A rows
# survive, some expire, every B row is live
_CACHE_NOW = 2050
_CACHE_TTL = 600


def _materialize(df: DataFrame) -> DataFrame:
    """Pin the rows before the scratch dir is deleted."""
    return df.localCheckpoint(eager=True)


def q_file_cache_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two merge generations through ResponseCache (compress=True), read
    back at a fixed `now`: upsert keeps the LATEST stored_at per
    request_key, the TTL predicate drops expired rows, and gzip-at-rest
    bodies decompress transparently on read."""
    from .sinks import ResponseCache

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    gen_a = docs.select(
        i.alias("request_key"),
        F.concat(F.lit("https://cache.example/d/"), i.cast("string")).alias("url"),
        F.lit(200).cast("int").alias("status"),
        F.encode(F.concat(F.lit("body-a-"), i.cast("string")), "UTF-8").alias("body"),
        (F.lit(1000) + i % 800).cast("long").alias("stored_at"),
    )
    gen_b = docs.filter(i % 3 == 0).select(
        i.alias("request_key"),
        F.concat(F.lit("https://cache.example/d/"), i.cast("string")).alias("url"),
        F.lit(304).cast("int").alias("status"),
        F.encode(F.concat(F.lit("body-b-"), i.cast("string")), "UTF-8").alias("body"),
        (F.lit(2000) + i % 100).cast("long").alias("stored_at"),
    )
    d = tempfile.mkdtemp(prefix="suite111-cache-")
    try:
        cache = ResponseCache(spark, f"{d}/cache", ttl_s=_CACHE_TTL,
                              compress=True)
        cache.merge(gen_a)
        cache.merge(gen_b)
        live = cache.read(now_s=_CACHE_NOW)
        return _materialize(
            live.select(
                "request_key", "url", "status",
                F.decode(F.col("body"), "UTF-8").alias("body_str"),
                "stored_at",
            ).orderBy("request_key")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


ORACLE_FILE_CACHE_TTL = f"""
WITH a AS (
  SELECT doc_id AS request_key,
         'https://cache.example/d/' || doc_id AS url,
         CAST(200 AS INTEGER) AS status,
         'body-a-' || doc_id AS body_str,
         1000 + doc_id % 800 AS stored_at
  FROM documents
),
b AS (
  SELECT doc_id AS request_key,
         'https://cache.example/d/' || doc_id AS url,
         CAST(304 AS INTEGER) AS status,
         'body-b-' || doc_id AS body_str,
         2000 + doc_id % 100 AS stored_at
  FROM documents WHERE doc_id % 3 = 0
),
merged AS (
  SELECT * FROM a WHERE request_key NOT IN (SELECT request_key FROM b)
  UNION ALL
  SELECT * FROM b
)
SELECT request_key, url, status, body_str, stored_at
FROM merged
WHERE stored_at >= {_CACHE_NOW} - {_CACHE_TTL}
ORDER BY request_key
"""


def q_store_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array column through write_csv_store (flattened to 'x | y' exactly
    like SimpleCsvFileStore) then read back from the CSV files."""
    from .sinks import write_csv_store

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    src = docs.select(
        i.alias("doc_id"),
        F.array(
            F.concat(F.lit("t"), (i % 5).cast("string")),
            F.concat(F.lit("u"), (i % 7).cast("string")),
        ).alias("tags"),
        F.col("lang"),
    )
    d = tempfile.mkdtemp(prefix="suite111-csv-")
    try:
        write_csv_store(src, f"{d}/out", mode="overwrite")
        back = spark.read.option("header", "true").csv(f"{d}/out")
        return _materialize(
            back.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("tags"),
                F.col("lang"),
            ).orderBy("doc_id")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


ORACLE_STORE_CSV = """
SELECT doc_id,
       't' || (doc_id % 5) || ' | ' || 'u' || (doc_id % 7) AS tags,
       lang
FROM documents
ORDER BY doc_id
"""


def q_store_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-JSON store write + typed read-back (arrays survive as arrays;
    returned joined so the oracle compares plain strings)."""
    from .sinks import write_json_store

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    src = docs.select(
        i.alias("doc_id"),
        F.array(
            F.concat(F.lit("j"), (i % 3).cast("string")),
            F.concat(F.lit("k"), (i % 11).cast("string")),
        ).alias("keys"),
        F.col("n_chars"),
    )
    d = tempfile.mkdtemp(prefix="suite111-json-")
    try:
        write_json_store(src, f"{d}/out", mode="overwrite")
        back = spark.read.schema(
            "doc_id LONG, keys ARRAY<STRING>, n_chars LONG"
        ).json(f"{d}/out")
        return _materialize(
            back.select(
                "doc_id",
                F.array_join("keys", ",").alias("keys_joined"),
                "n_chars",
            ).orderBy("doc_id")
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


ORACLE_STORE_JSON = """
SELECT doc_id,
       'j' || (doc_id % 3) || ',' || 'k' || (doc_id % 11) AS keys_joined,
       n_chars
FROM documents
ORDER BY doc_id
"""


_RESUME_DEPTH_PART = 2
_RESUME_DEPTH_FULL = 4


def q_resume_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kill-and-resume observable for the driver gate: crawl to depth 2
    with per-level checkpointing, then RESUME the same checkpoint to depth
    4.  The resumed output (url, host, depth, ord — crawl order AND the
    final seen set) is compared against the independent unrolled-BFS
    DuckDB oracle, so any resume drift (lost wave, re-crawled URL, broken
    ordering) is a hash mismatch."""
    from .frontier import CrawlConfig, crawl_bfs

    d = tempfile.mkdtemp(prefix="suite111-resume-")
    try:
        crawl_bfs(
            spark, sf_dir,
            CrawlConfig(max_depth=_RESUME_DEPTH_PART, checkpoint_dir=d),
        ).count()
        resumed = crawl_bfs(
            spark, sf_dir,
            CrawlConfig(max_depth=_RESUME_DEPTH_FULL, checkpoint_dir=d,
                        resume=True),
        )
        return _materialize(resumed)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "file_cache_ttl": q_file_cache_ttl,
        "store_csv_roundtrip": q_store_csv_roundtrip,
        "store_json_roundtrip": q_store_json_roundtrip,
        "resume_identity": q_resume_identity,
    }


def oracle_sql() -> dict[str, str]:
    from . import graph

    return {
        "file_cache_ttl": ORACLE_FILE_CACHE_TTL,
        "store_csv_roundtrip": ORACLE_STORE_CSV,
        "store_json_roundtrip": ORACLE_STORE_JSON,
        "resume_identity": graph.bfs_oracle_sql(_RESUME_DEPTH_FULL),
    }
