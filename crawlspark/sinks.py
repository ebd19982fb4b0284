"""Stores / sinks.

Reference stores are row sinks receiving Result dicts
(src/Stores/StoreInterface.php); ours are DataFrame writers:

- :func:`write_json_store` — JsonFileStore (src/Stores/JsonFileStore.php:24-37)
- :func:`write_csv_store` — SimpleCsvFileStore: array columns joined with
  " | " like the reference (src/Stores/SimpleCsvFileStore.php:24-79)
- :class:`ResponseCache` — the loader's response cache
  (src/Cache/FileCache.php:14-36, HttpLoader.php:543-609): keyed by
  request_key, TTL via timestamp predicate, write-only mode and URL-filter
  gating; MERGE semantics implemented as partition-overwrite upsert on
  parquet (an Iceberg catalog would use a real MERGE INTO — same layout).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_TTL_S = 3600  # reference FileCache default (FileCache.php:17)


def write_json_store(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).json(path)


def write_csv_store(df: DataFrame, path: str, mode: str = "append") -> None:
    """Arrays are flattened to 'a | b | c' exactly like the reference."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            cols.append(F.array_join(F.col(f.name), " | ").alias(f.name))
        else:
            cols.append(F.col(f.name))
    df.select(*cols).write.mode(mode).option("header", "true").csv(path)


CACHE_SCHEMA = (
    "request_key LONG, url STRING, status INT, body BINARY, stored_at LONG"
)


class ResponseCache:
    """Fetch memoization table: probe before fetch (anti-join), merge after."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ttl_s: int = DEFAULT_TTL_S,
        compress: bool = False,
    ):
        """``compress=True`` is the reference's FileCache::useCompression()
        (FileCache.php:38-43, zlib): bodies are gzip'd on write and
        sniff-decompressed on read, so mixed/legacy cache files still
        read correctly (gzip magic check, like the reference's
        isProbablyCompressed)."""
        self.spark = spark
        self.path = path
        self.ttl_s = ttl_s
        self.compress = compress

    def _exists(self) -> bool:
        import os
        from pathlib import Path

        if not os.path.exists(self.path):
            return False
        return any(Path(self.path).rglob("*.parquet"))

    def read(self, now_s: int | None = None) -> DataFrame:
        """Live (unexpired) cache rows (bodies transparently decompressed
        when the store is compressed — gzip-magic sniff handles mixed
        files)."""
        now_s = int(now_s if now_s is not None else time.time())
        if not self._exists():
            return self.spark.createDataFrame([], CACHE_SCHEMA)
        df = self.spark.read.parquet(self.path)
        live = df.filter(F.col("stored_at") >= now_s - self.ttl_s)
        if self.compress:
            from .steps import gzip_decode_udf

            live = live.withColumn("body", gzip_decode_udf(F.col("body")))
        return live

    def probe(self, frontier: DataFrame, key: str = "request_key",
              now_s: int | None = None) -> tuple[DataFrame, DataFrame]:
        """(hits, misses): hits carry cached response columns; misses go to
        the fetch stage.  This is the reference's cache-probe-before-load
        (HttpLoader.php:543-609) as a join split."""
        cache = self.read(now_s)
        hits = frontier.join(cache, frontier[key] == cache["request_key"], "inner")
        misses = frontier.join(
            cache.select(F.col("request_key").alias(key)), key, "left_anti"
        )
        return hits, misses

    def merge(self, responses: DataFrame, url_filter=None) -> None:
        """Upsert responses (latest stored_at wins per request_key).

        ``url_filter``: optional Column predicate gating what is cached
        (reference cacheUrlFilters, HttpLoader.php:263-329)."""
        new = responses
        if url_filter is not None:
            new = new.filter(url_filter)
        new = new.select(*[f.split(" ")[0] for f in CACHE_SCHEMA.split(", ")])
        if self.compress:
            from .steps import gzip_encode_udf

            new = new.withColumn("body", gzip_encode_udf(F.col("body")))
        if self._exists():
            cur = self.spark.read.parquet(self.path)
            merged = cur.unionByName(new)
        else:
            merged = new
        from pyspark.sql import Window

        # Iceberg's MERGE INTO raises on one target row matched by multiple
        # source rows (spec: merge cardinality check); this stand-in instead
        # resolves DETERMINISTICALLY — latest stored_at wins, ties broken by
        # body hash so re-running the same merge can never flip the winner.
        # Divergence documented in tests/test_iceberg_conformance.py.
        w = Window.partitionBy("request_key").orderBy(
            F.col("stored_at").desc(), F.xxhash64("body").desc(),
            F.col("status").desc(),
        )
        deduped = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
        )
        # write to temp then swap (parquet stand-in for an Iceberg MERGE commit)
        tmp = self.path + ".tmp"
        deduped.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
        shutil.move(tmp, self.path)


def write_results_table(
    df: DataFrame,
    path: str,
    host_col: str = "host",
    order_col: str = "ord",
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Host-bucketed, crawl-order-clustered results sink — the parquet
    stand-in for the north-star's Iceberg image+caption results table
    (``PARTITIONED BY (bucket(N, host))`` + ``WRITE ORDERED BY ord``).

    Layout decisions, each a 100 TB property:

    - ``host_bucket = pmod(xxhash64(host), N)`` partition directories: a
      reader filtering on host prunes to ONE bucket directory (1/N of the
      data) before any row is read; politeness/recrawl jobs that are
      per-host by nature inherit host-locality from the layout instead of
      re-shuffling the table.
    - ONE ``repartition(N, host_bucket)`` before the write: exactly one
      file per bucket per write commit (no small-file explosion — at 10^10
      rows the alternative, per-task files x N dirs, melts the metadata
      layer).
    - ``sortWithinPartitions(host_bucket, host, ord)``: rows inside each
      file are clustered by host then crawl order, so parquet row-group
      min/max stats turn host + ord-range predicates into row-group skips.
    """
    out = df.withColumn(
        "host_bucket", F.pmod(F.xxhash64(F.col(host_col)), F.lit(num_buckets))
    )
    (
        out.repartition(num_buckets, "host_bucket")
        .sortWithinPartitions("host_bucket", host_col, order_col)
        .write.mode(mode)
        .partitionBy("host_bucket")
        .parquet(path)
    )


def read_results_for_host(
    spark: SparkSession, path: str, host: str, num_buckets: int = 32
) -> DataFrame:
    """Read back one host's rows with partition pruning: the host predicate
    is rewritten into its ``host_bucket`` partition filter, so the scan
    touches 1/num_buckets of the files (asserted by the PartitionFilters
    plan test), then the exact host filter runs on that slice."""
    df = spark.read.parquet(path)
    # Spark's xxhash64 is the seeded row-hash variant — derive the bucket
    # with the SAME expression the writer used (a 1-row local-relation job;
    # at plan time this is a literal, so the partition filter prunes).
    bucket = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(host)), F.lit(num_buckets)).alias("b"))
        .head()[0]
    )
    return df.where(
        (F.col("host_bucket") == F.lit(int(bucket))) & (F.col("host") == host)
    )


def request_key(method, url, body=None):
    """Request fingerprint (reference: md5(serialize(method,uri,headers-Cookie,
    body)), src/Utils/RequestKey.php:26-42) — xxhash64 per north_rule."""
    parts = [F.lit(method) if isinstance(method, str) else method, url]
    if body is not None:
        parts.append(body)
    return F.xxhash64(*parts)


def revalidation_plan(
    cache: DataFrame,
    now_ts: int,
    ttl_s: int = DEFAULT_TTL_S,
) -> DataFrame:
    """Conditional-GET revalidation planner over a cached-response table —
    the scale extension of the reference's TTL-only FileCache
    (Cache/FileCache.php:16,46: expired => refetch from scratch).  At
    10^10 URLs a full refetch of every expired entry wastes the bandwidth
    the origin already offers via validators, so expired entries with an
    ETag or Last-Modified become cheap conditional requests instead
    (RFC 9111 §4.3): expect a 304 + header refresh, not a body transfer.

    Input columns: (url, etag:string|null, last_modified_ts:long|null,
    fetched_ts:long).  Pure Column expressions — a narrow map over the
    cache scan, no shuffle; the action split drives three downstream
    paths (fresh: skip fetch; revalidate: conditional GET batch;
    refetch: normal frontier admission).

    Returns (url, age_s, action, cond_header, cond_value) where action in
    ('fresh', 'revalidate', 'refetch'); ETag wins over Last-Modified when
    both validators exist (RFC 9110 §13.1.2 preference order).
    """
    age = (F.lit(now_ts) - F.col("fetched_ts")).cast("long")
    has_etag = F.col("etag").isNotNull()
    has_lm = F.col("last_modified_ts").isNotNull()
    expired = age >= F.lit(ttl_s)
    action = (
        F.when(~expired, F.lit("fresh"))
        .when(has_etag | has_lm, F.lit("revalidate"))
        .otherwise(F.lit("refetch"))
    )
    cond_header = (
        F.when(expired & has_etag, F.lit("If-None-Match"))
        .when(expired & has_lm, F.lit("If-Modified-Since"))
    )
    cond_value = (
        F.when(expired & has_etag, F.col("etag"))
        .when(expired & has_lm, F.col("last_modified_ts").cast("string"))
    )
    return cache.select(
        "url",
        age.alias("age_s"),
        action.alias("action"),
        cond_header.alias("cond_header"),
        cond_value.alias("cond_value"),
    )


def revalidation_outcomes(
    plan: DataFrame,
    server: DataFrame,
    now_ts: int,
) -> DataFrame:
    """Apply origin state to a revalidation plan: join the 'revalidate'
    slice against the server's current validators and classify 304 (keep
    cached body, refresh fetched_ts) vs 200 (body changed, full refetch).

    ``server`` columns: (url, cur_etag:string|null, cur_modified_ts:long).
    ETag comparison is exact string equality (strong validator);
    Last-Modified revalidation succeeds when the origin's mtime is not
    newer than the cached validator.  One equi-join on url — at scale the
    'server' side is the conditional-fetch result batch, co-partitioned
    by url hash with the plan slice.

    Returns (url, status, new_fetched_ts).
    """
    p = plan.filter(F.col("action") == "revalidate")
    j = p.join(server, "url")
    not_modified = (
        F.when(F.col("cond_header") == "If-None-Match",
               F.col("cur_etag").isNotNull()
               & (F.col("cur_etag") == F.col("cond_value")))
        .otherwise(F.col("cur_modified_ts")
                   <= F.col("cond_value").cast("long"))
    )
    return j.select(
        "url",
        F.when(not_modified, F.lit(304)).otherwise(F.lit(200))
         .cast("int").alias("status"),
        F.lit(now_ts).cast("long").alias("new_fetched_ts"),
    )


def content_store_stats(
    pages: DataFrame,
    hash_col: str = "content_hash",
    bytes_col: str = "n_bytes",
) -> DataFrame:
    """Content-addressed store accounting — bodies keyed by content hash
    so N pages serving identical bytes store ONE copy (the WARC/CDX
    revisit-record model; at 100 TB the mirror/boilerplate dup rate
    makes this the difference between 100 TB and ~60 TB on disk).

    One map-side-combined groupBy on the hash: per content row the
    reference count, the single stored size, and the bytes saved vs
    storing every fetch.  Returns (content_hash, n_refs, bytes_stored,
    bytes_saved).
    """
    return pages.groupBy(hash_col).agg(
        F.count("*").cast("long").alias("n_refs"),
        F.min(F.col(bytes_col).cast("long")).alias("bytes_stored"),
        (F.sum(F.col(bytes_col).cast("long"))
         - F.min(F.col(bytes_col).cast("long"))).alias("bytes_saved"),
    )


def shard_manifest(
    assigned: DataFrame,
    shard_col: str = "shard_id",
    id_col: str = "image_id",
    bytes_col: str = "nbytes",
) -> DataFrame:
    """Integrity manifest per training shard — what a data-delivery
    handoff publishes next to the shard files: row count, total bytes,
    and a content checksum (md5 over the ids in deterministic sorted
    order, so any dropped/duplicated/renamed member changes it).  The
    consumer re-derives the same three numbers after download; a
    mismatch pins the broken shard without scanning payloads.

    One map-side-combined groupBy; the checksum builds from
    sort_array(collect_list(id)) — per-shard member lists are
    shard-sized (bounded by the packer's byte target), never corpus-
    sized.  Returns (shard_id, n_rows, total_bytes, checksum).
    """
    return assigned.groupBy(shard_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col(bytes_col).cast("long")).alias("total_bytes"),
        F.md5(
            F.concat_ws("|", F.sort_array(F.collect_list(F.col(id_col))))
        ).alias("checksum"),
    )


INDEXNOW_BATCH_MAX = 10_000


def indexnow_batches(
    changed: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    batch_max: int = INDEXNOW_BATCH_MAX,
) -> DataFrame:
    """IndexNow-style change notification batching (the public
    indexnow.org protocol: per-host POST of up to 10k changed URLs) —
    the push side of freshness: after a wave lands, notify search
    endpoints of exactly what changed instead of waiting to be
    re-crawled.  Per host, URLs pack into batches of ``batch_max`` in
    deterministic url order; a partitioned window (rank div max) — no
    global ordering needed, hosts are independent.

    Returns (host, batch_no, n_urls, urls) with urls the sorted
    member array (bounded by batch_max per row).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(url_col)
    ranked = changed.withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__batch", F.expr(f"(__rn - 1) div {int(batch_max)}"))
    return (
        ranked.groupBy(host_col, "__batch")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sort_array(F.collect_list(url_col)).alias("urls"),
        )
        .select(
            host_col, F.col("__batch").alias("batch_no"), "n_urls", "urls"
        )
    )


# ---------------------------------------------------------------------------
# small-file compaction planning (the Iceberg rewrite_data_files problem)


def compaction_plan(
    files: DataFrame,
    small_bytes: int = 32 << 20,
    target_bytes: int = 512 << 20,
    partition_col: str = "partition",
    id_col: str = "file_id",
    size_col: str = "bytes",
) -> DataFrame:
    """Plan a compaction wave over a streamed table's file manifest.

    Continuous ingest (streaming.image_validation_stream and friends)
    commits one small file per micro-batch per partition; at 100 TB the
    manifest bloats and every scan pays per-file open costs.  This plans
    the rewrite: files under ``small_bytes`` are bin-packed per partition
    into groups of ~``target_bytes`` (the same exact offset-based packing
    as mmcurate.shard_assign — one PARTITIONED window, distributed), and
    groups that would rewrite a single file are dropped (no gain).

    Returns one row per rewrite group: (partition, group_uid, n_files,
    total_bytes, file_ids sorted) — file_ids is bounded by
    target_bytes/min-file-size per row, never a partition's full list.
    """
    from .mmcurate import shard_assign

    small = files.filter(F.col(size_col) < small_bytes).select(
        F.col(partition_col), F.col(id_col), F.col(size_col)
    )
    packed = shard_assign(
        small, size_col=size_col, bucket_col=partition_col, id_col=id_col,
        target_bytes=target_bytes, keep_size=True,
    )
    groups = (
        packed.groupBy(partition_col, "shard_uid")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(F.col(size_col)).cast("long").alias("total_bytes"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("file_ids"),
        )
        .filter(F.col("n_files") >= 2)
        .select(
            F.col(partition_col),
            F.col("shard_uid").cast("long").alias("group_uid"),
            "n_files", "total_bytes", "file_ids",
        )
    )
    return groups


def vary_cache_identity(
    responses: DataFrame,
    vary_col: str = "vary",
    req_headers_col: str = "req_headers",
) -> DataFrame:
    """Vary-aware cache identity (RFC 9111 §4.1) — a response whose
    ``Vary`` header names request headers is a DIFFERENT cache object
    per combination of those request-header values: ``Vary:
    Accept-Language`` on one URL is one cached body per language the
    crawler sends, and ``Vary: *`` is uncacheable, full stop.  The
    reference's cache keys the method+uri+body only
    (src/Utils/RequestKey.php:26-42) and would serve a German page to an
    English revisit; this op derives the secondary key a shared response
    cache must use.

    Adds ``vary_key`` — the canonical secondary key: Vary field-names
    lowercased/trimmed/sorted/deduped, each paired with the request's
    value for it (absent header -> empty value, which RFC 9111 treats
    as its own match class) — and ``uncacheable`` (Vary contained
    ``*``).  Pure JVM: split/transform/array_sort/map lookup in
    whole-stage codegen; the full cache key is then
    ``request_key(method, url) x vary_key``.
    """
    vary = F.coalesce(F.col(vary_col), F.lit(""))
    names = F.array_distinct(
        F.filter(
            F.transform(F.split(F.lower(vary), ","), lambda t: F.trim(t)),
            lambda t: t != "",
        )
    )
    uncacheable = F.array_contains(names, "*")
    sorted_names = F.array_sort(names)
    # header names are case-insensitive but map keys are not: resolve
    # each vary name against the entry list case-folded, or a caller
    # passing canonical-case request headers ('Accept-Language') would
    # silently get the empty value for every vary name — collapsing the
    # distinct cache variants onto one key
    entries = F.map_entries(F.coalesce(
        F.col(req_headers_col), F.create_map().cast("map<string,string>")
    ))
    pairs = F.transform(
        sorted_names,
        lambda n: F.concat(
            n, F.lit("="),
            F.coalesce(
                F.get(
                    F.filter(entries, lambda e: F.lower(e["key"]) == n), 0
                )["value"],
                F.lit(""),
            ),
        ),
    )
    key = F.when(uncacheable, F.lit(None).cast("string")).otherwise(
        F.array_join(pairs, "&")
    )
    return responses.withColumn("vary_key", key).withColumn(
        "uncacheable", uncacheable
    )


def cache_freshness(
    responses: DataFrame,
    now_ts: int,
    out: str = "cache_state",
) -> DataFrame:
    """RFC 9111 response freshness: compute each cached response's
    freshness lifetime and current age, classify
    'uncacheable' (no-store) / 'must_revalidate' (no-cache) /
    'fresh' / 'stale' / 'heuristic_fresh' / 'heuristic_stale'.

    Lifetime precedence (RFC 9111 §4.2.1): s-maxage (shared cache) >
    max-age > (Expires - Date); with none present, the §4.2.2 heuristic
    10% of (Date - Last-Modified).  Current age = age_s + resident time
    (now - response_ts) — the §4.2.3 simplification for a single-hop
    cache.  All integer seconds, pure JVM CASE expressions in codegen —
    the revalidation planner runs this over 10^10 stored rows, so no
    regex per directive: one lowercase + locate per token.

    Expects columns: cache_control (string|null), expires_ts, date_ts,
    last_modified_ts, age_s (long|null), response_ts (long, when the
    cache stored it).  reference: the reference's FileCache has TTL only
    (src/Loader/Http/Cache/FileCache.php) — no header-driven lifetime.

    Returns input + (freshness_lifetime_s, current_age_s, <out>).
    """
    cc = F.lower(F.coalesce(F.col("cache_control"), F.lit("")))

    def directive_val(name: str):
        # value of `name=N` inside the comma-separated cache-control;
        # the boundary guard keeps 'max-age' from matching inside
        # 's-maxage=' (RE2-safe: no lookbehind)
        pat = r"(?:^|[, ;])" + name + r"=(\d+)"
        v = F.regexp_extract(cc, pat, 1)
        return F.when(v != "", v.cast("long"))

    s_maxage = directive_val("s-maxage")
    max_age = directive_val("max-age")
    expires_life = F.when(
        F.col("expires_ts").isNotNull() & F.col("date_ts").isNotNull(),
        F.greatest(F.col("expires_ts") - F.col("date_ts"), F.lit(0)),
    )
    heuristic = F.when(
        F.col("last_modified_ts").isNotNull() & F.col("date_ts").isNotNull()
        & (F.col("date_ts") > F.col("last_modified_ts")),
        F.expr("(date_ts - last_modified_ts) div 10"),
    )
    explicit = F.coalesce(s_maxage, max_age, expires_life)
    lifetime = F.coalesce(explicit, heuristic, F.lit(0)).cast("long")
    age = (
        F.coalesce(F.col("age_s"), F.lit(0))
        + (F.lit(int(now_ts)) - F.col("response_ts"))
    ).cast("long")
    state = (
        F.when(cc.contains("no-store"), F.lit("uncacheable"))
        .when(cc.contains("no-cache"), F.lit("must_revalidate"))
        .when(explicit.isNotNull(),
              F.when(age < lifetime, F.lit("fresh")).otherwise(F.lit("stale")))
        .when(heuristic.isNotNull(),
              F.when(age < lifetime, F.lit("heuristic_fresh"))
              .otherwise(F.lit("heuristic_stale")))
        .otherwise(F.lit("stale"))
    )
    return responses.withColumn(
        "freshness_lifetime_s", lifetime
    ).withColumn("current_age_s", age).withColumn(out, state)


def z_interleave(x, y, bits: int = 16):
    """Morton/Z-order value: interleave the low ``bits`` bits of two
    non-negative ints (x at even positions, y at odd).  Pure shift/and
    arithmetic — whole-stage codegen on Spark, replayable bit-for-bit in
    SQL.  2*bits <= 62 keeps everything in a signed long."""
    xx = x.cast("long")
    yy = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(int(bits)):
        z = (
            z
            + F.shiftleft(F.shiftright(xx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    rows_per_file: int,
    bits: int = 16,
) -> DataFrame:
    """Iceberg/Delta-style Z-ORDER rewrite planning: sort rows by the
    Morton interleave of two pruning dimensions (e.g. host_bucket x
    time_bucket), cut into ``rows_per_file`` files, and report each
    file's bounding box in BOTH dimensions — the min/max column stats a
    scan planner prunes on.  Z-ordering keeps each file's box small in
    x AND y simultaneously, where a plain sort on x gives files that
    span the full y range (one-dimensional pruning only).

    The sort-and-cut uses ranks.global_rank (range partition + offsets),
    never a single-partition window; stats are one map-side-combined
    groupBy on file_id.

    Returns (file_id, n_rows, x_min, x_max, y_min, y_max, bbox_area)
    with bbox_area = (x_max-x_min+1)*(y_max-y_min+1) — the pruning
    quality metric (smaller = more selective file skipping).
    """
    from .ranks import global_rank

    z = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumn("z", z_interleave(F.col("x"), F.col("y"), bits))
    # (z, x, y) is a total order tiebreak for duplicate z values
    ranked = global_rank(z, key=["z", "x", "y"], out="rk")
    files = ranked.withColumn(
        "file_id", F.expr(f"(rk - 1) div {int(rows_per_file)}")
    )
    return files.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("x").alias("x_min"), F.max("x").alias("x_max"),
        F.min("y").alias("y_min"), F.max("y").alias("y_max"),
    ).withColumn(
        "bbox_area",
        ((F.col("x_max") - F.col("x_min") + 1)
         * (F.col("y_max") - F.col("y_min") + 1)).cast("long"),
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str = "host",
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted table write (``bucketBy`` + ``sortBy`` +
    ``saveAsTable``) — the storage layout that makes the frontier's
    recurring joins EXCHANGE-FREE: two tables bucketed on the same key
    with the same bucket count sort-merge join with NO shuffle on either
    side (asserted in tests/test_bucketed_join.py by scanning the plan
    for Exchange).  This is the cluster answer to the localCheckpoint
    partitioning loss documented in BENCH.md: `repartition(k).
    localCheckpoint()` forgets its partitioning, but bucket metadata
    lives in the catalog and survives restarts, executors, and rounds —
    a 10^10-row seen set bucketed by url_hash joins each wave's
    candidates (bucketed the same way) with zero wide shuffles per
    level.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(
        int(num_buckets), bucket_col
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def stale_policy(
    responses: DataFrame,
    now_ts: int,
    out: str = "stale_state",
) -> DataFrame:
    """RFC 5861 staleness extensions on top of :func:`cache_freshness`:
    after a response goes stale, ``stale-while-revalidate=N`` lets a
    cache SERVE it for N more seconds while refetching in the
    background, and ``stale-if-error=N`` lets it paper over upstream
    5xx/timeouts for N seconds — the two directives a polite crawler's
    cache layer uses to avoid hammering an origin the moment content
    expires.  States:

      'fresh'                     age < lifetime
      'stale_serve_revalidate'    lifetime <= age < lifetime + swr
      'stale_if_error_only'       beyond swr but inside lifetime + sie
      'expired'                   beyond both windows
      'uncacheable'/'must_revalidate' carried from cache_freshness

    Adds (swr_s, sie_s, <out>).  Same integer-second arithmetic and
    boundary-guarded directive parsing as the base classifier.
    """
    base = cache_freshness(responses, now_ts=now_ts, out="__cf")
    cc = F.lower(F.coalesce(F.col("cache_control"), F.lit("")))

    def directive_val(name: str):
        pat = r"(?:^|[, ;])" + name + r"=(\d+)"
        v = F.regexp_extract(cc, pat, 1)
        return F.when(v != "", v.cast("long"))

    swr = F.coalesce(directive_val("stale-while-revalidate"), F.lit(0))
    sie = F.coalesce(directive_val("stale-if-error"), F.lit(0))
    age = F.col("current_age_s")
    life = F.col("freshness_lifetime_s")
    state = (
        F.when(F.col("__cf").isin("uncacheable", "must_revalidate"),
               F.col("__cf"))
        .when(age < life, F.lit("fresh"))
        .when(age < life + swr, F.lit("stale_serve_revalidate"))
        .when(age < life + F.greatest(swr, sie),
              F.lit("stale_if_error_only"))
        .otherwise(F.lit("expired"))
    )
    return (
        base.withColumn("swr_s", swr.cast("long"))
        .withColumn("sie_s", sie.cast("long"))
        .withColumn(out, state)
        .drop("__cf")
    )


def xsort_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    rows_per_file: int,
) -> DataFrame:
    """One-dimensional sort-and-cut baseline for :func:`zorder_layout`:
    sort by x only (y rides along), cut into ``rows_per_file`` files,
    report the same per-file bounding-box stats.  x-predicates prune
    perfectly; y-predicates see every file — the layout to beat."""
    from .ranks import global_rank

    pts = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    ranked = global_rank(pts, key=["x", "y"], out="rk")
    files = ranked.withColumn(
        "file_id", F.expr(f"(rk - 1) div {int(rows_per_file)}")
    )
    return files.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("x").alias("x_min"), F.max("x").alias("x_max"),
        F.min("y").alias("y_min"), F.max("y").alias("y_max"),
    ).withColumn(
        "bbox_area",
        ((F.col("x_max") - F.col("x_min") + 1)
         * (F.col("y_max") - F.col("y_min") + 1)).cast("long"),
    )


def zone_map_prune(
    file_stats: DataFrame,
    probes: DataFrame,
    layout: str,
) -> DataFrame:
    """Scan-pruning evaluation: how many files does each probe's
    predicate box actually have to read, given the per-file min/max
    zone maps a layout produced?  A file is scanned iff its bounding
    box INTERSECTS the probe box — exactly the manifest-level pruning
    Iceberg/Delta and Spark's parquet reader do with column stats.
    This turns "z-order is better" into a number BEFORE rewriting
    10^10 rows: run the same probe workload against both layouts'
    stats and compare scan_permille.

    The probe workload is a bounded relation (tens of predicates) and
    the file-stats side is |data| / rows_per_file rows — the
    intersect join broadcasts the probes, never the stats.

    Returns ONE row per layout: (layout, n_files, n_probes,
    file_scans, scan_permille) with scan_permille = 1000 *
    file_scans / (n_files * n_probes).
    """
    fs = file_stats.select("file_id", "x_min", "x_max", "y_min", "y_max")
    hits = fs.join(
        F.broadcast(probes),
        (F.col("x_min") <= F.col("x_hi"))
        & (F.col("x_max") >= F.col("x_lo"))
        & (F.col("y_min") <= F.col("y_hi"))
        & (F.col("y_max") >= F.col("y_lo")),
    )
    counts = hits.agg(F.count(F.lit(1)).cast("long").alias("file_scans"))
    nf = fs.agg(F.count(F.lit(1)).cast("long").alias("n_files"))
    np_ = probes.agg(F.count(F.lit(1)).cast("long").alias("n_probes"))
    return (
        counts.crossJoin(nf).crossJoin(np_)
        .select(
            F.lit(layout).alias("layout"),
            "n_files", "n_probes", "file_scans",
            F.expr("(1000 * file_scans) div (n_files * n_probes)")
            .alias("scan_permille"),
        )
    )


def cow_mor_plan(
    file_stats: DataFrame,
    updates: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Copy-on-write vs merge-on-read maintenance planning for an
    Iceberg-style table: given per-file key ranges (x_min/x_max zone
    maps over the table key) and a batch of update keys, compute what
    each strategy costs — CoW rewrites every row of every touched file
    NOW (write amplification, clean reads after); MoR writes only
    delete markers NOW but every future read of a touched file must
    also merge its deletes (read amplification until compaction).
    The crossover is the update-spread: sparse scattered updates make
    CoW rewrite nearly the whole table for a handful of rows.

    Updates map to files via the zone maps (a range join with the
    bounded update batch broadcast).  Integer-exact outputs.

    Returns ONE row: (n_files, files_touched, table_rows,
    cow_rewrite_rows, n_updates, mor_delete_rows,
    mor_read_amp_permille) — mor_read_amp_permille = 1000 *
    rows-in-touched-files / table_rows (the share of future scans
    paying the merge tax).
    """
    fs = file_stats.select("file_id", "n_rows", "x_min", "x_max")
    u = updates.select(F.col(key_col).cast("long").alias("k"))
    touched = (
        fs.join(
            F.broadcast(u),
            (F.col("k") >= F.col("x_min")) & (F.col("k") <= F.col("x_max")),
        )
        .groupBy("file_id", "n_rows")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    tot = fs.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("table_rows"),
    )
    upd = u.agg(F.count(F.lit(1)).cast("long").alias("n_updates"))
    tch = touched.agg(
        F.count(F.lit(1)).cast("long").alias("files_touched"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long")
        .alias("cow_rewrite_rows"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long")
        .alias("mor_delete_rows"),
    )
    return (
        tot.crossJoin(upd).crossJoin(tch)
        .select(
            "n_files", "files_touched", "table_rows", "cow_rewrite_rows",
            "n_updates", "mor_delete_rows",
            F.expr("(1000 * cow_rewrite_rows) div table_rows")
            .alias("mor_read_amp_permille"),
        )
    )


def etag_strength_decisions(
    cache: DataFrame,
    etag_col: str = "etag",
    use_col: str = "use",
) -> DataFrame:
    """Weak vs strong ETag semantics (RFC 9110 §8.8.1 + §13.1): a
    ``W/"..."`` validator is good enough to answer "has this changed
    at all?" (If-None-Match revalidation uses the WEAK comparison)
    but must never validate a byte-range resume — If-Range / Range
    continuation requires the STRONG comparison, because a weakly
    equal entity may differ byte-for-byte and splice corrupt files.
    The resumable-download path (:func:`crawlspark.fetch
    .resume_ranges`) consumes exactly this gate.

    ``use`` in {'if_none_match', 'if_range'}.  Pure string ops.
    Returns (etag, use, is_weak, opaque, usable) — usable false for
    weak validators on the if_range path and for absent/malformed
    etags everywhere.
    """
    e = F.col(etag_col)
    is_weak = e.startswith('W/"')
    opaque = F.regexp_extract(e, r'^(?:W/)?"(.*)"$', 1)
    well_formed = e.rlike(r'^(?:W/)?"[^"]*"$')
    usable = well_formed & (
        (F.col(use_col) == "if_none_match")
        | (~is_weak & (F.col(use_col) == "if_range"))
    )
    return cache.select(
        e.alias("etag"),
        F.col(use_col).alias("use"),
        F.when(well_formed, is_weak).alias("is_weak"),
        F.when(well_formed, opaque).alias("opaque"),
        usable.alias("usable"),
    )


def webdataset_shard_plan(
    samples: DataFrame,
    id_col: str = "image_id",
    size_col: str = "n_bytes",
    target_bytes: int = 1 << 30,
    num_rows: int | None = None,
) -> DataFrame:
    """WebDataset-style tar shard assignment for an image+caption
    training set — the write side of the input_hint table: samples in
    a DETERMINISTIC key order are packed contiguously into shards of
    ~``target_bytes`` (webdataset readers stream whole tars, so
    contiguity in key order is the contract; a size-balanced but
    order-scrambled assignment would break resumable epoch iteration).

        shard_id = floor(exclusive_prefix_bytes / target_bytes)

    The prefix sum is the two-phase :func:`crawlspark.ranks
    .global_prefix_sum` — range-partition on the key, per-partition
    sums, broadcast offsets; NO single-partition window at any size
    (the naive ``sum() over (order by id)`` collapses 10^9 samples
    onto one task).  Assignment is by START offset, so a sample may
    straddle its boundary: shard k holds samples starting in
    [k*target, (k+1)*target) and its byte size is bounded by
    target_bytes + max sample size — the streaming-writer contract
    (greedy close-at-target is inherently sequential; this is the
    order-preserving distributed equivalent).  Returns (image_id,
    n_bytes, shard_id, offset_in_shard).
    """
    from .ranks import global_prefix_sum

    s = samples.select(F.col(id_col).alias("image_id"),
                       F.col(size_col).cast("long").alias("n_bytes"))
    pre = global_prefix_sum(
        s, order_cols=["image_id"], val_col="n_bytes", out="__pre",
        num_rows=num_rows,
    )
    return pre.select(
        "image_id", "n_bytes",
        F.expr(f"__pre div {int(target_bytes)}L").alias("shard_id"),
        F.expr(f"__pre % {int(target_bytes)}L").alias("offset_in_shard"),
    )


def sitemap_emit(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    lastmod_col: str | None = None,
    cap: int = 50_000,
) -> DataFrame:
    """Sitemap PUBLISHING — the inverse of Sitemap::getUrlsFromSitemap
    (reference src/Steps/Sitemap/GetUrlsFromSitemap.php parses; a crawl
    infrastructure also re-publishes its canonical URL inventory, e.g.
    for mirror seeding or search-engine handoff).  Per host, URLs are
    sorted and split into shards of at most ``cap`` entries (the
    sitemaps.org protocol limit is 50,000 per file), each rendered as a
    complete <urlset> XML document, with per-shard stats for the index.

    Plan: ONE partitioned window (row_number per host, ordered by URL)
    for shard assignment, then a groupBy((host, shard)) whose
    collect_list is array_sort'ed before rendering — deterministic
    under any partitioning, bounded at ``cap`` entries per group.
    Returns (host, shard, n_urls, first_url, xml).
    """
    from pyspark.sql import Window

    lastmod = (
        F.col(lastmod_col).cast("string") if lastmod_col is not None
        else F.lit(None).cast("string")
    )
    rows = urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        lastmod.alias("__lm"),
    ).withColumn(
        "shard", ((F.row_number().over(
            Window.partitionBy("host").orderBy("url")) - 1)
            / F.lit(int(cap))).cast("long"),
    )
    # sitemaps.org REQUIRES entity-escaped values: a bare '&' in a query
    # string (ubiquitous) would otherwise make the whole shard ill-formed
    xml_esc = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(F.regexp_replace(c, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;",
    )
    entry = lambda s: F.concat(  # noqa: E731
        F.lit("<url><loc>"), xml_esc(s.getField("url")), F.lit("</loc>"),
        F.when(
            s.getField("__lm").isNotNull(),
            F.concat(F.lit("<lastmod>"), xml_esc(s.getField("__lm")),
                     F.lit("</lastmod>")),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    grouped = (
        rows.groupBy("host", "shard")
        .agg(F.array_sort(
            F.collect_list(F.struct("url", "__lm"))).alias("__es"))
    )
    xml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        F.array_join(F.transform(F.col("__es"), entry), ""),
        F.lit("</urlset>"),
    )
    return grouped.select(
        "host", "shard",
        F.size("__es").cast("long").alias("n_urls"),
        F.element_at(F.col("__es"), 1).getField("url").alias("first_url"),
        xml.alias("xml"),
    )
