"""Structured-Streaming frontier ingestion.

The reference is a batch engine (no streaming concepts, SURVEY.md §2.10),
but a production frontier at 10^10 URLs is fed continuously: discovered
links arrive as a stream, get canonicalized/fingerprinted, deduped within a
watermark, and appended to the frontier table.  This module provides that
ingestion path; the BFS loop itself stays level-synchronous batch by design
(matching the reference's crawl semantics).

Tested with file sources + ``trigger(availableNow=True)`` so the pipeline
runs deterministically in CI; swap the source for Kafka in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import canonicalize_expr, host_bucket, url_hash


def discovered_links_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str = "url STRING, discovered_at TIMESTAMP",
) -> DataFrame:
    return spark.readStream.schema(schema).json(source_dir)


def frontier_ingest(
    links: DataFrame,
    watermark: str = "10 minutes",
    num_buckets: int = 1024,
) -> DataFrame:
    """Canonicalize -> fingerprint -> in-watermark exact dedup.

    ``dropDuplicates`` keyed on url_hash with an event-time watermark bounds
    the streaming state — the cross-batch seen-set stays in the batch-side
    anti-join (the stream only removes the duplicate storm around discovery
    time, which is where almost all dupes occur)."""
    out = (
        links.withColumn("url_norm", canonicalize_expr(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("url_norm")))
        .withColumn("host", F.parse_url("url_norm", F.lit("HOST")))
        .withColumn("host_bucket", host_bucket(F.col("host"), num_buckets))
        .withWatermark("discovered_at", watermark)
        .dropDuplicates(["url_hash"])
    )
    return out


def run_ingest_once(
    spark: SparkSession, source_dir: str, sink_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently in source_dir into the frontier sink
    (deterministic batch-like execution of the streaming graph)."""
    stream = frontier_ingest(discovered_links_stream(spark, source_dir))
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
