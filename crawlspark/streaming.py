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

    ``dropDuplicatesWithinWatermark`` keyed on url_hash bounds the streaming
    state: Spark evicts a key's dedup state once the watermark passes it.
    (Plain ``dropDuplicates`` on a non-event-time subset keeps EVERY key
    forever even under withWatermark — unbounded state at 10^10 URLs.)  The
    cross-batch seen-set stays in the batch-side anti-join; the stream only
    removes the duplicate storm around discovery time, which is where almost
    all dupes occur."""
    out = (
        links.withColumn("url_norm", canonicalize_expr(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("url_norm")))
        .withColumn("host", F.parse_url("url_norm", F.lit("HOST")))
        .withColumn("host_bucket", host_bucket(F.col("host"), num_buckets))
        .withWatermark("discovered_at", watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
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


# --------------------------------------------------------------------------
# stateful per-host admission (applyInPandasWithState)
# --------------------------------------------------------------------------

ADMIT_OUTPUT_SCHEMA = (
    "host STRING, url STRING, ord LONG, admitted BOOLEAN, host_seq LONG"
)
ADMIT_STATE_SCHEMA = "total_admitted LONG"


def politeness_admission_stream(
    links: DataFrame, budget_per_host: int
) -> DataFrame:
    """Continuous per-host admission control as a custom stateful operator.

    The batch engine enforces politeness per wave (throttle_schedule); a
    continuously-fed frontier needs the same cap as running state: each
    host may admit at most ``budget_per_host`` URLs over the stream's
    lifetime (the reference's maxOutputs budget, HttpCrawl.php:171-175,
    crossed with the per-domain throttle ownership of Throttler.php —
    one host's state lives on one partition, exactly like the batch
    host-bucket repartition).

    applyInPandasWithState keys state by host; per batch the group's rows
    arrive as Arrow batches, are ranked in ord order, and rows beyond the
    remaining budget come back admitted=false (downstream either defers or
    drops them).  host_seq is the host's global 1-based admission number —
    continuity across micro-batches is the state-carry proof the tests
    assert."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def admit(key, pdfs, state: "GroupState"):
        (host,) = key
        total = state.get[0] if state.exists else 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        import numpy as np

        batch = pd.concat(chunks).sort_values("ord")
        seq = total + np.arange(1, len(batch) + 1, dtype=np.int64)
        out = pd.DataFrame(
            {
                "host": host,
                "url": batch["url"].values,
                "ord": batch["ord"].values,
                "admitted": seq <= budget_per_host,
                "host_seq": seq,
            }
        )
        state.update((int(total + len(batch)),))
        yield out

    return links.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=ADMIT_OUTPUT_SCHEMA,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
