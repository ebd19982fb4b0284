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


# --------------------------------------------------------------------------
# continuous image-payload validation (north-rule invariants as a stream)
# --------------------------------------------------------------------------

IMAGE_STREAM_SCHEMA = (
    "image_id STRING, bytes BINARY, w INT, h INT, fmt STRING, "
    "caption STRING, phash LONG"
)  # == images.IMAGE_SCHEMA (the input_hint table shape)


def image_validation_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    ref_captions: DataFrame,
    max_files_per_trigger: int = 1,
) -> None:
    """Continuous payload validation: input_hint image rows arrive on a
    parquet file stream (an Iceberg CDC feed / Kafka in production), the
    north-rule per-row invariants — decoded-pixel allclose / PSNR >= 40 dB
    for lossy, phash equality, exact caption equality — run per micro-batch
    through the SAME Arrow ``mapInPandas`` stage the batch pipeline uses
    (images.validate_images), and each batch appends passing rows to
    ``out_dir/results`` and the rest to ``out_dir/quarantine`` with batch
    provenance.

    foreachBatch rather than a streaming join: the validation itself is
    stateless per row, and the caption reference is a STATIC relation —
    a static-batch join inside the batch closure needs no watermark and
    reuses the batch plan (broadcast when small).  The streaming
    checkpoint makes file delivery exactly-once across restarts; each
    batch's two writes land in a ``batch_id=N`` partition via dynamic
    partition overwrite, so a crash between a write and the checkpoint
    commit replays the batch INTO THE SAME partition (replacing it, not
    appending duplicates) — the parquet analog of an Iceberg MERGE on
    the batch key.  Validation is deterministic per row, so a replayed
    batch rewrites byte-identical partitions."""
    from . import images

    def process(batch: DataFrame, batch_id: int) -> None:
        checks = images.validate_images(batch).select(
            "image_id", "psnr_mdb", "lossless_ok", "phash_match"
        )
        validated = batch.join(checks, "image_id").join(
            F.broadcast(ref_captions), "image_id", "left"
        )
        valid = (
            (F.col("psnr_mdb") >= 40_000)
            & F.col("lossless_ok")
            & F.col("phash_match")
        )
        caption_ok = F.coalesce(
            F.col("caption") == F.col("ref_caption"), F.lit(False)
        )
        out = validated.select(
            "image_id", "fmt", "caption", "psnr_mdb",
            F.coalesce(valid, F.lit(False)).alias("valid"),
            caption_ok.alias("caption_ok"),
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
        ).localCheckpoint(eager=True)  # one validation pass feeds both sinks
        ok = out.filter(F.col("valid") & F.col("caption_ok"))
        bad = out.filter(~(F.col("valid") & F.col("caption_ok")))
        # dynamic partition overwrite on batch_id: a replayed batch
        # replaces its own partition instead of appending duplicates
        (ok.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(f"{out_dir}/results"))
        if bad.count():
            (bad.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(f"{out_dir}/quarantine"))

    q = (
        spark.readStream.schema(IMAGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------------------
# continuous crawl: foreachBatch micro-batch BFS with persistent seen state
# --------------------------------------------------------------------------

def continuous_crawl(
    spark: SparkSession,
    seeds_dir: str,
    state_dir: str,
    n: int,
    max_depth: int = 3,
    max_files_per_trigger: int = 1,
) -> None:
    """Continuous crawling as a streaming job: seed batches arrive on a
    file stream (Kafka in production); each micro-batch runs a depth-limited
    BFS expansion against the CUMULATIVE cross-batch seen set, appends its
    discoveries to ``state_dir/results`` and persists the updated seen set
    to ``state_dir/seen``.

    Semantics (the long-lived analog of the reference's one-shot crawl,
    src/Steps/Loading/HttpCrawl.php:45-53 in-memory ``loadedUrls``): a page
    crawled by ANY earlier batch is never re-crawled NOR re-expanded — its
    outlinks were already followed when it was first loaded.  Batch 0's
    output is therefore byte-identical to the batch engine's BFS from the
    same seeds; later batches crawl only the frontier the earlier crawl
    never reached.

    Scale shape: the per-batch loop is the frontier.py level loop (explode
    expansion, map-side-combined groupBy-min, anti-join against seen, all
    localCheckpointed so plans stay O(1) in depth); the seen set lives in
    the parquet state dir, not the driver, and the streaming checkpoint dir
    makes seed delivery exactly-once across restarts."""
    from . import graph
    from .frontier import _expand

    results_dir = f"{state_dir}/results"
    seen_dir = f"{state_dir}/seen"

    def process(batch: DataFrame, batch_id: int) -> None:
        try:
            seen = spark.read.parquet(seen_dir).select("doc")
        except Exception:
            seen = spark.createDataFrame([], "doc LONG")
        # materialize BEFORE the end-of-batch overwrite of seen_dir
        seen = seen.localCheckpoint(eager=True)
        # seeds are NOT robots-filtered — matching the batch engine
        # (frontier._crawl seeds go straight to the frontier; only EXPANDED
        # candidates pass the blocked gate)
        frontier = (
            batch.select("doc").distinct()
            .join(seen, "doc", "left_anti")
            .withColumn("ord", F.lit(1).cast("long"))
            .localCheckpoint(eager=True)
        )
        levels: list[DataFrame] = []
        depth = 0
        while depth <= max_depth and frontier.count() > 0:
            levels.append(
                frontier.select("doc", F.lit(depth).cast("long").alias("depth"))
            )
            seen = seen.union(frontier.select("doc")).localCheckpoint(eager=True)
            if depth == max_depth:
                break
            frontier = (
                _expand(frontier, n)
                .groupBy("doc")
                .agg(F.min("rk").alias("ord"))
                .filter(~graph.blocked_col(F.col("doc")))
                .join(seen, "doc", "left_anti")
                .localCheckpoint(eager=True)
            )
            depth += 1
        if levels:
            out = levels[0]
            for lv in levels[1:]:
                out = out.unionByName(lv)
            # dynamic partition overwrite on batch_id (same contract as
            # image_validation_stream): a replayed batch replaces its own
            # partition instead of appending duplicates.  Replay is
            # deterministic both ways: crash before the seen overwrite
            # recomputes identical rows; crash after it finds an empty
            # frontier and leaves the first attempt's partition intact.
            (out.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(results_dir))
        seen.write.mode("overwrite").parquet(seen_dir)

    q = (
        spark.readStream.schema("doc LONG")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(seeds_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{state_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------------------
# event-time windowed crawl-rate metrics (watermark-finalized, late-safe)
# --------------------------------------------------------------------------


def crawl_rate_stream(
    links: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host discovery-rate metrics over event-time tumbling windows —
    the operational dashboard every crawl needs (reference analog: the
    run-wide Statistics counters of src/Crawler.php, which a single
    process can keep exact; a distributed stream cannot, so windows +
    watermark bound both state and lateness).

    Semantics under ``withWatermark``: rows later than ``watermark``
    behind the max observed event time are DROPPED; windows finalize —
    and, in append mode, emit exactly once — when the watermark passes
    their end.  State is O(open windows x active hosts), never
    O(stream length).

    Plan: groupBy(window, host) is a streaming hash aggregate partitioned
    by (window, host) — hot hosts spread across windows, and the same
    host-bucket salting the batch engine uses applies upstream if one
    host floods a single window.
    """
    return (
        links.withWatermark("discovered_at", watermark)
        .groupBy(
            F.window(F.col("discovered_at"), window).alias("win"),
            F.col("host"),
        )
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            # streaming forbids exact distinct aggregates (they'd need the
            # full key set as state); the HLL sketch is the right call —
            # frontier_ingest already removed in-watermark exact dupes
            # upstream, this counts what slips across watermark boundaries
            F.approx_count_distinct(F.col("url_hash")).cast("long").alias(
                "n_unique_est"
            ),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "n_urls",
            "n_unique_est",
        )
    )


def watermark_lateness(
    events: DataFrame,
    part_col: str = "part",
    ts_col: str = "ts_us",
    arrival_col: str = "arrival",
    delay_us: int = 600_000_000,
) -> DataFrame:
    """Batch replay of per-source-partition watermark accounting — the
    sizing study behind every ``withWatermark`` choice: how many
    events WOULD a delay of ``delay_us`` have dropped, and how far
    behind the watermark do the stragglers arrive?  Structured
    Streaming tracks max-event-time per source partition and subtracts
    the delay; an event is late when it arrives after the watermark
    its partition had already advanced past.

    Exactly that, replayed: per partition in arrival order, watermark
    before event i = max(event time over earlier arrivals) - delay
    (exclusive running max — the watermark known when i ARRIVES), late
    = ts < watermark.  The window is PARTITIONED by source partition —
    the same key Spark scopes real watermarks by — so the running max
    never collapses to one task.

    Returns per partition (part, n_events, n_late, late_permille,
    max_lateness_us): max_lateness_us = worst watermark overshoot
    among late events (NULL when none).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col).orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts = F.col(ts_col).cast("long")
    wm = F.max(ts).over(w) - F.lit(int(delay_us))
    rows = events.withColumn("__wm", wm).withColumn(
        "__late", F.coalesce(ts < F.col("__wm"), F.lit(False)))
    return (
        rows.groupBy(F.col(part_col).alias("part"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("__late"), 1).otherwise(0)).cast("long")
            .alias("n_late"),
            F.max(F.when(F.col("__late"), F.col("__wm") - ts))
            .cast("long").alias("max_lateness_us"),
        )
        .withColumn(
            "late_permille",
            F.expr("(1000 * n_late) div n_events"),
        )
        .select("part", "n_events", "n_late", "late_permille",
                "max_lateness_us")
    )


def hopping_window_counts(
    events: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    window_len: int = 300,
    hop: int = 60,
) -> DataFrame:
    """Hopping (sliding) window counts as a batch replay — the other
    window family next to the tumbling ``window_agg``: every event
    belongs to ``window_len/hop`` overlapping windows, which is
    exactly how Spark's ``window(ts, '5 minutes', '1 minute')``
    assigns rows.  The batch twin keeps the gate's oracle discipline
    (explode the covering window starts, one map-side-combined
    groupBy) and doubles as the sizing study for the streaming state:
    rows_out = rows_in * (len/hop).

    Window start for event t: every w = hop * k with
    w > t - window_len and w <= t.  Returns (key, window_start,
    n_events, n_keys_distinct is left to callers).  ``window_len``
    must be a multiple of ``hop`` (asserted).
    """
    assert window_len % hop == 0, "window_len must be a multiple of hop"
    per = window_len // hop
    t = F.col(ts_col).cast("long")
    first = (t - (window_len - hop)).cast("long")
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(per - 1)),
        lambda i: F.floor((first + i * hop) / hop) * hop,
    )
    covering = F.filter(
        starts, lambda w: (w > t - window_len) & (w <= t))
    return (
        events.select(F.col(key_col).alias("key"), t.alias("__t"),
                      F.explode(covering).alias("window_start"))
        .groupBy("key", "window_start")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def late_correction_deltas(
    finalized: DataFrame,
    late: DataFrame,
    key_col: str = "key",
    window_col: str = "window_start",
    count_col: str = "n_events",
) -> DataFrame:
    """Late-event correction deltas — what a downstream consumer must
    APPLY when events arrive after their window was emitted: Spark's
    append-mode windows simply drop post-watermark rows, update mode
    re-emits whole rows; a delta feed (window, +k) is the compact
    contract between the two (the retraction/correction stream of the
    dataflow model, Akidau et al. VLDB'15).

    One map-side-combined groupBy over the late rows, then a LEFT
    join against the finalized relation on (key, window) — co-
    partitioned equi-join; late volume is tiny next to the finalized
    table.  Returns (key, window_start, old_n, delta, new_n,
    was_emitted) — was_emitted false when the late event opens a
    window the consumer never saw (the delta is the whole row).
    """
    lt = (
        late.groupBy(F.col(key_col).alias("key"),
                     F.col(window_col).alias("window_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("delta"))
    )
    fin = finalized.select(
        F.col(key_col).alias("key"),
        F.col(window_col).alias("window_start"),
        F.col(count_col).cast("long").alias("old_n"),
    )
    j = lt.join(fin, ["key", "window_start"], "left")
    return j.select(
        "key", "window_start",
        F.coalesce("old_n", F.lit(0)).alias("old_n"),
        "delta",
        (F.coalesce("old_n", F.lit(0)) + F.col("delta")).alias("new_n"),
        F.col("old_n").isNotNull().alias("was_emitted"),
    )


def event_path_trigrams(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    min_count: int = 5,
) -> DataFrame:
    """Common 3-step behavior paths — the sequence-mining counterpart
    of the ordered funnel: instead of checking ONE hypothesized
    funnel, surface which (a -> b -> c) event trigrams actually
    dominate user timelines (the input a funnel analyst starts from).

    Per user one partitioned collect in (ts, tiebreak) order, then
    the same index-transform shingling the text n-gram ops use —
    never a self-join on the event table.  Returns (e1, e2, e3, c)
    for trigrams with c >= min_count.
    """
    base = (
        events.select(F.col(user_col).alias("u"),
                      F.col(ts_col).alias("ts"),
                      F.col(type_col).alias("e"))
        .groupBy("u")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "e"))),
            lambda s: s["e"],
        ).alias("seq"))
    )
    tri = base.select(
        F.explode(
            F.when(
                F.size("seq") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("seq") - 2),
                    lambda i: F.struct(
                        F.element_at("seq", i).alias("e1"),
                        F.element_at("seq", i + 1).alias("e2"),
                        F.element_at("seq", i + 2).alias("e3"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<e1:string,e2:string,e3:string>>"))
        ).alias("t")
    )
    return (
        tri.groupBy("t.e1", "t.e2", "t.e3")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= int(min_count))
    )


def stickiness_ratios(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU/MAU stickiness over an activity log — the engagement
    one-rower (avg daily actives / monthly actives; the classic
    product metric applied here to recrawl demand: sticky usage means
    the FRESHNESS of those hosts' content is worth paying for).

    Day bucketing in epoch days; one distinct per (day, user), then
    exact integer aggregates.  Returns one row (n_days, avg_dau_milli,
    wau_peak, mau, stickiness_permille) with stickiness =
    1000 * avg_dau / mau.
    """
    day = (F.unix_micros(F.col(ts_col).cast("timestamp"))
           / 86_400_000_000).cast("long")
    du = events.select(F.col(user_col).alias("u"),
                       day.alias("d")).distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("a"))
    wau = (
        du.select((F.col("d") / 7).cast("long").alias("w"), "u")
        .distinct()
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("a"))
    )
    stats = dau.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("a").cast("long").alias("dau_sum"),
    )
    wpeak = wau.agg(F.max("a").alias("wau_peak"))
    mau = du.agg(F.countDistinct("u").cast("long").alias("mau"))
    return (
        stats.crossJoin(F.broadcast(wpeak)).crossJoin(F.broadcast(mau))
        .select(
            "n_days",
            F.expr("(1000 * dau_sum) div n_days").alias("avg_dau_milli"),
            "wau_peak", "mau",
            F.expr("(1000 * dau_sum) div (n_days * mau)")
            .alias("stickiness_permille"),
        )
    )
