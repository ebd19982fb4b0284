"""Level-synchronous BFS crawl driver loop — the engine's spine.

Reproduces the reference crawler's semantics (reference:
src/Steps/Loading/HttpCrawl.php:145-236) on Spark:

- level-synchronous BFS: depth-d pages fetched only after depth-(d-1)
  (single thread makes this implicit in the reference; here it is a per-level
  barrier, one Spark job per level),
- first-discovery ordering within a level: the reference accumulates next
  level links with ``array_merge`` on string keys, keeping the FIRST position
  (HttpCrawl.php:221,294-331); we compute it as
  ``min(parent_ord * ORD_STRIDE + link_pos)`` per URL then a global rank,
- URL-seen set: every crawled doc enters ``seen``; candidates are removed by
  LEFT ANTI join (HttpCrawl.php:282,325 — exact-match semantics),
- robots gate: blocked pages never fetched (RobotsTxtHandler.php:43-97),
- depth limit: loop runs while depth <= max_depth (HttpCrawl.php:409-412),
- maxOutputs budget honored mid-crawl (HttpCrawl.php:171-175,226-231).

Scale notes (10^10 frontier): each level is one shuffle on ``doc`` for the
expand+dedup (map-side combine via groupBy-min), one anti-join against seen —
past ``CrawlConfig.prefilter_min_seen`` rows the
:class:`crawlspark.seen.PartitionedSeenFilter` (bucket-keyed cuckoo states,
cogroup-maintained, never on the driver) prunes candidates the filter proves
unseen before they reach the anti-join exchange — and a distributed two-phase
rank (:mod:`crawlspark.ranks`).  Per-level ``localCheckpoint`` truncates
lineage so plan size stays O(1) in depth.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph
from .ranks import global_rank

# per-wave diagnostic trace of the most recent _crawl call on this driver
# (depth, wave size, cumulative seen, candidate-materialization seconds,
# whether the seen-prefilter was engaged) — bench evidence only, not part
# of any query result; cleared at the start of each crawl
LAST_CRAWL_LEVEL_METRICS: list[dict] = []


@dataclass
class CrawlConfig:
    max_depth: int = 6
    seed_doc: int = 0
    # >1: seed docs [seed_doc, seed_doc+num_seeds) in list order — the
    # north-star benchmark shape (seed-list expansion, BASELINE.json)
    num_seeds: int = 1
    max_outputs: int | None = None
    # partitions for the big per-level shuffles; None -> session default
    partitions: int | None = None
    # per-level snapshot dir (checkpoint/resume + lineage); None = off
    checkpoint_dir: str | None = None
    # resume from the latest completed level in checkpoint_dir
    resume: bool = False
    # at-scale budget enforcement (see BENCH.md skew probe): cap how many
    # URLs of one host enter a single level; the excess DEFERS to the next
    # level (politeness makes a hot host ~4 req/s anyway, so a huge per-level
    # share would only serialize its partition's wall-clock).  None = off.
    # NOTE: drained URLs are labeled with the depth of the level they are
    # CRAWLED in, not their BFS discovery depth, and a backlog still deferred
    # when the loop exits (max_depth / budget) is dropped — the loop logs the
    # dropped count so callers can see the truncation.
    max_per_host_per_level: int | None = None
    # partitioned cuckoo seen-filter (north_rule primary): once the seen set
    # reaches this many rows, candidate MINUS seen runs through
    # seen.PartitionedSeenFilter — rows the per-bucket filter proves unseen
    # skip the anti-join exchange.  Default tuned by measurement (BENCH.md
    # round-2 probes): below ~10^8 seen rows a single box's JVM hash
    # anti-join beats the Arrow probe (ABAB min-of-reps: 64s plain vs 132s
    # prefiltered at 20M), so the threshold sits where the seen relation
    # stops being comfortably shuffle-able per level — the 10^9-10^10
    # cluster regime the filter exists for.  None = never.
    prefilter_min_seen: int | None = 50_000_000
    prefilter_buckets: int | None = None
    prefilter_capacity: int = 1 << 20
    # the MEASURED crossover (scripts/prefilter_crossover.py, BENCH.md r4):
    # with the narrow probe + broadcast-probe backstop the filter wins once
    # the seen set is >= ~16x the wave (break-even 1.07x at 32M seen / 2M
    # wave; 2.1x faster at 64M / 1M).  Below that ratio the plain anti-join
    # is cheaper and the filter stays disengaged even past min_seen.
    prefilter_min_ratio: float = 16.0
    # the broadcast-probe backstop broadcasts the maybe-keys (bounded by the
    # wave size); above this wave size fall back to the shuffled anti-join
    # backstop rather than build an oversized broadcast hash table
    prefilter_broadcast_max_maybe: int = 10_000_000
    # adaptive disengage (round-5, measured): near graph saturation most
    # candidates are ALREADY seen, so the filter prunes almost nothing and
    # every wave still pays probe+update.  If the engaged filter's prune
    # rate (fraction of candidates it proves unseen and diverts from the
    # anti-join) stays below this floor for `prefilter_prune_patience`
    # consecutive waves, the loop drops the filter and returns to the plain
    # anti-join for the rest of the run.  None = never disengage.
    prefilter_min_prune: float | None = 0.3
    prefilter_prune_patience: int = 2


def crawl_bfs(spark: SparkSession, sf_dir: str, cfg: CrawlConfig | None = None) -> DataFrame:
    """Run the BFS crawl over the synthetic graph; returns
    (url string, host string, depth long, ord long), ord = global crawl order.
    """
    cfg = cfg or CrawlConfig()
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return _crawl(spark, n, cfg)


def crawl_bfs_virtual(spark: SparkSession, n: int, cfg: CrawlConfig | None = None) -> DataFrame:
    """Same BFS over an n-doc virtual id space (scale benchmarking: the graph
    is generated, not read — isolates frontier-machinery throughput)."""
    cfg = cfg or CrawlConfig()
    return _crawl(spark, n, cfg)


def _expand(frontier: DataFrame, n: int) -> DataFrame:
    """Children of the frontier as a 4-way explode of closed-form link
    expressions — the link graph is a formula, so no edges table is scanned
    (a corpus-backed crawl replaces this with the fetch join, engine.py).
    rk = parent_ord * ORD_STRIDE + pos is the first-discovery key."""
    doc, ordc = F.col("doc"), F.col("ord")
    children = F.array(
        *[
            F.struct(
                child.alias("doc"),
                (ordc * graph.ORD_STRIDE + pos).alias("rk"),
            )
            for pos, child in enumerate(
                [
                    (2 * doc + 1) % n,
                    (2 * doc + 2) % n,
                    (5 * doc + 3) % n,
                    (doc + 17) % n,
                ]
            )
        ]
    )
    return frontier.select(F.explode(children).alias("c")).select("c.*")


def _crawl(spark: SparkSession, n: int, cfg: CrawlConfig) -> DataFrame:

    ckpt = None
    if cfg.checkpoint_dir:
        from .checkpoint import CrawlCheckpoint

        ckpt = CrawlCheckpoint(cfg.checkpoint_dir)

    resumed_results = None
    resumed_deferred = None
    if ckpt and cfg.resume and (meta := ckpt.latest()) is not None:
        depth = int(meta["level"])
        base = int(meta["base_ord"])
        frontier = ckpt.load_frontier(spark, depth).localCheckpoint(eager=True)
        seen = ckpt.load_seen(spark, depth).localCheckpoint(eager=True)
        resumed_results = ckpt.load_results(spark, depth)
        resumed_deferred = ckpt.load_deferred(spark, depth)
        if resumed_deferred is not None:
            resumed_deferred = resumed_deferred.localCheckpoint(eager=True)
        levels: list[DataFrame] = []
        budget_hit = cfg.max_outputs is not None and base >= cfg.max_outputs
    else:
        if cfg.num_seeds <= 1:
            frontier = spark.createDataFrame(
                [(cfg.seed_doc, 1)], "doc LONG, ord LONG"
            ).localCheckpoint(eager=True)
        else:
            frontier = (
                spark.range(cfg.seed_doc, cfg.seed_doc + cfg.num_seeds)
                .select(
                    F.col("id").alias("doc"),
                    (F.col("id") - cfg.seed_doc + 1).alias("ord"),
                )
                .localCheckpoint(eager=True)
            )
        if cfg.max_outputs is not None and cfg.num_seeds > cfg.max_outputs:
            # the reference stops the moment maxOutputs is reached — the
            # seed level itself must truncate, not emit every seed
            frontier = frontier.filter(
                F.col("ord") <= cfg.max_outputs
            ).localCheckpoint(eager=True)
        seen = frontier.select("doc").localCheckpoint(eager=True)
        levels = [frontier.withColumn("depth", F.lit(0).cast("long"))]
        base = (
            cfg.num_seeds
            if cfg.max_outputs is None
            else min(cfg.num_seeds, cfg.max_outputs)
        )
        budget_hit = cfg.max_outputs is not None and base >= cfg.max_outputs
        depth = 0
        if ckpt:
            ckpt.save_level(
                0, frontier, seen, levels[0],
                {"base_ord": base, "wave_cnt": int(base)},
            )

    # partitioned cuckoo prefilter: created once `seen` crosses the
    # threshold, seeded with the whole current seen set (distributed build),
    # then maintained incrementally with each level's new docs.  On resume,
    # the checkpointed per-bucket states rehydrate the filter directly —
    # no O(|seen|) rebuild (north_rule: lineage carries seen-filter state).
    sfilter = None
    if (
        ckpt
        and cfg.resume
        and resumed_results is not None
        and cfg.prefilter_min_seen is not None
        and (meta or {}).get("prefilter_buckets")
    ):
        states = ckpt.load_filter_states(spark, depth)
        if states is not None:
            from .seen import PartitionedSeenFilter

            sfilter = PartitionedSeenFilter.from_states(
                spark, states,
                num_buckets=int(meta["prefilter_buckets"]),
                capacity_per_bucket=int(meta["prefilter_capacity"]),
            )

    LAST_CRAWL_LEVEL_METRICS.clear()
    deferred: DataFrame | None = resumed_deferred
    # previous wave size: seeds at depth 0 for a fresh crawl; on resume the
    # checkpointed level metadata carries the LAST WAVE's size (ADVICE r4 —
    # seeding with the cumulative `base` made the prefilter_min_ratio gate
    # see ratio≈1 on the first post-resume wave and defer engagement even
    # when the real seen:wave ratio was far above the threshold)
    if resumed_results is not None and meta is not None:
        last_cnt = max(int(meta.get("wave_cnt", base)), 1)
    else:
        last_cnt = max(int(base), 1)
    # the veto is part of the crawl's state: a resume must not re-engage
    # (and re-pay the O(|seen|) filter build for) a filter the run already
    # proved useless — both fields ride the checkpoint level metadata
    if resumed_results is not None and meta is not None:
        low_prune_streak = int(meta.get("low_prune_streak", 0))
        prefilter_vetoed = bool(meta.get("prefilter_vetoed", False))
    else:
        low_prune_streak = 0
        prefilter_vetoed = False
    while not budget_hit and depth < cfg.max_depth:
        depth += 1
        _t_lvl = _time.time()
        if (
            sfilter is None
            and not prefilter_vetoed
            and cfg.prefilter_min_seen is not None
            and base >= cfg.prefilter_min_seen
            and base >= cfg.prefilter_min_ratio * last_cnt
        ):
            from .seen import PartitionedSeenFilter

            sfilter = PartitionedSeenFilter(
                spark, num_buckets=cfg.prefilter_buckets,
                capacity_per_bucket=cfg.prefilter_capacity,
            )
            sfilter.update(seen, "doc")
        # expand: (doc, rk) with rk = first-discovery key; groupBy-min gets a
        # map-side partial aggregate before the shuffle on doc
        expanded = _expand(frontier, n)
        if deferred is not None:
            expanded = expanded.unionByName(deferred)
            deferred = None
        cand = (
            expanded
            .groupBy("doc")
            .agg(F.min("rk").alias("rk"))
            .filter(~graph.blocked_col(F.col("doc")))
        )
        if sfilter is not None:
            cand = sfilter.prefiltered_antijoin(
                cand, seen, "doc",
                backstop=(
                    "broadcast_probe"
                    if last_cnt <= cfg.prefilter_broadcast_max_maybe
                    else "antijoin"
                ),
            )
        else:
            cand = cand.join(seen, "doc", "left_anti")
        if cfg.max_per_host_per_level is not None:
            from pyspark.sql import Window

            hw = Window.partitionBy(graph.host_id_col(F.col("doc"))).orderBy("rk")
            ranked = cand.withColumn("hr", F.row_number().over(hw))
            deferred = (
                ranked.filter(F.col("hr") > cfg.max_per_host_per_level)
                .select("doc", "rk")
                .localCheckpoint(eager=True)
            )
            cand = ranked.filter(
                F.col("hr") <= cfg.max_per_host_per_level
            ).drop("hr")
        # materialize once: both the count and the rank read the checkpoint
        # (otherwise the expand+dedup+anti-join pipeline executes twice)
        cand = cand.localCheckpoint(eager=True)
        cnt = cand.count()
        # adaptive disengage: if the engaged filter proved-unseen (pruned)
        # fewer than prefilter_min_prune of this wave's candidates for
        # `patience` consecutive waves, the corpus is in the saturation
        # regime (candidates mostly already-seen) where the filter pays
        # probe+update for nothing — drop it for the rest of the run
        prune_rate = None
        if sfilter is not None and (lp := getattr(sfilter, "last_probe", None)):
            if lp["cand"] > 0:
                prune_rate = round(1.0 - lp["maybe"] / lp["cand"], 4)
                if (
                    cfg.prefilter_min_prune is not None
                    and prune_rate < cfg.prefilter_min_prune
                ):
                    low_prune_streak += 1
                    if low_prune_streak >= cfg.prefilter_prune_patience:
                        sfilter = None
                        prefilter_vetoed = True
                else:
                    low_prune_streak = 0
        # diagnostic per-wave trace (bench evidence for the in-loop
        # prefilter crossover, VERDICT r4 item 7): expand -> dedup ->
        # anti-join -> host-cap -> materialize span for this wave
        LAST_CRAWL_LEVEL_METRICS.append({
            "depth": depth,
            "wave": int(cnt),
            "seen_before": int(base),
            "cand_sec": round(_time.time() - _t_lvl, 3),
            "prefilter_engaged": prune_rate is not None or (
                sfilter is not None
            ),
            "prune_rate": prune_rate,
            "prefilter_vetoed": prefilter_vetoed,
        })
        if cnt == 0:
            if deferred is not None and deferred.count() > 0:
                # everything deferred; next level drains the backlog only
                frontier = frontier.limit(0).localCheckpoint(eager=True)
                continue
            break
        level = global_rank(cand, "rk", out="r", num_rows=cnt).select(
            "doc", (F.lit(base) + F.col("r")).alias("ord")
        )
        if cfg.max_outputs is not None and base + cnt >= cfg.max_outputs:
            level = level.filter(F.col("ord") <= cfg.max_outputs)
            cnt = cfg.max_outputs - base
            budget_hit = True
        frontier = level.localCheckpoint(eager=True)
        # keeping seen materialized per level is a measured win: the compact
        # checkpointed relation broadcasts into the anti-join (lazy unions
        # instead were 2x slower end-to-end)
        seen = seen.union(frontier.select("doc")).localCheckpoint(eager=True)
        if sfilter is not None:
            sfilter.update(frontier.select("doc"), "doc")
        level_rows = frontier.withColumn("depth", F.lit(depth).cast("long"))
        levels.append(level_rows)
        base += cnt
        last_cnt = max(int(cnt), 1)
        if ckpt:
            # wave_cnt: this level's wave size, restored into last_cnt on
            # resume so the prefilter ratio gate sees the true seen:wave ratio
            lvl_meta = {
                "base_ord": base,
                "wave_cnt": int(cnt),
                "low_prune_streak": int(low_prune_streak),
                "prefilter_vetoed": bool(prefilter_vetoed),
            }
            if sfilter is not None:
                lvl_meta["prefilter_buckets"] = sfilter.num_buckets
                lvl_meta["prefilter_capacity"] = sfilter.capacity
                ckpt.save_filter_states(depth, sfilter.states)
            if deferred is not None:
                # the backlog pending for the NEXT level is part of this
                # level's state — resume must drain it, not drop it
                ckpt.save_deferred(depth, deferred)
            else:
                ckpt.save_deferred(
                    depth,
                    spark.createDataFrame([], "doc LONG, rk LONG"),
                )
            ckpt.save_level(depth, frontier, seen, level_rows, lvl_meta)

    if deferred is not None and (n_dropped := deferred.count()) > 0:
        import logging

        logging.getLogger(__name__).warning(
            "crawl loop exited with %d deferred URLs still in the per-host "
            "backlog (max_depth/budget hit before they drained)", n_dropped,
        )

    if levels:
        out = levels[0]
        for lv in levels[1:]:
            out = out.unionByName(lv)
        if resumed_results is not None:
            out = resumed_results.unionByName(out)
    else:
        out = resumed_results
    doc = F.col("doc")
    return out.select(
        graph.url_col(doc).alias("url"),
        F.concat(
            F.lit("h"), graph.host_id_col(doc).cast("string"), F.lit("." + graph.DOMAIN)
        ).alias("host"),
        F.col("depth"),
        F.col("ord"),
    )
