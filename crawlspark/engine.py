"""The site-crawl engine: URL-string frontier over a page corpus.

This is the general engine behind ``Http::crawl()`` semantics (reference:
src/Steps/Loading/HttpCrawl.php:19-180): level-synchronous BFS with

- first-discovery ordering (HttpCrawl.php:221,294-331),
- exact-string URL-seen set fed by requested + redirect-chain + effective
  (+ canonical) URIs (HttpCrawl.php:333-407),
- robots gate (RobotsTxtHandler.php:43-97),
- sameHost (default) / sameDomain scoping pinned from the seed
  (HttpCrawl.php:185-198),
- pathStartsWith / pathMatches / customFilter load criteria, with
  loadAllButYieldOnlyMatching (HttpCrawl.php:68-120),
- fragment drop by default, keepUrlFragment opt-out (HttpCrawl.php:122-127,
  466-473),
- useCanonicalLinks dedup (HttpCrawl.php:377-407),
- inputIsSitemap seeding (HttpCrawl.php:242-331),
- maxOutputs budget enforced mid-crawl (HttpCrawl.php:171-175,226-231),
- depth limit (HttpCrawl.php:62-67,409-412).

The fetch is an equi-join of the frontier against the page corpus (the
deterministic stand-in for network I/O, exactly how the reference's own
integration tests use a fixture server).  A live-fetch stage would swap the
join for a ``mapInPandas`` batch over the politeness-ordered frontier — the
surrounding plan (robots gate, seen anti-join, ordering) is unchanged.

Scale: per level this costs one corpus equi-join (hash join on url; at
10^10 scale the corpus and seen tables are bucketed by url_hash), one
explode + groupBy-min (map-side combine), one anti-join against seen, and a
distributed rank.  ``localCheckpoint`` per level keeps lineage O(1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import extract
from .canon import registrable_domain
from .ranks import global_rank
from .robots import with_robots_allowed

MAX_REDIRECTS = 10  # reference: src/Loader/Http/HttpLoader.php:64


@dataclass
class SiteCrawlConfig:
    max_depth: int | None = None
    same_host: bool = True
    same_domain: bool = False
    path_starts_with: str | None = None
    path_matches: str | None = None
    # (url Column, link_text Column-or-null) -> boolean Column
    custom_filter: Callable[[Column, Column], Column] | None = None
    load_all_but_yield_only_matching: bool = False
    keep_url_fragment: bool = False
    use_canonical_links: bool = False
    input_is_sitemap: bool = False
    max_outputs: int | None = None
    user_agent_is_bot: bool = True
    # crawler UA string for robots GROUP selection (Google semantics: the
    # group whose token appears in the UA, longest wins; '*' fallback).
    # None = every group applies (merged per host).
    user_agent: str | None = None
    # yield 4xx/5xx responses too (reference Http step suppresses >=400
    # unless yieldErrorResponses(), HttpBase.php:260-277)
    yield_error_responses: bool = False
    # partitioned cuckoo seen-filter threshold (see frontier.CrawlConfig
    # for the measured default): URL strings are fingerprinted with xxhash64
    # for the probe; the exact anti-join backstop still matches on the
    # string, so collisions cannot drop an unseen URL.  None = never engage.
    prefilter_min_seen: int | None = 50_000_000
    prefilter_buckets: int | None = None
    prefilter_capacity: int = 1 << 20
    # measured crossover (BENCH.md r4 / frontier.CrawlConfig): engage only
    # once the seen set dwarfs the wave (>= ~16x) — below that the plain
    # anti-join is cheaper.  0 = engage on min_seen alone (tests).
    prefilter_min_ratio: float = 16.0
    # adaptive disengage (round-5, see frontier.CrawlConfig): drop an
    # engaged filter whose prune rate stays below this floor for
    # `patience` consecutive waves (saturation regime — candidates mostly
    # already-seen, probe+update buys nothing).  None = never disengage.
    prefilter_min_prune: float | None = 0.3
    prefilter_prune_patience: int = 2
    # attach the per-host fetch schedule to every level (north_rule: per-host
    # politeness delays enforced in the crawl loop; reference Throttler.php
    # waits between requests to one host).  Adds fetch_start_ms/fetch_end_ms
    # (relative to the level's wave start) to the output; robots-blocked
    # rows carry nulls.  Off by default: the schedule is an extra window
    # pass per level and changes the output schema.
    with_politeness: bool = False


@pandas_udf(StringType())
def _resolve_one_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract.resolve_url(b, None, h) if h is not None else None
            for b, h in zip(bases, hrefs)
        ]
    )


def prepare_corpus(pages: DataFrame) -> DataFrame:
    """Normalize a page corpus to the engine's parsed shape.

    Input needs: url, status; optional: redirect_to, body, links, base_href,
    canonical_href, content_type, latency_ms.  Missing link metadata is
    extracted from ``body`` with the vectorized extractors.
    """
    cols = set(pages.columns)
    df = pages
    if "redirect_to" not in cols:
        df = df.withColumn("redirect_to", F.lit(None).cast("string"))
    has_body = "body" in cols
    body = F.col("body").cast("string") if has_body else F.lit(None).cast("string")
    if "links" not in cols:
        df = df.withColumn("links", extract.extract_links_udf(body))
    if "base_href" not in cols:
        df = df.withColumn("base_href", extract.extract_base_href_udf(body) if has_body else F.lit(None).cast("string"))
    if "canonical_href" not in cols:
        df = df.withColumn("canonical_href", extract.extract_canonical_udf(body) if has_body else F.lit(None).cast("string"))
    if "sitemap_locs" not in cols:
        if has_body:
            is_xml = (
                F.col("content_type").contains("xml")
                if "content_type" in cols
                else body.contains("<urlset")
            )
            df = df.withColumn(
                "sitemap_locs",
                F.when(is_xml, extract.extract_sitemap_locs_udf(body)).otherwise(
                    F.lit(None).cast("array<string>")
                ),
            )
        else:
            df = df.withColumn("sitemap_locs", F.lit(None).cast("array<string>"))
    if "latency_ms" not in cols:
        df = df.withColumn("latency_ms", F.lit(0).cast("long"))
    return df.select(
        "url", "status", "redirect_to", "links", "base_href", "canonical_href",
        "sitemap_locs", "latency_ms",
    )


def redirect_closure(parsed: DataFrame) -> DataFrame:
    """(fetch_url, chain array<string>) for every URL that redirects; chain
    holds each hop in order ending at the final URL.  Follows <= MAX_REDIRECTS
    hops, like the reference loader (HttpLoader.php:430-470)."""
    hops = parsed.filter(F.col("redirect_to").isNotNull()).select(
        F.col("url").alias("src"), F.col("redirect_to").alias("dst")
    )
    hops = hops.persist()
    closure = hops.select(
        F.col("src").alias("fetch_url"),
        F.array(F.col("dst")).alias("chain"),
        F.col("dst").alias("cur"),
    )
    hops2 = hops.select(F.col("src").alias("h_src"), F.col("dst").alias("h_dst"))
    for _ in range(MAX_REDIRECTS - 1):
        nxt = (
            closure.join(hops2, closure["cur"] == F.col("h_src"), "left")
            .select(
                "fetch_url",
                F.when(
                    F.col("h_dst").isNotNull(),
                    F.concat("chain", F.array(F.col("h_dst"))),
                ).otherwise(F.col("chain")).alias("chain"),
                F.col("h_dst").alias("cur"),
            )
        )
        # fixpoint check: any chain still extendable?
        if nxt.filter(F.col("cur").isNotNull()).count() == 0:
            closure = nxt
            break
        closure = nxt
    hops.unpersist()
    return closure.select("fetch_url", "chain")


def redirect_status(parsed: DataFrame) -> DataFrame:
    """Classify every redirecting URL's chain outcome: ``resolved`` (the
    chain reaches a non-redirecting URL), ``loop`` (the chain revisits a
    URL — A->B->A ping-pongs or self-redirects; following it further is
    pure waste), or ``too_many_redirects`` (an acyclic chain longer than
    MAX_REDIRECTS — the reference loader aborts the request here,
    HttpLoader.php:430-470, and so must the frontier: the target is
    unfetchable, not pending).

    Loop detection is chain-local (duplicate element or the fetch URL
    itself reappearing); cap detection joins the chain tail against the
    redirect sources once — both narrow operations on the closure
    relation, no extra iteration."""
    cl = redirect_closure(parsed)
    srcs = (
        parsed.filter(F.col("redirect_to").isNotNull())
        .select(F.col("url").alias("__src"))
        .distinct()
    )
    tail = cl.withColumn("__last", F.element_at("chain", -1))
    flagged = tail.join(
        srcs, F.col("__last") == F.col("__src"), "left"
    )
    loop = (
        (F.size("chain") != F.size(F.array_distinct("chain")))
        | F.array_contains("chain", F.col("fetch_url"))
    )
    unresolved = F.col("__src").isNotNull()
    status = (
        F.when(loop, F.lit("loop"))
        .when(unresolved, F.lit("too_many_redirects"))
        .otherwise(F.lit("resolved"))
    )
    return flagged.select(
        "fetch_url",
        status.alias("status"),
        F.when(status == "resolved", F.col("__last")).alias("final_url"),
        F.size("chain").cast("long").alias("hops"),
    )


def _strip_frag(c: Column) -> Column:
    return F.substring_index(c, "#", 1)


def _path_of(c: Column) -> Column:
    return F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("/"))


def _robots_path_of(c: Column) -> Column:
    """Path for ROBOTS matching: path + '?query' when a query is present —
    Google robots semantics match patterns like 'Disallow: /*?sessionid='
    against path+query, while the crawl-scope path filters use the bare
    path (reference pathStartsWith on Url::path)."""
    q = F.parse_url(c, F.lit("QUERY"))
    return F.concat(
        _path_of(c),
        F.when(q.isNotNull() & (q != ""), F.concat(F.lit("?"), q)).otherwise(
            F.lit("")
        ),
    )


def _host_of(c: Column) -> Column:
    return F.lower(F.parse_url(c, F.lit("HOST")))


def crawl_site(
    spark: SparkSession,
    pages: DataFrame,
    seed_url: "str | list[str] | DataFrame",
    cfg: SiteCrawlConfig | None = None,
    robots: DataFrame | None = None,
) -> DataFrame:
    """Crawl the corpus from one seed, a seed list, or a (seed_id, url)
    DataFrame — ALL seeds advance in ONE frontier (one BFS loop total, no
    per-seed driver iteration; reference runs seeds sequentially through the
    step, HttpCrawl.php:145-178, with per-seed host/domain scoping pinned in
    setHostOrDomain).

    Returns one row per ATTEMPTED fetch, in per-seed crawl order:
    (url, effective_url, host, depth long, ord long, loaded bool, yielded
    bool) — plus a leading ``seed_id`` column when more than one seed was
    given.  ``url`` is the requested URL (the reference TestLoader's
    loadedUrls observable); ``effective_url`` is post-redirect (and
    post-canonical when useCanonicalLinks) — the reference Result 'url'
    observable.  The URL-seen set is scoped per seed (identical to the
    reference whenever seed scopes are disjoint, which sameHost pinning
    guarantees for distinct hosts); with ``max_outputs`` the global budget is
    consumed in (seed_id, ord) priority per level, whereas the reference
    exhausts seed k fully before seed k+1.
    """
    cfg = cfg or SiteCrawlConfig()

    single_seed = isinstance(seed_url, str)
    if isinstance(seed_url, DataFrame):
        seeds = seed_url.select(
            F.col("seed_id").cast("long"), F.col("url").alias("seed_url")
        )
    else:
        urls = [seed_url] if single_seed else list(seed_url)
        seeds = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "seed_id LONG, seed_url STRING"
        )

    parsed = prepare_corpus(pages).persist()
    closure = redirect_closure(parsed).persist()

    # per-seed scope pins (setHostOrDomain, HttpCrawl.php:185-198): a tiny
    # broadcast relation, never collected
    seeds_info = seeds.select(
        "seed_id",
        _host_of(F.col("seed_url")).alias("__seed_host"),
        registrable_domain(_host_of(F.col("seed_url"))).alias("__seed_dom"),
    ).localCheckpoint(eager=True)

    def matching_col(url: Column, text: Column) -> Column:
        conds = []
        path = _path_of(url)
        if cfg.path_starts_with:
            conds.append(path.startswith(cfg.path_starts_with))
        if cfg.path_matches:
            conds.append(path.rlike(cfg.path_matches))
        if cfg.custom_filter is not None:
            conds.append(cfg.custom_filter(url, text))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def scoped(cand: DataFrame, url_col: str) -> DataFrame:
        """Keep rows inside their seed's host/domain scope."""
        host = _host_of(F.col(url_col))
        if cfg.same_domain and not cfg.same_host:
            cond = registrable_domain(host) == F.col("__seed_dom")
        else:
            cond = host == F.col("__seed_host")
        return (
            cand.join(F.broadcast(seeds_info), "seed_id")
            .filter(cond)
            .drop("__seed_host", "__seed_dom")
        )

    seed_req = F.when(
        F.lit(cfg.keep_url_fragment), F.col("seed_url")
    ).otherwise(_strip_frag(F.col("seed_url")))
    frontier = (
        seeds.select("seed_id", seed_req.alias("url"))
        .select(
            "seed_id",
            "url",
            _strip_frag(F.col("url")).alias("fetch_url"),
            _host_of(F.col("url")).alias("host"),
            _robots_path_of(F.col("url")).alias("path"),
            F.lit(1).cast("long").alias("ord"),
            F.lit(0).cast("long").alias("depth"),
            (
                matching_col(F.col("url"), F.lit(None).cast("string"))
                & F.lit(not cfg.input_is_sitemap)
            ).alias("yield_flag"),
        )
        .localCheckpoint(eager=True)
    )

    seen = spark.createDataFrame([], "seed_id LONG, id STRING").localCheckpoint(
        eager=True
    )
    seen_ub = 0  # running upper bound on |seen| (cross-level dup ids counted
    # twice, so the prefilter can only engage EARLY — harmless, it is exact
    # via the anti-join backstop); avoids an O(|seen|) count job per level
    sfilter = None  # PartitionedSeenFilter once seen crosses the threshold
    low_prune_streak = 0  # adaptive prune-rate veto (see SiteCrawlConfig)
    prefilter_vetoed = False
    out_levels: list[DataFrame] = []
    # per-seed crawled-so-far offsets (== max ord per seed): tiny relation,
    # broadcast into the rank join each level
    bases = seeds.select("seed_id", F.lit(1).cast("long").alias("base")).localCheckpoint(
        eager=True
    )
    yielded_total = 0
    depth = 0

    while True:
        f = with_robots_allowed(
            frontier, robots, user_agent_is_bot=cfg.user_agent_is_bot,
            user_agent=cfg.user_agent,
        )
        fetched = f.join(closure, "fetch_url", "left").withColumn(
            "final_fetch", F.coalesce(F.element_at("chain", -1), F.col("fetch_url"))
        )
        page_side = parsed.select(
            F.col("url").alias("final_fetch"),
            F.col("status").alias("p_status"),
            F.col("links").alias("p_links"),
            F.col("base_href").alias("p_base"),
            F.col("canonical_href").alias("p_canonical"),
            F.col("sitemap_locs").alias("p_locs"),
            F.col("latency_ms").alias("p_latency"),
        )
        fetched = fetched.join(page_side, "final_fetch", "left")
        fetched = fetched.withColumn(
            "loaded", F.col("robots_allowed") & F.col("p_status").isNotNull()
        )
        canonical_abs = F.when(
            F.col("loaded") & F.col("p_canonical").isNotNull(),
            _resolve_one_udf(F.col("final_fetch"), F.col("p_canonical")),
        )
        fetched = fetched.withColumn("canonical_abs", canonical_abs)
        eff = F.when(
            F.col("chain").isNotNull(), F.col("final_fetch")
        ).otherwise(F.col("url"))
        if cfg.use_canonical_links:
            eff = F.coalesce(F.col("canonical_abs"), eff)
        fetched = fetched.withColumn("effective_url", eff)
        if cfg.with_politeness:
            # per-host FIFO schedule for this level's wave: one window pass
            # keyed on host (the politeness subject is the SERVER, so the
            # schedule spans seeds).  Blocked rows never fetch -> nulls.
            from .politeness import throttle_schedule

            allowed = throttle_schedule(
                fetched.filter("robots_allowed").withColumn(
                    "__lat", F.coalesce(F.col("p_latency"), F.lit(0))
                ),
                # ord is unique only per seed: seed_id breaks cross-seed ties
                # deterministically when seeds share a host
                host_col="host", ord_col=["ord", "seed_id"], latency_col="__lat",
            ).drop("__lat")
            blocked = fetched.filter(~F.col("robots_allowed"))
            for c in ("seq", "wait_ms", "fetch_start_ms", "fetch_end_ms"):
                blocked = blocked.withColumn(c, F.lit(None).cast("long"))
            fetched = allowed.unionByName(blocked)
        fetched = fetched.localCheckpoint(eager=True)

        # ---- staleness gate (reference wasAlreadyLoaded,
        # HttpCrawl.php:355-375): a response is already-loaded when ANY of
        # its URIs — requested, each redirect hop, final — is in the seen
        # set.  Canonical is NOT part of this check (it is recorded after,
        # HttpCrawl.php:212-216) and only suppresses the yield.
        fetched = fetched.withColumn(
            "load_eff",
            F.when(F.col("chain").isNotNull(), F.col("final_fetch")).otherwise(
                F.col("url")
            ),
        )
        ids = F.array_union(
            F.array(F.col("url"), F.col("final_fetch")),
            F.coalesce(F.col("chain"), F.array()),
        )
        stale_ords = (
            fetched.select("seed_id", "ord", F.explode(ids).alias("id"))
            .join(seen, ["seed_id", "id"])
            .select("seed_id", "ord")
            .distinct()
            .withColumn("__stale", F.lit(True))
        )
        w_load = Window.partitionBy("seed_id", "load_eff").orderBy("ord")
        w_eff = Window.partitionBy("seed_id", "effective_url").orderBy("ord")
        lvl = (
            fetched.join(stale_ords, ["seed_id", "ord"], "left")
            .join(
                seen.select(
                    "seed_id", F.col("id").alias("effective_url")
                ).withColumn("__eff_seen", F.lit(True)),
                ["seed_id", "effective_url"],
                "left",
            )
            .withColumn("__rn_load", F.row_number().over(w_load))
            .withColumn("__rn_eff", F.row_number().over(w_eff))
            .withColumn(
                # "fresh" = response processed: yielded (maybe), seen-update,
                # link extraction (HttpCrawl.php:212 gate)
                "fresh",
                F.col("loaded")
                & F.col("__stale").isNull()
                & (F.col("__rn_load") == 1),
            )
            .withColumn(
                # canonical/effective dedup additionally gates the yield
                # (yieldResponse, HttpCrawl.php:388-395)
                "yielded",
                F.col("fresh")
                & F.col("yield_flag")
                & (
                    F.coalesce(F.col("p_status").isNotNull(), F.lit(False))
                    if cfg.yield_error_responses
                    else F.coalesce(F.col("p_status") < 400, F.lit(False))
                )
                & F.col("__eff_seen").isNull()
                & (F.col("__rn_eff") == 1),
            )
        )
        lvl = lvl.localCheckpoint(eager=True)
        if cfg.max_outputs is not None and depth == 0:
            # the reference stops the moment maxOutputs is reached
            # (HttpCrawl.php:171-175): seeds past the budget point are never
            # LOADED, so drop those rows entirely (not just unflag them) —
            # matching frontier._crawl's seed truncation and the loadedUrls
            # observable.  Deeper levels never need this pass: the pre-fetch
            # frontier cut below already keeps at most `remaining` yield
            # flags per level, and yields <= flags, so the in-level prefix
            # sum could never bind there.
            from .ranks import global_prefix_sum

            remaining = cfg.max_outputs - yielded_total
            n_lvl = lvl.count()
            order_cols = ["ord"] if single_seed else ["seed_id", "ord"]
            lvl = (
                global_prefix_sum(
                    lvl.withColumn("__y", F.col("yielded").cast("int")),
                    order_cols, "__y", out="__y_before", num_rows=n_lvl,
                )
                .filter(F.col("__y_before") < remaining)
                .drop("__y", "__y_before")
            )
        out_cols = [
            "seed_id", "url", "effective_url", "host", "depth", "ord",
            "loaded", "yielded",
        ]
        if cfg.with_politeness:
            out_cols += ["seq", "wait_ms", "fetch_start_ms", "fetch_end_ms"]
        out_levels.append(lvl.select(*out_cols))
        yielded_total += lvl.filter("yielded").count()

        # ---- seen update: requested + chain + effective + canonical ids
        # (addLoadedUrlsFromResponse runs only for fresh responses)
        new_ids = (
            lvl.filter("fresh")
            .select(
                "seed_id",
                F.array_union(
                    F.array_union(
                        F.array(F.col("url"), F.col("effective_url"), F.col("final_fetch")),
                        F.coalesce(F.col("chain"), F.array()),
                    ),
                    # canonical joins the seen-set only in useCanonicalLinks
                    # mode (reference setResponseCanonicalUrl records it as a
                    # redirect, HttpCrawl.php:400-407)
                    F.when(
                        F.lit(cfg.use_canonical_links)
                        & F.col("canonical_abs").isNotNull(),
                        F.array(F.col("canonical_abs")),
                    ).otherwise(F.array()),
                ).alias("ids"),
            )
            .select("seed_id", F.explode("ids").alias("id"))
            .distinct()
        )
        seen = seen.unionByName(new_ids).distinct().localCheckpoint(eager=True)
        if sfilter is not None:
            sfilter.update(
                new_ids.select(F.xxhash64("seed_id", "id").alias("kh")), "kh"
            )
        elif cfg.prefilter_min_seen is not None and not prefilter_vetoed:
            last_new = new_ids.count()  # O(level) job, not O(|seen|)
            seen_ub += last_new
            if (
                seen_ub >= cfg.prefilter_min_seen
                and seen_ub >= cfg.prefilter_min_ratio * max(last_new, 1)
            ):
                from .seen import PartitionedSeenFilter

                sfilter = PartitionedSeenFilter(
                    spark, num_buckets=cfg.prefilter_buckets,
                    capacity_per_bucket=cfg.prefilter_capacity,
                )
                sfilter.update(
                    seen.select(F.xxhash64("seed_id", "id").alias("kh")), "kh"
                )

        # ---- stop?
        if cfg.max_depth is not None and depth >= cfg.max_depth:
            break
        if cfg.max_outputs is not None and yielded_total >= cfg.max_outputs:
            break

        # ---- expand
        links_src = F.col("p_links")
        if cfg.input_is_sitemap and depth == 0:
            links_src = F.when(
                F.col("p_locs").isNotNull(),
                F.transform(
                    F.col("p_locs"),
                    lambda loc, i: F.struct(
                        loc.alias("href"),
                        F.lit(None).cast("string").alias("text"),
                        i.cast("int").alias("pos"),
                    ),
                ),
            ).otherwise(links_src)
        resolve_udf = extract.make_resolve_links_udf(cfg.keep_url_fragment)
        cand = (
            lvl.filter("fresh")
            .select(
                "seed_id",
                F.col("ord").alias("parent_ord"),
                resolve_udf(
                    F.col("final_fetch"), F.col("p_base"), links_src
                ).alias("resolved"),
            )
            .select("seed_id", "parent_ord", F.explode("resolved").alias("l"))
            .select(
                "seed_id",
                F.col("l.url").alias("url"),
                F.col("l.text").alias("text"),
                F.col("l.pos").alias("pos"),
                "parent_ord",
            )
        )
        cand = scoped(cand, "url")
        m = matching_col(F.col("url"), F.col("text"))
        cand = cand.withColumn("matching", m)
        if not cfg.load_all_but_yield_only_matching:
            cand = cand.filter("matching")
        cand = cand.groupBy("seed_id", "url").agg(
            F.min(F.struct("parent_ord", "pos")).alias("rk"),
            F.max("matching").alias("yield_flag"),
        )
        seen_urls = seen.select("seed_id", F.col("id").alias("url"))
        if sfilter is not None:
            cand = sfilter.prefiltered_antijoin(
                cand.withColumn("__kh", F.xxhash64("seed_id", "url")),
                seen_urls, "__kh", exact_key=["seed_id", "url"],
            ).drop("__kh")
            # adaptive prune-rate veto (mirrors frontier._crawl): an
            # engaged filter that diverts <min_prune of the candidates for
            # `patience` waves is saturation overhead — drop it
            lp = getattr(sfilter, "last_probe", None)
            if (
                cfg.prefilter_min_prune is not None
                and lp and lp["cand"] > 0
            ):
                if 1.0 - lp["maybe"] / lp["cand"] < cfg.prefilter_min_prune:
                    low_prune_streak += 1
                    if low_prune_streak >= cfg.prefilter_prune_patience:
                        sfilter = None
                        prefilter_vetoed = True
                else:
                    low_prune_streak = 0
        else:
            cand = cand.join(seen_urls, ["seed_id", "url"], "left_anti")
        # the reference also refuses to re-add URLs sitting in the
        # frontier currently being iterated (HttpCrawl.php:282)
        cand = cand.join(
            frontier.select("seed_id", "url"), ["seed_id", "url"], "left_anti"
        )
        cnt = cand.count()
        if cnt == 0:
            break
        if single_seed:
            ranked = global_rank(cand, "rk", out="r", num_rows=cnt)
        else:
            # one window partition per seed: parallelism == number of seeds,
            # each seed's level is one site's worth of URLs
            wseed = Window.partitionBy("seed_id").orderBy("rk")
            ranked = cand.withColumn(
                "r", F.row_number().over(wseed).cast("long")
            )
        ranked = ranked.join(F.broadcast(bases), "seed_id").select(
            "seed_id",
            "url",
            (F.col("base") + F.col("r")).alias("ord"),
            "yield_flag",
        )
        # maxOutputs mid-level cut: stop before the fetch whose predecessor
        # yields exhaust the budget (reference HttpCrawl.php:226-231) —
        # the exclusive prefix sum of yield_flag over crawl order runs
        # through the distributed two-phase pattern (ranks.global_prefix_sum),
        # so a huge budgeted level never collapses to one partition
        if cfg.max_outputs is not None:
            from .ranks import global_prefix_sum

            remaining = cfg.max_outputs - yielded_total
            order_cols = ["ord"] if single_seed else ["seed_id", "ord"]
            ranked = global_prefix_sum(
                ranked, order_cols, "yield_flag", out="__y_before", num_rows=cnt
            )
            ranked = ranked.filter(F.col("__y_before") < remaining).drop("__y_before")
            cnt = ranked.count()
            if cnt == 0:
                break
        depth += 1
        frontier = ranked.select(
            "seed_id",
            "url",
            _strip_frag(F.col("url")).alias("fetch_url"),
            _host_of(F.col("url")).alias("host"),
            _robots_path_of(F.col("url")).alias("path"),
            "ord",
            F.lit(depth).cast("long").alias("depth"),
            "yield_flag",
        ).localCheckpoint(eager=True)
        bases = (
            bases.join(
                frontier.groupBy("seed_id").agg(F.count("*").alias("__c")),
                "seed_id", "left",
            )
            .select(
                "seed_id",
                (F.col("base") + F.coalesce(F.col("__c"), F.lit(0))).alias("base"),
            )
            .localCheckpoint(eager=True)
        )

    parsed.unpersist()
    closure.unpersist()
    out = out_levels[0]
    for lv in out_levels[1:]:
        out = out.unionByName(lv)
    if single_seed:
        out = out.drop("seed_id")
    return out
