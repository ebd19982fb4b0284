"""Frontier scheduling: host-budget allocation + priority wave selection.

The reference crawls strictly sequentially — its "scheduler" is the order in
which HttpCrawl's loop pops URLs (src/Steps/Loading/HttpCrawl.php:203-236)
under the Throttler's per-host waits.  At 10^10 frontier rows the equivalent
is a *wave* scheduler: each cycle picks the next batch of URLs to fetch,
respecting (a) a per-host budget (politeness: no host may dominate a wave),
(b) URL priority (e.g. PageRank / sitemap <priority> / recrawl due-time),
and (c) a global wave size matched to fleet capacity.  The north_star names
this shape explicitly: a host-keyed priority queue re-expressed as salted
repartition + sortWithinPartitions — :func:`crawlspark.politeness
.politeness_partition` orders the chosen wave for execution; the functions
here decide *which* rows enter the wave.

All arithmetic is integer (bit-exact, SQL-replayable); both ops stay
distributed — the per-host cut is a partitioned window, the global cut is
the two-phase :func:`crawlspark.ranks.global_rank` (no single-partition
window at any size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranks import global_rank

_UNCAPPED = (1 << 62)


def allocate_host_budgets(
    host_stats: DataFrame,
    total_budget: int,
    weight_col: str = "weight",
    host_col: str = "host",
    min_budget: int = 1,
    max_budget: int | None = None,
) -> DataFrame:
    """Split ``total_budget`` fetches across hosts proportionally to an
    integer ``weight_col`` (host quality, backlog size, pagerank mass, ...):

        budget_h = clamp(total * w_h div sum(w), min_budget, max_budget)

    Floor division keeps it bit-exact (the sum of budgets may undershoot
    ``total_budget`` by < n_hosts — the slack rolls into the next wave
    rather than being redistributed nondeterministically).  ``host_stats``
    is per-host (~10^6 rows at 10^10 URLs): one map-side-combined aggregate
    for ``sum(w)`` broadcast back as a literal join — no wide shuffle.

    Returns (host, budget:long).
    """
    w = F.col(weight_col).cast("long")
    total_w = host_stats.agg(F.sum(w).alias("__tw"))
    budget = F.expr(f"({int(total_budget)}L * __w) div __tw")
    clamped = F.greatest(budget, F.lit(int(min_budget)).cast("long"))
    if max_budget is not None:
        clamped = F.least(clamped, F.lit(int(max_budget)).cast("long"))
    return (
        host_stats.select(F.col(host_col).alias("host"), w.alias("__w"))
        .join(F.broadcast(total_w))
        .select("host", clamped.alias("budget"))
    )


def select_wave(
    frontier: DataFrame,
    budgets: DataFrame | None = None,
    wave_size: int | None = None,
    host_col: str = "host",
    priority_col: str = "priority",
    ts_col: str = "crawl_ts",
    url_col: str = "url",
    presalt: int | None = 16,
) -> DataFrame:
    """Pop the next fetch wave from the frontier — the distributed analog of
    the reference's priority-queue loop.

    Order within a host: priority DESC, then crawl_ts, then url (a total
    order — ``url`` is unique in a deduplicated frontier).  Steps:

    1. per-host rank (partitioned window), cut at the host's budget
       (broadcast join on the per-host budget table from
       :func:`allocate_host_budgets`; hosts absent from the table are
       uncapped),
    2. global cut at ``wave_size`` by the same (priority DESC, ts, url)
       order via the two-phase exact :func:`global_rank`.

    A per-host window puts the WHOLE host in one task — a hot host with
    10^8 frontier rows is a straggler.  With a budget table present, a
    salted two-phase cut runs first (``presalt`` sub-groups): rank within
    (host, salt) and drop rows ranked past the host's budget — any such
    row already has ≥ budget better-ordered rows *in its own salt group*,
    so it cannot make the host's top-budget (exactness preserved).  The
    exact per-host window then sees ≤ presalt × budget rows per host.
    Uncapped hosts skip the pre-cut.  ``presalt=None`` disables.

    Adds ``host_seq`` (1-based position in the host's queue) and
    ``wave_rank`` (1-based global fetch order); rows beyond either cut are
    dropped.  Feed the result to ``politeness_partition`` for execution
    ordering and in-task pacing.
    """
    order = [F.col(priority_col).desc(), F.col(ts_col), F.col(url_col)]
    df = frontier
    if budgets is not None:
        df = df.join(
            F.broadcast(budgets.withColumnRenamed("host", host_col)),
            host_col,
            "left",
        )
        if presalt is not None and presalt > 1:
            ws = Window.partitionBy(
                host_col, F.pmod(F.xxhash64(url_col), F.lit(int(presalt)))
            ).orderBy(*order)
            df = df.withColumn("__pre", F.row_number().over(ws)).filter(
                F.col("budget").isNull() | (F.col("__pre") <= F.col("budget"))
            ).drop("__pre")
    w = Window.partitionBy(host_col).orderBy(*order)
    df = df.withColumn("host_seq", F.row_number().over(w).cast("long"))
    if budgets is not None:
        df = df.filter(
            F.col("host_seq") <= F.coalesce(F.col("budget"), F.lit(_UNCAPPED))
        ).drop("budget")
    if wave_size is None:
        return df
    df = df.withColumn("__negp", -F.col(priority_col).cast("long"))
    ranked = global_rank(
        df, ["__negp", ts_col, url_col], out="wave_rank"
    ).drop("__negp")
    return ranked.filter(F.col("wave_rank") <= int(wave_size))


def url_template(url: "F.Column") -> "F.Column":
    """Collapse the volatile parts of a URL into a structural template:
    long hex runs (session ids, content hashes) → ``H``, digit runs
    (ids, dates, page numbers) → ``N``, then query VALUES → ``V``
    (param names stay).  Two regexp_replace + one — pure JVM codegen,
    fuses into the scan.

    ``/p/123?id=abc123def456ab&page=7`` → ``/p/N?id=H&page=N``.
    """
    t = F.regexp_replace(url, "[0-9a-f]{10,}", "H")
    t = F.regexp_replace(t, "[0-9]+", "N")
    return F.regexp_replace(t, "=[^&#=?]+", "=V")


def detect_url_traps(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    max_per_template: int = 10_000,
    max_share_permille: int = 500,
    min_host_urls: int = 100,
) -> DataFrame:
    """Spider-trap detection by URL template mining.

    Crawler traps (calendar pages, session-id rewrites, infinite facet
    combinations) generate unbounded URL sets that all share one structural
    template; a sequential crawler burns politeness budget on them one URL
    at a time, a 10^10-row frontier drowns in them.  This flags
    (host, template) groups where the template's URL count exceeds
    ``max_per_template`` OR exceeds ``max_share_permille`` of the host's
    frontier (hosts under ``min_host_urls`` URLs are never flagged — small
    hosts legitimately concentrate on one template).  Share compares by
    integer cross-multiplication (bit-exact).

    Spark shape: template is a narrow map fused into the scan; one
    map-side-combined groupBy(host, template) + a per-host roll-up joined
    back — two small shuffles over the *aggregated* relation, never a
    re-shuffle of the raw frontier.  Returns (host, template, n_urls,
    host_urls, trap:boolean); anti-join the frontier against the flagged
    templates to quarantine them.
    """
    t = frontier.select(
        F.col(host_col).alias("host"),
        url_template(F.col(url_col)).alias("template"),
    )
    per_tpl = t.groupBy("host", "template").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    per_host = per_tpl.groupBy("host").agg(
        F.sum("n_urls").alias("host_urls")
    )
    j = per_tpl.join(per_host, "host")
    trap = (F.col("host_urls") >= int(min_host_urls)) & (
        (F.col("n_urls") > int(max_per_template))
        | (F.col("n_urls") * 1000 > F.col("host_urls") * int(max_share_permille))
    )
    return j.select("host", "template", "n_urls", "host_urls",
                    trap.alias("trap"))
