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

from .ranks import global_prefix_sum, global_rank

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


REP_TRAP_PENALTY_PERMILLE = 400
REP_ERROR_WEIGHT_PERMILLE = 300
REP_DUP_WEIGHT_PERMILLE = 300


def host_reputation(
    pages: DataFrame,
    host_col: str = "host",
    quality_col: str = "quality_permille",
    error_col: str = "is_error",
    dup_col: str = "is_dup",
    trap_col: str = "is_trap",
    min_pages: int = 1,
) -> DataFrame:
    """Per-host reputation rollup — the host-level prior that seeds
    frontier priority for URLs the crawler has never fetched (a page-level
    rank like PageRank can't score an unseen URL, its host's track record
    can).  Production crawl schedulers keep exactly this table: it decides
    which hosts deserve deeper crawls and which get throttled to a trickle.

    Signals per host, all integer permille:
    - mean page quality (classifier / heuristic score of fetched pages),
    - error share (4xx/5xx fetch outcomes),
    - duplicate share (pages that dedup removed),
    - trap share (pages matching a mined trap template).

      reputation = max(0, mean_quality
                          - 300 * error_share  // 1000
                          - 300 * dup_share    // 1000
                          - 400 * trap_share   // 1000)

    (shares in permille, so each penalty term is weight*share//1000.)

    Spark shape: ONE map-side-combined groupBy over the page table — all
    four signals are conditional-sum aggregates, so a host with 10^8
    pages reduces to one row of longs per map partition before the
    exchange; no window, no second pass.  Hosts with fewer than
    ``min_pages`` keep reputation NULL (insufficient evidence — the
    scheduler should fall back to the default-priority tier).

    Returns (host, n_pages, mean_quality_permille, error_permille,
    dup_permille, trap_permille, reputation_permille).
    """
    q = F.col(quality_col).cast("long")
    agg = pages.groupBy(host_col).agg(
        F.count("*").alias("n_pages"),
        F.sum(q).alias("q_sum"),
        F.sum(F.col(error_col).cast("long")).alias("n_err"),
        F.sum(F.col(dup_col).cast("long")).alias("n_dup"),
        F.sum(F.col(trap_col).cast("long")).alias("n_trap"),
    )
    n = F.col("n_pages")
    mean_q = F.expr("q_sum div n_pages")
    err_pm = F.expr("(1000 * n_err) div n_pages")
    dup_pm = F.expr("(1000 * n_dup) div n_pages")
    trap_pm = F.expr("(1000 * n_trap) div n_pages")
    rep = F.greatest(
        F.lit(0).cast("long"),
        F.expr(
            "q_sum div n_pages"
            f" - ({REP_ERROR_WEIGHT_PERMILLE} * ((1000 * n_err) div n_pages))"
            " div 1000"
            f" - ({REP_DUP_WEIGHT_PERMILLE} * ((1000 * n_dup) div n_pages))"
            " div 1000"
            f" - ({REP_TRAP_PENALTY_PERMILLE} * ((1000 * n_trap) div n_pages))"
            " div 1000"
        ).cast("long"),
    )
    out = agg.select(
        host_col,
        n.cast("long").alias("n_pages"),
        mean_q.alias("mean_quality_permille"),
        err_pm.alias("error_permille"),
        dup_pm.alias("dup_permille"),
        trap_pm.alias("trap_permille"),
        F.when(n >= min_pages, rep).alias("reputation_permille"),
    )
    return out


def select_wave_by_bytes(
    frontier: DataFrame,
    host_byte_budget: int,
    global_byte_budget: int | None = None,
    host_col: str = "host",
    bytes_col: str = "est_bytes",
    priority_col: str = "priority",
    ts_col: str = "crawl_ts",
    url_col: str = "url",
) -> DataFrame:
    """Byte-budgeted wave selection — :func:`select_wave` counts URLs,
    this counts BYTES: image crawls are bandwidth-bound, not URL-bound
    (one 8 MB photo costs what 200 HTML pages cost), so per-host
    politeness and fleet capacity are naturally expressed as byte
    budgets over each URL's size estimate (Content-Length from a HEAD,
    the cache's previous size, or the host's running mean).

    Admission in (priority DESC, ts, url) order: a row enters while the
    host's INCLUSIVE running byte total stays within ``host_byte_budget``
    — except each host's first row, always admitted so a single object
    larger than the whole budget starves nobody forever (it IS the
    host's wave).  The optional global cut applies the same rule to the
    fleet-wide byte total via the two-phase
    :func:`crawlspark.ranks.global_prefix_sum` (exclusive prefix + own
    size <= budget, or first row overall) — no single-partition window
    at any size.

    Returns admitted rows + ``host_bytes_before`` (exclusive per-host
    prefix) and, with a global budget, ``wave_bytes_before``.
    """
    order = [F.col(priority_col).desc(), F.col(ts_col), F.col(url_col)]
    v = F.col(bytes_col).cast("long")
    wh = Window.partitionBy(host_col).orderBy(*order)
    df = (
        frontier
        .withColumn("__seq", F.row_number().over(wh))
        .withColumn(
            "host_bytes_before",
            F.coalesce(
                F.sum(v).over(wh.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .filter(
            (F.col("__seq") == 1)
            | (F.col("host_bytes_before") + v <= F.lit(int(host_byte_budget)))
        )
        .drop("__seq")
    )
    if global_byte_budget is None:
        return df
    df = df.withColumn("__negp", -F.col(priority_col).cast("long"))
    summed = global_prefix_sum(
        df, ["__negp", ts_col, url_col], bytes_col, out="wave_bytes_before"
    ).drop("__negp")
    return summed.filter(
        (F.col("wave_bytes_before") == 0)
        | (F.col("wave_bytes_before") + v <= F.lit(int(global_byte_budget)))
    )


def frontier_health(
    frontier: DataFrame,
    now_ts: int,
    starvation_age_s: int = 86_400,
    host_col: str = "host",
    ts_col: str = "enqueued_ts",
    priority_col: str = "priority",
) -> DataFrame:
    """Per-host frontier health rollup — the ops table a crawl fleet
    watches: backlog size, oldest enqueued age, mean priority (integer),
    and a starvation flag (oldest row older than ``starvation_age_s`` —
    the host's budget or politeness floor is too tight for its inflow).

    ONE map-side-combined groupBy over the frontier (count/min/sum
    aggregates only) — safe to run on every wave boundary at 10^10 rows.
    Returns (host, backlog, oldest_age_s, mean_priority, starved).
    """
    agg = frontier.groupBy(host_col).agg(
        F.count("*").alias("backlog"),
        F.min(F.col(ts_col).cast("long")).alias("__oldest"),
        F.sum(F.col(priority_col).cast("long")).alias("__psum"),
    )
    oldest_age = (F.lit(int(now_ts)) - F.col("__oldest")).cast("long")
    return agg.select(
        host_col,
        F.col("backlog").cast("long").alias("backlog"),
        oldest_age.alias("oldest_age_s"),
        F.expr("__psum div backlog").alias("mean_priority"),
        (oldest_age > starvation_age_s).alias("starved"),
    )


def prune_frontier(
    frontier: DataFrame,
    now_ts: int,
    max_age_s: int,
    trap_templates: DataFrame | None = None,
    dead_hosts: DataFrame | None = None,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "enqueued_ts",
) -> DataFrame:
    """Frontier compaction — the periodic GC a 10^10-row frontier needs:
    drop rows (a) older than ``max_age_s`` (stale discoveries whose
    priority never won a wave: by now the link graph has re-discovered
    anything still live), (b) matching a mined trap template
    (:func:`detect_url_traps` output, joined on (host, template)),
    (c) on a dead host (repeated whole-host fetch failure).

    Plan: the age cut is a narrow filter; the trap cut joins on the
    SMALL aggregated template relation (broadcast); the dead-host cut is
    a broadcast anti-join — the raw frontier is never shuffled.  Returns
    the surviving rows plus a ``pruned_*`` reason-count summary via the
    companion tuple (survivors, reasons).
    """
    age_ok = (F.lit(int(now_ts)) - F.col(ts_col)) <= int(max_age_s)
    df = frontier.withColumn("__age_ok", age_ok)
    if trap_templates is not None:
        traps = trap_templates.filter(F.col("trap")).select(
            F.col("host").alias("__trap_host"),
            F.col("template").alias("__trap_tpl"),
        )
        df = df.withColumn(
            "__tpl", url_template(F.col(url_col))
        ).join(
            F.broadcast(traps),
            (F.col(host_col) == F.col("__trap_host"))
            & (F.col("__tpl") == F.col("__trap_tpl")),
            "left_anti",
        ).drop("__tpl")
    if dead_hosts is not None:
        df = df.join(
            F.broadcast(dead_hosts.select(F.col("host").alias(host_col))),
            host_col,
            "left_anti",
        )
    return df.filter(F.col("__age_ok")).drop("__age_ok")


RETRY_BASE_S = 60
RETRY_MAX_S = 3600
RETRY_MAX_ATTEMPTS = 4


def wave_completion(
    outcomes: DataFrame,
    now_ts: int,
    url_col: str = "url",
    status_col: str = "status",
    attempt_col: str = "attempt",
    retry_after_col: str | None = "retry_after_s",
) -> DataFrame:
    """Post-wave frontier bookkeeping — what happens to every fetched
    URL after its wave completes (the distributed twin of the
    reference's per-response retry/ error handling around
    RetryErrorResponseHandler):

    - 2xx            -> ``done`` (leaves the frontier),
    - 3xx            -> ``rewrite`` (redirect target re-enters, this
                        URL folds into the seen set),
    - 404 / 410      -> ``dead`` (permanent, never retried),
    - 429 / 5xx      -> ``retry`` with exponential backoff
                        base * 2^attempt capped at the max — unless the
                        server sent Retry-After, which wins when LARGER
                        (the origin's word beats our schedule); past
                        max attempts -> ``dead``,
    - anything else  -> ``dead``.

    Narrow CASE map over the outcome batch; integer arithmetic.
    Returns (url, status, attempt, disposition, requeue_at,
    next_attempt).
    """
    st = F.col(status_col)
    att = F.col(attempt_col).cast("long")
    # SQL shiftleft (the Python API wants a literal bit count): exact
    # integer 60 * 2^attempt, capped
    backoff = F.least(
        F.lit(RETRY_MAX_S).cast("long"),
        F.expr(f"{RETRY_BASE_S}L * shiftleft(1L,"
               f" cast({attempt_col} as int))").cast("long"),
    )
    ra = (
        F.coalesce(F.col(retry_after_col).cast("long"), F.lit(0))
        if retry_after_col is not None else F.lit(0).cast("long")
    )
    wait = F.greatest(backoff, ra)
    retryable = (st == 429) | ((st >= 500) & (st < 600))
    disposition = (
        F.when((st >= 200) & (st < 300), F.lit("done"))
        .when((st >= 300) & (st < 400), F.lit("rewrite"))
        .when(st.isin(404, 410), F.lit("dead"))
        .when(retryable & (att < RETRY_MAX_ATTEMPTS), F.lit("retry"))
        .otherwise(F.lit("dead"))
    )
    requeue_at = F.when(
        disposition == "retry", (F.lit(int(now_ts)) + wait).cast("long")
    )
    next_attempt = F.when(disposition == "retry", att + 1)
    return outcomes.select(
        url_col,
        st.cast("int").alias("status"),
        att.alias("attempt"),
        disposition.alias("disposition"),
        requeue_at.alias("requeue_at"),
        next_attempt.alias("next_attempt"),
    )


def wave_fairness(
    wave: DataFrame,
    host_col: str = "host",
    scale: int = 1000,
) -> DataFrame:
    """Jain's fairness index over a wave's per-host allocation —
    J = (sum x)^2 / (n * sum x^2) in 1/``scale`` units — the one-number
    politeness audit: 1000 = perfectly even slots across hosts, ~scale/n
    = one host took everything.  Two aggregates (per-host counts, then
    the 1-row rollup); integer arithmetic.  Returns one row
    (n_hosts, n_slots, fairness_scaled).
    """
    per_host = wave.groupBy(host_col).agg(F.count("*").alias("x"))
    return per_host.agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum("x").cast("long").alias("n_slots"),
        F.expr(
            f"(sum(x) * sum(x) * {int(scale)}L)"
            " div (count(*) * sum(x * x))"
        ).cast("long").alias("fairness_scaled"),
    )


AGING_STEP_S = 3600
AGING_MAX_BOOST = 200


def priority_aging(
    frontier: DataFrame,
    now_ts: int,
    priority_col: str = "priority",
    ts_col: str = "enqueued_ts",
    step_s: int = AGING_STEP_S,
    max_boost: int = AGING_MAX_BOOST,
) -> DataFrame:
    """Priority aging — the starvation fix :func:`frontier_health`'s
    ``starved`` flag calls for: a row's effective priority grows by one
    point per ``step_s`` of queue age, capped at ``max_boost``, so
    low-priority URLs on busy hosts eventually win a wave slot instead
    of waiting forever behind a steady stream of higher-priority
    arrivals.  The cap keeps aged junk from outranking genuinely hot
    pages.  Narrow map (integer arithmetic) — run it right before
    select_wave.  Returns the frontier plus (age_boost,
    aged_priority).
    """
    age = (F.lit(int(now_ts)) - F.col(ts_col)).cast("long")
    boost = F.least(
        F.lit(int(max_boost)).cast("long"),
        F.expr(f"({int(now_ts)}L - {ts_col}) div {int(step_s)}L"),
    )
    boost = F.greatest(boost, F.lit(0).cast("long"))
    return frontier.select(
        "*",
        boost.alias("age_boost"),
        (F.col(priority_col).cast("long") + boost).alias("aged_priority"),
    )


def ucb_host_priority(
    host_stats: DataFrame,
    c_permille: int = 250,
    host_col: str = "host",
    quality_col: str = "mean_quality_permille",
    fetches_col: str = "n_fetches",
) -> DataFrame:
    """UCB-style explore/exploit host scoring: exploitation is the
    host's observed mean quality, exploration a bonus shrinking with
    how often the host was already fetched relative to the fleet —

        bonus = c * floor(sqrt(10^6 * total_fetches div n_fetches)) div 10^3
        score = mean_quality + bonus

    so an under-crawled host gets wave slots even if its observed
    quality is middling (a few samples prove little), while a
    heavily-crawled host must earn them on quality alone.  (UCB1's
    ln(total) term is swapped for the integer-friendly ratio — the
    monotone behavior is what matters for scheduling, and the formula
    stays SQL-replayable; FLOOR(SQRT(exact integer)) agrees across
    engines on IEEE doubles at these magnitudes, as in
    temperature_sample.)

    One 1-row total broadcast back; narrow arithmetic.  Returns (host,
    n_fetches, mean_quality_permille, explore_bonus, ucb_score).
    """
    n = F.col(fetches_col).cast("long")
    tot = host_stats.agg(F.sum(n).alias("__tot"))
    bonus = F.expr(
        f"({int(c_permille)} * CAST(FLOOR(SQRT(CAST((1000000 * __tot)"
        f" div {fetches_col} AS DOUBLE))) AS BIGINT)) div 1000"
    )
    return (
        host_stats.join(F.broadcast(tot))
        .select(
            host_col,
            n.alias("n_fetches"),
            F.col(quality_col).cast("long").alias("mean_quality_permille"),
            bonus.cast("long").alias("explore_bonus"),
            (F.col(quality_col).cast("long") + bonus).cast("long")
            .alias("ucb_score"),
        )
    )


def freshness_histogram(
    corpus: DataFrame,
    now_ts: int,
    ts_col: str = "last_fetch_ts",
) -> DataFrame:
    """Corpus freshness histogram in power-of-two age buckets — the
    recrawl-capacity planning view: bucket k holds pages whose last
    fetch is [2^k, 2^(k+1)) seconds old (bucket 0 = under 2 s).  A
    healthy steady-state crawl shows mass concentrated at the recrawl
    interval; a growing right tail means fetch capacity lost to the
    frontier's growth.  One map-side-combined aggregate; share in
    permille of the corpus.  Returns (age_bucket, n_pages,
    share_permille).
    """
    age = F.greatest(
        (F.lit(int(now_ts)) - F.col(ts_col)).cast("long"), F.lit(1)
    )
    bucket = F.floor(F.log2(age)).cast("int")
    per = corpus.groupBy(bucket.alias("age_bucket")).agg(
        F.count("*").alias("n_pages")
    )
    # total from the bucket relation itself (tiny): one plan, no second
    # corpus pass, no driver round-trip
    total = per.agg(F.sum("n_pages").alias("__tot"))
    return per.join(F.broadcast(total)).select(
        "age_bucket",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.expr("(1000 * n_pages) div __tot").cast("long")
        .alias("share_permille"),
    )


def waterfill_budgets(
    demands: DataFrame,
    total_budget: int,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """Max-min-fair (water-filling) byte/fetch budget allocation — the
    allocation ``allocate_host_budgets`` is NOT: proportional split gives
    a mega-host most of the budget even when its demand dwarfs everyone;
    water-filling raises one global water line L and grants every host
    min(demand, L), fully satisfying small hosts and capping the heavy
    ones at the line where the budget exactly runs out.  This is the
    classic fair-queueing allocation (max-min fairness), integer-exact.

    Algorithm (all distributed, no single-partition window): total order
    hosts by (demand, host); with inclusive prefix sums S_i over that
    order (ranks.global_prefix_sum — range-partition + per-partition
    offsets), the affordable-prefix condition for rank i is
    S_i + (n - i) * d_i <= B.  k = max affordable rank (one scalar
    max-of-struct aggregate), water line L = (B - S_k) div (n - k); rows
    at rank <= k get their full demand, the rest get L (provably
    d_k <= L < d_{k+1} — floor division cannot push L past the next
    demand, asserted in tests against a sequential reference).

    Returns (host, demand, granted, saturated) with saturated 0/1 int;
    sum(granted) undershoots B by < n (floor slack rolls forward).
    """
    from .ranks import global_rank_and_prefix

    b = int(total_budget)
    d = demands.select(
        F.col(host_col).alias("host"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    # ONE two-phase pass for both the rank and the inclusive prefix —
    # separate global_rank + global_prefix_sum calls would range-shuffle
    # and round-trip driver offsets twice over the same order
    pref = global_rank_and_prefix(
        d, order_cols=["demand", "host"], val_col="demand",
        rank_out="rk", prefix_out="incl",
    )
    # n is needed inside the row-level condition: broadcast the scalar
    n_row = pref.agg(F.count("*").cast("long").alias("n"))
    withn = pref.crossJoin(F.broadcast(n_row))
    cond = F.col("incl") + (F.col("n") - F.col("rk")) * F.col("demand") <= b
    krow = withn.agg(
        F.max(F.when(cond, F.struct(F.col("rk"), F.col("incl")))).alias("ks"),
        F.max("n").alias("n"),
    ).select(
        F.coalesce(F.col("ks.rk"), F.lit(0)).alias("k"),
        F.coalesce(F.col("ks.incl"), F.lit(0)).alias("sk"),
        "n",
    )
    out = withn.drop("n").crossJoin(F.broadcast(krow))
    # greatest(...,1): when k == n every row takes the full-demand branch
    # and the line is never used, but ANSI mode must not see a div-0
    level = F.expr(f"({b}L - sk) div greatest(n - k, 1L)")
    granted = (
        F.when(F.col("k") == F.col("n"), F.col("demand"))
        .when(F.col("rk") <= F.col("k"), F.col("demand"))
        .otherwise(F.least(F.col("demand"), level))
    ).cast("long")
    return out.select(
        "host", "demand", granted.alias("granted"),
        (granted < F.col("demand")).cast("int").alias("saturated"),
    )


def wave_makespan(
    backlog: DataFrame,
    n_fetchers: int,
    host_col: str = "host",
    urls_col: str = "n_urls",
    delay_ms_col: str = "delay_ms",
) -> DataFrame:
    """Politeness-constrained wave makespan bounds: with per-host
    politeness delays, a host's URLs are SERIAL no matter how many
    executors exist, so a drain wave cannot beat

        makespan >= max( max_h(n_h * delay_h),             -- critical host
                         ceil(sum_h(n_h * delay_h) / F) )  -- work volume

    (the classic P || Cmax bounds with per-host chains).  One map-side
    aggregate; O(1) output.  Returns a single row (critical_host,
    critical_ms, volume_ms, makespan_lb_ms, bound) — bound names which
    side binds ('critical_host' when one domain's serial chain dominates
    the whole fleet: the signal to SPLIT that host's budget across
    waves rather than add executors).
    """
    work = backlog.select(
        F.col(host_col).alias("host"),
        (F.col(urls_col).cast("long") * F.col(delay_ms_col).cast("long"))
        .alias("w_ms"),
    )
    f = int(n_fetchers)
    agg = work.agg(
        F.max_by("host", "w_ms").alias("critical_host"),
        F.max("w_ms").alias("critical_ms"),
        F.expr(f"CAST((sum(w_ms) + {f} - 1) div {f} AS BIGINT)")
        .alias("volume_ms"),
    )
    return agg.select(
        "critical_host", "critical_ms", "volume_ms",
        F.greatest("critical_ms", "volume_ms").alias("makespan_lb_ms"),
        F.when(F.col("critical_ms") >= F.col("volume_ms"),
               F.lit("critical_host")).otherwise(F.lit("volume"))
        .alias("bound"),
    )


def quota_apportionment(
    strata: DataFrame,
    total: int,
    stratum_col: str = "stratum",
    weight_col: str = "weight",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split EXACTLY
    ``total`` sample slots across strata proportionally to integer
    weights — floor quotas first, then the leftover slots go to the
    largest fractional remainders (ties: smaller stratum id).  Unlike
    the clamped proportional split in ``allocate_host_budgets`` (which
    rolls slack forward), this is for quotas that must sum EXACTLY to
    the target — an eval-set build where 'about 10k docs' is not a
    valid answer.

    Distributed shape: one scalar aggregate for (W, sum-of-floors), the
    remainder rank via the two-phase global_rank (strata can number
    millions of hosts — never a single-partition window), +1 to ranks
    <= leftover.  Returns (stratum, weight, quota) with
    sum(quota) == total (asserted in tests).
    """
    from .ranks import global_rank

    t = int(total)
    d = strata.select(
        F.col(stratum_col).alias("stratum"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    # greatest(.., 1): an all-zero weight vector (empty strata after an
    # upstream filter) must degrade to rank-ordered +1s, not kill the
    # job with an ANSI DIVIDE_BY_ZERO (same guard waterfill_budgets uses)
    w_row = d.agg(
        F.greatest(F.sum("weight").cast("long"), F.lit(1)).alias("w_total")
    )
    base = (
        d.crossJoin(F.broadcast(w_row))
        .select(
            "stratum", "weight",
            F.expr(f"({t}L * weight) div w_total").alias("base"),
            F.expr(f"({t}L * weight) % w_total").alias("rem"),
        )
    )
    left_row = base.agg(
        (F.lit(t) - F.sum("base")).cast("long").alias("leftover")
    )
    ranked = global_rank(
        base.withColumn("neg_rem", -F.col("rem")),
        key=["neg_rem", "stratum"], out="rrank",
    )
    return (
        ranked.crossJoin(F.broadcast(left_row))
        .select(
            "stratum", "weight",
            (F.col("base")
             + (F.col("rrank") <= F.col("leftover")).cast("long"))
            .cast("long").alias("quota"),
        )
    )


def host_quality_shrinkage(
    pages: DataFrame,
    host_col: str = "host",
    good_col: str = "is_good",
    prior_strength: int = 50,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-host quality rates — the fix for
    host_reputation's cold-start cliff: a host with 2/2 good pages is
    NOT a 1000-permille host, and ranking raw rates puts every tiny
    host at the extremes.  Standard beta-binomial posterior with the
    prior moment-matched to the corpus: alpha = M * p_global,
    beta = M * (1 - p_global), posterior mean
    (alpha + k) / (M + n) — hosts with little evidence shrink toward
    the corpus rate, high-traffic hosts keep their own rate.  This is
    the host prior a frontier scheduler can safely rank by (the same
    quantity search stacks call a "smoothed CTR").

    Integer-exact and oracle-replayable: rates in permille with floor
    division — post_permille = (M * p_global_permille + 1000 * k)
    div (M + n); no floats, no libm.

    Plan shape: ONE map-side-combined groupBy(host) for the per-host
    counts, plus a single-row global aggregate broadcast back over the
    host relation (bounded scalar-agg funnel — one partial row per
    task, never a window over the hosts).  Scales to 10^8 hosts.

    Returns (host, n_pages, n_good, raw_permille, post_permille,
    shrink_permille = post - raw, signed).
    """
    g = F.col(good_col).cast("long")
    per_host = pages.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(g).alias("n_good"),
    )
    totals = pages.agg(
        F.count(F.lit(1)).alias("__n_all"),
        F.sum(g).alias("__good_all"),
    ).select(
        F.expr("(1000 * __good_all) div __n_all").alias("__pg_permille")
    )
    m = int(prior_strength)
    return (
        per_host.crossJoin(F.broadcast(totals))
        .withColumn(
            "raw_permille", F.expr("(1000 * n_good) div n_pages"))
        .withColumn(
            "post_permille",
            F.expr(f"({m} * __pg_permille + 1000 * n_good)"
                   f" div ({m} + n_pages)"),
        )
        .withColumn(
            "shrink_permille",
            F.col("post_permille") - F.col("raw_permille"),
        )
        .withColumn("global_permille", F.col("__pg_permille"))
        .drop("__pg_permille")
    )


def good_turing_yield(
    draws: "DataFrame",
    host_col: str = "host",
    url_col: str = "url",
) -> "DataFrame":
    """Good-Turing discovery-yield estimate per host: from the URLs a
    host has produced so far (with repeats — every extraction is a
    draw), estimate the probability that the NEXT extracted URL is one
    never seen before.  The missing-mass estimator is f1/N (Good 1953):
    the count of URLs seen exactly once over total draws.  A host whose
    missing mass has collapsed is mined out — re-crawling it buys
    coverage nothing — so this is the stopping signal for depth
    budgets, the quantitative form of the reference's maxOutputs
    intuition (src/Steps/Step.php maxOutputs caps blindly; this caps
    on evidence).

    Plan: two map-side-combined groupBys ((host,url) then host) — the
    same shape as exact dedup; nothing driver-side, no window.

    Returns (host, n_draws, n_distinct, f1, missing_mass_permille).
    """
    per_url = draws.groupBy(
        F.col(host_col).alias("host"), F.col(url_col).alias("u")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_url.groupBy("host")
        .agg(
            F.sum("c").cast("long").alias("n_draws"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        )
        .withColumn(
            "missing_mass_permille",
            F.expr("(1000 * f1) div n_draws"),
        )
    )


def roi_knapsack(
    items: "DataFrame",
    budget: int,
    value_col: str = "value",
    cost_col: str = "cost",
    id_col: str = "host",
    num_rows: "int | None" = None,
) -> "DataFrame":
    """Budget-constrained greedy selection by ROI — the step after
    :func:`harvest_roi` scores hosts: order candidates by value/cost
    (integer ratio_permille, id tiebreak), take the prefix whose
    cumulative cost fits the budget.  This is the fractional-knapsack
    greedy truncated at the first non-fitting item — within one
    max-cost item of LP-optimal, and unlike the skip-and-continue
    variant it is a pure prefix predicate, so it distributes.

    Plan: the ratio is a narrow map; the cumulative cost is
    :func:`crawlspark.ranks.global_prefix_sum` (range partition +
    per-partition sums + offsets — never a single-partition window at
    scale).

    Returns (id, value, cost, ratio_permille, prefix_cost, selected)
    where prefix_cost INCLUDES the row's own cost and selected =
    prefix_cost <= budget.
    """
    from .ranks import global_prefix_sum

    scored = items.select(
        F.col(id_col).alias("id"),
        F.col(value_col).cast("long").alias("value"),
        F.col(cost_col).cast("long").alias("cost"),
    ).withColumn(
        "ratio_permille", F.expr("(1000 * value) div cost")
    ).withColumn(
        "__neg_ratio", -F.col("ratio_permille")
    )
    pre = global_prefix_sum(
        scored, order_cols=["__neg_ratio", "id"], val_col="cost",
        out="__excl", num_rows=num_rows,
    )
    return (
        pre.withColumn("prefix_cost",
                       (F.col("__excl") + F.col("cost")).cast("long"))
        .withColumn("selected", F.col("prefix_cost") <= int(budget))
        .select("id", "value", "cost", "ratio_permille", "prefix_cost",
                "selected")
    )


def mercator_dispatch(
    frontier: DataFrame,
    n_back: int = 3,
    url_col: str = "url",
    host_col: str = "host",
    prio_col: str = "priority",
    ord_col: str = "discovery_ord",
    delay_col: str = "delay_ms",
    num_rows: int | None = None,
) -> DataFrame:
    """Mercator-style front/back-queue dispatch order (Heydon & Najork,
    "Mercator: a scalable, extensible web crawler", WWW 1999 §3.2; the
    design the reference's sequential Throttler loop collapses to when
    there is exactly one back queue, src/Loader/Http/Throttler.php).

    The classic scheduler: FRONT queues order hosts by priority; B BACK
    queues each own one host at a time and enforce that host's
    politeness delay; a freed back-queue slot is refilled with the next
    host in priority order.  Deterministic re-expression over a frontier
    snapshot (one fetch per ``delay_ms`` per host, host fully drained
    before its slot frees):

      admission_rank  host order by (priority DESC, host) — front queues
      slot            (admission_rank - 1) mod B — back-queue assignment
      host_start_ms   exclusive cumsum of n_urls*delay over the slot's
                      hosts in admission order — serial slot occupancy
      dispatch_ms     host_start_ms + (seq - 1) * delay_ms
      dispatch_ord    global rank by (dispatch_ms, host, seq)

    Scale shape: everything host-keyed runs on the per-host aggregate
    (hosts << URLs; the admission rank is the two-phase
    :func:`crawlspark.ranks.global_rank`, the slot cumsum a window
    PARTITIONED by slot), and the only URL-scale operations are one
    per-host seq window, one equi-join back onto the frontier, and the
    final two-phase global rank — no single-partition window at any
    size.  ``delay_col`` must be constant per host (per-host politeness).

    Returns (url, host, slot, admission_rank, seq, dispatch_ms,
    dispatch_ord).
    """
    urls = frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        F.col(prio_col).cast("long").alias("__prio"),
        F.col(ord_col).cast("long").alias("__ord"),
        F.col(delay_col).cast("long").alias("__delay"),
    )
    hosts = urls.groupBy("host").agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("__prio").alias("__best"),
        F.max("__delay").alias("__hdelay"),
    ).withColumn("__negbest", -F.col("__best"))
    hosts = global_rank(
        hosts, ["__negbest", "host"], out="admission_rank",
        num_rows=num_rows,
    ).withColumn(
        "slot", ((F.col("admission_rank") - 1) % int(n_back)).cast("int")
    )
    w_slot = (
        Window.partitionBy("slot").orderBy("admission_rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hosts = hosts.withColumn(
        "host_start_ms",
        F.coalesce(F.sum(F.col("__n") * F.col("__hdelay")).over(w_slot),
                   F.lit(0)).cast("long"),
    ).select("host", "slot", "admission_rank", "host_start_ms", "__hdelay")
    w_host = Window.partitionBy("host").orderBy("__ord")
    out = (
        urls.join(hosts, "host")
        .withColumn("seq", F.row_number().over(w_host).cast("long"))
        .withColumn(
            "dispatch_ms",
            (F.col("host_start_ms")
             + (F.col("seq") - 1) * F.col("__hdelay")).cast("long"),
        )
    )
    out = global_rank(
        out, ["dispatch_ms", "host", "seq"], out="dispatch_ord",
        num_rows=num_rows,
    )
    return out.select(
        "url", "host", "slot", "admission_rank", "seq", "dispatch_ms",
        "dispatch_ord",
    )


def halflife_decay_scores(
    events: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    now_ts: int = 0,
    halflife: int = 86_400,
    unit_micro: int = 1_000_000,
) -> DataFrame:
    """Recency-weighted activity score with power-of-two half-life
    decay — the freshness prior a recrawl scheduler feeds into wave
    selection: each event contributes ``2^-(age/halflife)`` so a
    host's score halves every ``halflife`` seconds of silence.

    The decay is quantized to WHOLE half-lives (integer age div
    halflife, weight = unit_micro >> n), so every per-event weight is
    an exact integer and the per-key sum is summation-order-proof —
    the float ``exp()`` version of this is the classic
    nondeterministic-aggregate trap on a shuffled relation.  Ages
    beyond 62 half-lives contribute 0.  One narrow map + one
    map-side-combined groupBy.

    Returns (key, n_events, score_micro).
    """
    age = (F.lit(int(now_ts)) - F.col(ts_col).cast("long"))
    n = F.floor(age / F.lit(int(halflife))).cast("long")
    staged = events.select(F.col(key_col).alias("key"), n.alias("__n"))
    # SQL shiftright accepts a column shift amount; the F.shiftright
    # python wrapper does not
    shifted = F.expr(
        f"shiftright(CAST({int(unit_micro)} AS BIGINT), CAST(__n AS INT))")
    w = (
        F.when(F.col("__n") < 0, F.lit(int(unit_micro)))
        .when(F.col("__n") <= 62, shifted)
        .otherwise(F.lit(0))
    )
    return (
        staged.select("key", w.alias("__w"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             F.sum("__w").cast("long").alias("score_micro"))
    )


def apply_priority_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    default_priority: int = 0,
) -> DataFrame:
    """Ordered URL priority rules, first match wins — the operator
    behind every hand-tuned crawl policy file ("/product/ pages are
    priority 90, anything with ?page= is 10, else 50"): a SMALL
    ordered rule table (rule_ord, pattern, priority) evaluated
    top-down per URL, exactly like rewrite-rule engines.

    The rule relation is broadcast as a collected array literal (it
    is a policy file — tens of rows, never data-sized), and the
    first-match fold is one JVM ``aggregate`` over that array per
    URL: no join, no shuffle, no UDF.  Patterns are Java regex,
    matched with rlike semantics (find anywhere).  Returns every
    input row + (rule_ord, priority); unmatched URLs get (NULL,
    ``default_priority``).
    """
    rows = sorted(
        rules.select("rule_ord", "pattern", "priority").collect(),
        key=lambda r: r.rule_ord,
    )
    arr = F.array(*[
        F.struct(F.lit(int(r.rule_ord)).alias("o"),
                 F.lit(r.pattern).alias("p"),
                 F.lit(int(r.priority)).alias("pr"))
        for r in rows
    ]) if rows else F.array().cast(
        "array<struct<o:int,p:string,pr:int>>")
    u = F.col(url_col)
    first = F.aggregate(
        arr,
        F.struct(F.lit(None).cast("int").alias("o"),
                 F.lit(None).cast("int").alias("pr")),
        # regexp_like takes a Column pattern; Column.rlike does not
        lambda acc, r: F.when(
            acc["o"].isNull() & F.regexp_like(u, r["p"]),
            F.struct(r["o"].alias("o"), r["pr"].alias("pr")),
        ).otherwise(acc),
    )
    return urls.withColumn("__m", first).select(
        "*",
    ).withColumn(
        "rule_ord", F.col("__m.o").cast("long")
    ).withColumn(
        "priority",
        F.coalesce(F.col("__m.pr"), F.lit(int(default_priority)))
        .cast("long"),
    ).drop("__m")


def rebalance_transfers(
    shards: DataFrame,
    shard_col: str = "shard_id",
    backlog_col: str = "backlog",
    bucket: int = 1024,
) -> DataFrame:
    """Frontier shard rebalancing as prefix-interval matching — the
    work-stealing plan that evens out a skewed frontier without a
    coordinator: every shard's target is the exact water level
    (total div n, the first total%n shards by id carrying one extra),
    donors hold the excess, receivers the deficit, and the transfer
    list is the OVERLAP of the two cumulative byte-intervals —
    donor i's excess occupies [E_{i-1}, E_i) of the global move
    stream, receiver j's deficit [D_{j-1}, D_j), and they exchange
    exactly the intersection.  Greedy sequential matching produces
    the same plan; this is its order-free distributed form, and
    sum(amount) == sum(excess) == sum(deficit) exactly.

    Both prefix sums are windows over the SHARD relation (tiny next
    to the frontier); the interval-overlap join is bucketized on the
    move-stream position (equi-join on cell + refine — never a
    nested-loop range join).  Returns (from_shard, to_shard, amount),
    empty when already balanced.
    """
    from .ranks import global_prefix_sum, global_rank

    s = shards.select(F.col(shard_col).alias("sid"),
                      F.col(backlog_col).cast("long").alias("bk"))
    tot = s.agg(F.sum("bk").alias("t"), F.count("*").alias("n"))
    ranked = global_rank(s, "sid", out="__r").crossJoin(
        F.broadcast(tot)
    ).withColumn(
        "target",
        F.expr("t div n") + (F.col("__r") <= F.expr("t % n"))
        .cast("long"),
    )
    donors = global_prefix_sum(
        ranked.filter(F.col("bk") > F.col("target"))
        .withColumn("amt", F.col("bk") - F.col("target")),
        order_cols=["sid"], val_col="amt", out="e0",
    ).select(
        F.col("sid").alias("from_shard"), "e0",
        (F.col("e0") + F.col("amt")).alias("e1"),
    )
    receivers = global_prefix_sum(
        ranked.filter(F.col("bk") < F.col("target"))
        .withColumn("amt", F.col("target") - F.col("bk")),
        order_cols=["sid"], val_col="amt", out="d0",
    ).select(
        F.col("sid").alias("to_shard"), "d0",
        (F.col("d0") + F.col("amt")).alias("d1"),
    )
    b = int(bucket)
    cells = lambda lo, hi: F.sequence(
        F.floor(F.col(lo) / b).cast("long"),
        F.ceil((F.col(hi) - 1) / F.lit(b)).cast("long"),
    )
    dx = donors.select("*", F.explode(cells("e0", "e1")).alias("cell"))
    rx = receivers.select("*", F.explode(cells("d0", "d1")).alias("cell"))
    overlap = (
        F.least(F.col("e1"), F.col("d1"))
        - F.greatest(F.col("e0"), F.col("d0"))
    )
    return (
        dx.join(rx, "cell")
        .filter(overlap > 0)
        .select("from_shard", "to_shard", overlap.alias("amount"))
        .distinct()
    )


def template_cost_estimate(
    frontier: DataFrame,
    history: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    bytes_col: str = "n_bytes",
    default_bytes: int = 64 * 1024,
) -> DataFrame:
    """Per-URL fetch cost prediction from (host, template) history —
    the byte-budget input :func:`select_wave_by_bytes` wants BEFORE
    any fetch happens: URLs sharing a structural template
    (:func:`url_template`) share a size distribution, so the
    template's historical mean predicts the new URL's cost far better
    than a global constant.  URLs whose template was never seen fall
    back to ``default_bytes``.

    History aggregates once per (host, template) — template
    cardinality is tiny next to URLs — then a broadcastable equi-join
    onto the frontier.  Integer mean (sum div n).  Returns frontier +
    (template, est_bytes, from_history).
    """
    t = url_template(F.col(url_col))
    hist = (
        history.select(F.col(host_col).alias("host"),
                       t.alias("template"),
                       F.col(bytes_col).cast("long").alias("b"))
        .groupBy("host", "template")
        .agg(F.expr("sum(b) div count(*)").alias("__mean"))
    )
    tagged = frontier.withColumn("template", t)
    return (
        tagged.join(F.broadcast(hist),
                    [host_col, "template"], "left")
        .withColumn("from_history", F.col("__mean").isNotNull())
        .withColumn(
            "est_bytes",
            F.coalesce(F.col("__mean"),
                       F.lit(int(default_bytes)).cast("long")),
        )
        .drop("__mean")
    )
