"""Politeness: per-host throttle schedule + host-keyed priority queue.

Reference semantics (src/Loader/Http/Politeness/Throttler.php:43-56,125-197):
wait between two requests to the same registrable domain is drawn from
[from x last_response_duration, to x last_response_duration] (defaults 1.0x /
2.0x), clamped to at least 0.25 s.  Randomness never affects per-domain FIFO
ordering, so the distributed engine uses the deterministic lower bound
(``wait = max(min_wait, 1.0 x prev_latency)``) — assertions are on the
schedule, not wall-clock (cf. tests/Loader/Http/Politeness/ThrottlerTest.php).

Retry/backoff (RetryErrorResponseHandler.php:18-30,49-102): 429/503 wait
10 s then 60 s (2 retries), honoring Retry-After up to 60 s, then abort.

north_rule prescribes the queue shape: salted ``repartition(host_bucket)`` +
``sortWithinPartitions(host_bucket, priority, crawl_ts)``; every host lives in
exactly one partition, so in-task pacing (sleeping between same-host rows
inside ``mapInPandas``) enforces the budget without any coordination.
Hot-host skew: a host whose level share exceeds ``hot_threshold`` is split
over ``salt`` sub-buckets whose per-salt pacing is multiplied by ``salt`` so
the per-host budget still holds (per-salt budgets sum to the host budget).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .canon import host_bucket

MIN_WAIT_MS = 250  # Throttler.php:49-55 default min 0.25s
RETRY_WAITS_MS = (10_000, 60_000)  # RetryErrorResponseHandler.php:26-30
MAX_RETRY_AFTER_MS = 60_000


@dataclass
class PolitenessConfig:
    """Full Throttler surface (Throttler.php:43-56,168-196): the wait before
    request k+1 to a host is rand(from, to) clamped to [min, max], where
    from/to are each a fixed duration (Microseconds) or a multiple of the
    previous response's duration (MultipleOf; defaults 1.0x..2.0x).  A Spark
    schedule must be deterministic, so ``wait_point`` picks a fixed point in
    [from, to] instead of rand(): 0.0 = the from bound (default), 1.0 = the
    to bound, 0.5 = midpoint."""

    min_wait_ms: int = MIN_WAIT_MS  # waitAtLeast, default 0.25s
    wait_factor: float = 1.0  # MultipleOf from
    wait_to_factor: float = 2.0  # MultipleOf to
    wait_from_ms: int | None = None  # fixed from (waitBetween), overrides factor
    wait_to_ms: int | None = None  # fixed to (waitBetween), overrides factor
    max_wait_ms: int | None = None  # waitAtMax cap
    wait_point: float = 0.0  # deterministic point in [from, to]
    num_buckets: int = 1024
    hot_threshold: int = 100_000  # rows per host per level before salting
    salt: int = 8


def throttle_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    ord_col: "str | list[str]" = "ord",
    latency_col: str = "latency_ms",
    cfg: PolitenessConfig | None = None,
    delay_col: str | None = None,
) -> DataFrame:
    """Deterministic per-host fetch schedule for one frontier wave.

    Adds: seq (1-based position in the host's FIFO), wait_ms (throttle wait
    before this fetch), fetch_start_ms, fetch_end_ms (all relative to the
    wave start, per host).  Pure window functions — one shuffle on host.

    ``delay_col`` names an optional per-row column (ms, nullable) carrying a
    robots.txt ``Crawl-delay`` directive (see
    :func:`crawlspark.robots.crawl_delay_for`): it raises the wait floor for
    that host — the directive is a minimum gap, so the wait becomes
    ``max(crawl_delay_ms, throttler wait)``, still inside the waitAtMax cap
    only if the cap exceeds the directive (directives win over the cap:
    obeying the site beats obeying our own ceiling).
    """
    cfg = cfg or PolitenessConfig()
    # ord_col may be a list when a single column is not a total order within
    # a host (e.g. multi-seed crawls where ord is only unique per seed):
    # ties in the FIFO window would make seq/wait nondeterministic
    ord_cols = [ord_col] if isinstance(ord_col, str) else list(ord_col)
    w = Window.partitionBy(host_col).orderBy(*ord_cols)
    prev_lat = F.lag(latency_col).over(w)
    frm = (
        F.lit(cfg.wait_from_ms).cast("double")
        if cfg.wait_from_ms is not None
        else prev_lat * cfg.wait_factor
    )
    to = (
        F.lit(cfg.wait_to_ms).cast("double")
        if cfg.wait_to_ms is not None
        else prev_lat * cfg.wait_to_factor
    )
    base = (frm + cfg.wait_point * (to - frm)).cast("long")
    clamped = F.greatest(F.lit(cfg.min_wait_ms).cast("long"), base)
    if cfg.max_wait_ms is not None:
        clamped = F.least(F.lit(cfg.max_wait_ms).cast("long"), clamped)
    if delay_col is not None:
        clamped = F.greatest(
            clamped, F.coalesce(F.col(delay_col).cast("long"), F.lit(0))
        )
    wait = F.when(prev_lat.isNull(), F.lit(0)).otherwise(clamped)
    df = frontier.withColumn("seq", F.row_number().over(w).cast("long"))
    df = df.withColumn("wait_ms", wait.cast("long"))
    cum_lat_prev = F.coalesce(
        F.sum(latency_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    cum_wait = F.sum("wait_ms").over(w.rowsBetween(Window.unboundedPreceding, 0))
    df = df.withColumn("fetch_start_ms", (cum_lat_prev + cum_wait).cast("long"))
    df = df.withColumn(
        "fetch_end_ms", (F.col("fetch_start_ms") + F.col(latency_col)).cast("long")
    )
    return df


def politeness_partition(
    frontier: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    ts_col: str = "crawl_ts",
    cfg: PolitenessConfig | None = None,
) -> DataFrame:
    """The north_rule queue: salted repartition + sortWithinPartitions.

    Result: each partition holds whole host-buckets, rows sorted by
    (host_bucket, priority, crawl_ts) — a fetch task reads its partition in
    order and paces per host in-task.
    """
    cfg = cfg or PolitenessConfig()
    df = frontier.withColumn("host_bucket", host_bucket(F.col(host_col), cfg.num_buckets))
    # skew: count per host within the wave; hot hosts get spread over salt
    # sub-buckets (per-salt pacing x salt preserves the host budget)
    counts = df.groupBy(host_col).count()
    df = df.join(F.broadcast(counts.filter(F.col("count") >= cfg.hot_threshold)
                             .select(host_col, F.lit(True).alias("__hot"))),
                 host_col, "left")
    salt_expr = F.when(
        F.col("__hot").isNotNull(),
        F.pmod(F.xxhash64(priority_col), F.lit(cfg.salt)).cast("int"),
    ).otherwise(F.lit(0))
    df = df.withColumn("salt", salt_expr).withColumn(
        "pace_factor", F.when(F.col("__hot").isNotNull(), F.lit(cfg.salt)).otherwise(F.lit(1))
    ).drop("__hot")
    df = df.withColumn(
        "queue_bucket",
        F.pmod(F.col("host_bucket") * 31 + F.col("salt"), F.lit(cfg.num_buckets)),
    )
    return df.repartition(cfg.num_buckets, "queue_bucket").sortWithinPartitions(
        "host_bucket", priority_col, ts_col
    )


def throttle_schedule_in_task(
    frontier: DataFrame,
    host_col: str = "host",
    ord_col: "str | list[str]" = "ord",
    latency_col: str = "latency_ms",
    cfg: PolitenessConfig | None = None,
) -> DataFrame:
    """Same schedule as :func:`throttle_schedule`, computed IN-TASK after the
    north_rule repartition: one shuffle on host_bucket, then vectorized
    pandas groupby-cumsum per partition (each host lives in exactly one
    partition, so per-host state never crosses tasks).  This is the shape
    the real fetch stage uses — the pacing loop replaces the cumsum with
    actual sleeps."""
    import pandas as pd

    cfg = cfg or PolitenessConfig()
    df = frontier.withColumn(
        "host_bucket", host_bucket(F.col(host_col), cfg.num_buckets)
    )
    ord_cols = [ord_col] if isinstance(ord_col, str) else list(ord_col)
    df = df.repartition(cfg.num_buckets, "host_bucket").sortWithinPartitions(
        host_col, *ord_cols
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", seq LONG, wait_ms LONG, fetch_start_ms LONG, fetch_end_ms LONG"
    min_wait, max_wait = cfg.min_wait_ms, cfg.max_wait_ms
    f_from, f_to, point = cfg.wait_factor, cfg.wait_to_factor, cfg.wait_point
    fix_from, fix_to = cfg.wait_from_ms, cfg.wait_to_ms

    def sched(batches):
        # accumulate the partition (bounded: one host_bucket's wave share),
        # then one vectorized pass
        parts = [p for p in batches]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        g = pdf.groupby(host_col, sort=False)
        pdf["seq"] = g.cumcount() + 1
        prev_lat = g[latency_col].shift(1)
        frm = (
            pd.Series(float(fix_from), index=pdf.index)
            if fix_from is not None else prev_lat * f_from
        )
        to = (
            pd.Series(float(fix_to), index=pdf.index)
            if fix_to is not None else prev_lat * f_to
        )
        wait = (frm + point * (to - frm)).clip(lower=min_wait)
        if max_wait is not None:
            wait = wait.clip(upper=max_wait)
        wait = wait.where(prev_lat.notna(), 0).fillna(0).astype("int64")
        pdf["wait_ms"] = wait
        cum_lat_prev = g[latency_col].cumsum() - pdf[latency_col]
        cum_wait = wait.groupby(pdf[host_col], sort=False).cumsum()
        pdf["fetch_start_ms"] = (cum_lat_prev + cum_wait).astype("int64")
        pdf["fetch_end_ms"] = pdf["fetch_start_ms"] + pdf[latency_col]
        yield pdf

    return df.mapInPandas(sched, out_schema)


def recrawl_schedule(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
    min_interval: int = 3600,
    max_interval: int = 30 * 86400,
    streak_cap: int = 15,
) -> DataFrame:
    """Freshness-adaptive re-crawl scheduling (the Cho & Garcia-Molina
    revisit-policy idea reduced to exponential backoff): per URL, order
    its fetch history by timestamp; a fetch whose content hash differs
    from the previous fetch is a CHANGE.  The run of unchanged fetches
    since the last change drives the next revisit interval

        next_interval = min(max_interval, min_interval << min(streak, cap))

    so frequently-changing pages are revisited at ``min_interval`` while
    static pages back off exponentially — the standard way a 10^10-URL
    crawler keeps its recrawl budget proportional to observed churn.

    One PARTITIONED window pass (per url, ordered by ts) plus one
    map-side-combined groupBy; all integer arithmetic (bit shift, not
    pow), so the schedule is bit-exact and SQL-replayable.

    Returns (url, n_fetches, n_changes, unchanged_streak,
    next_interval_s, next_fetch_ts); the first fetch of a URL counts as
    a change (there was no prior content).
    """
    w = Window.partitionBy(url_col).orderBy("__ts")
    rows = history.select(
        F.col(url_col), F.col(ts_col).cast("long").alias("__ts"),
        F.col(hash_col).alias("__h"),
    ).withColumn("__rn", F.row_number().over(w)).withColumn(
        "__changed",
        (F.col("__rn") == 1)
        | (F.col("__h") != F.lag("__h").over(w)),
    )
    agg = rows.groupBy(url_col).agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum(F.col("__changed").cast("long")).alias("n_changes"),
        F.max("__ts").alias("__last_ts"),
        F.max(F.when(F.col("__changed"), F.col("__rn"))).alias("__last_chg"),
    )
    streak = (F.col("n_fetches") - F.col("__last_chg")).cast("long")
    capped = F.least(streak, F.lit(int(streak_cap)))
    interval = F.least(
        F.lit(int(max_interval)).cast("long"),
        F.expr(f"shiftleft(CAST({int(min_interval)} AS BIGINT), "
               "CAST(__capped AS INT))"),
    )
    return (
        agg.withColumn("__capped", capped)
        .withColumn("unchanged_streak", streak)
        .withColumn("next_interval_s", interval)
        .select(
            url_col,
            "n_fetches",
            "n_changes",
            "unchanged_streak",
            "next_interval_s",
            (F.col("__last_ts") + F.col("next_interval_s"))
            .cast("long").alias("next_fetch_ts"),
        )
    )


def ip_group_admission(
    df: DataFrame,
    host_col: str = "host",
    ord_col: str = "ord",
    budget: int = 10,
    n_groups: int = 64,
    salt: str = "dns",
) -> DataFrame:
    """Server-level (IP-group) politeness: many small sites share one
    server behind virtual hosting / a CDN edge, so per-HOST budgets alone
    can still hammer one box with 500 polite hosts x 1 req.  Production
    crawlers therefore ALSO cap per resolved IP (cf. the IRLbot and
    Heritrix per-IP queue policies — public literature; the reference has
    no DNS layer, it fetches one site).

    Without a resolver in the sandbox, the host -> server map is the
    deterministic salted hash ``ip_group = base_hash(salt || host) %
    n_groups`` — swap in a real DNS-resolution table (host, ip) at
    deploy time; everything downstream is keyed on the group id either
    way.  Each group admits its first ``budget`` rows in crawl order;
    the rest come back ``admitted = false`` for the next wave (same
    deferral contract as the per-host frontier cap).

    Plan: one partitioned window over ip_group — n_groups ~ O(number of
    servers), so no single-partition stage; the group key is computed in
    the same narrow map as canonicalize+hash on the frontier path.
    """
    from .textops.dedup import base_hash

    g = base_hash(F.concat(F.lit(salt), F.col(host_col))) % n_groups
    w = Window.partitionBy("ip_group").orderBy(ord_col, host_col)
    return (
        df.withColumn("ip_group", g.cast("long"))
        .withColumn("ip_seq", F.row_number().over(w).cast("long"))
        .withColumn("admitted", F.col("ip_seq") <= budget)
    )


def bandwidth_throttle_schedule(
    wave: DataFrame,
    rate_bytes_per_s: int,
    min_gap_ms: int = 100,
    host_col: str = "host",
    ord_col: str = "seq",
    bytes_col: str = "est_bytes",
) -> DataFrame:
    """Bandwidth-aware per-host pacing — the byte-cost twin of
    :func:`throttle_schedule`: the gap before fetch k is the time the
    PREVIOUS response occupied the host's bandwidth allowance
    (``prev_bytes * 1000 div rate``), floored at ``min_gap_ms``.  Image
    crawls need this instead of fixed gaps: a 5 MB photo at a polite
    1 MB/s earns its host a 5 s pause, a 2 kB robots probe only the
    floor.

    Integer arithmetic throughout (SQL-replayable), one shuffle on host,
    both windows (lag + running sum) share the Exchange.  Returns the
    wave plus gap_ms / fetch_start_ms / fetch_end_ms relative to the
    host's wave start (transfer time = bytes * 1000 div rate).
    """
    w = Window.partitionBy(host_col).orderBy(ord_col)
    v = F.col(bytes_col).cast("long")
    rate = int(rate_bytes_per_s)
    df = wave.withColumn("__prev_b", F.lag(v).over(w)).withColumn(
        "__xfer", F.expr(f"{bytes_col} * 1000L div {rate}L")
    )
    gap = F.when(
        F.col("__prev_b").isNull(), F.lit(0).cast("long")
    ).otherwise(
        F.greatest(
            F.lit(int(min_gap_ms)).cast("long"),
            F.expr(f"__prev_b * 1000L div {rate}L"),
        )
    )
    df = df.withColumn("gap_ms", gap).drop("__prev_b")
    cum = F.sum(F.col("gap_ms") + F.col("__xfer")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("fetch_end_ms", cum.cast("long"))
        .withColumn(
            "fetch_start_ms",
            (F.col("fetch_end_ms") - F.col("__xfer")).cast("long"),
        )
        .drop("__xfer")
    )


CHANGE_RATE_INTERVALS_S = ((500, 21_600), (200, 86_400), (50, 604_800))
CHANGE_RATE_DEFAULT_S = 2_592_000


def host_change_rates(
    diffs: "DataFrame",
    host_col: str = "host",
    change_col: str = "change",
) -> "DataFrame":
    """Per-host change-rate rollup over a crawl-diff feed
    (checkpoint.crawl_diff output joined with the host): the observed
    modified share in permille maps to a suggested recrawl interval —

        >= 500 permille -> 6 h, >= 200 -> 1 d, >= 50 -> 7 d, else 30 d

    the corpus-level prior that seeds :func:`recrawl_schedule`'s
    per-page adaptive backoff (a page inherits its host's interval
    until its own change history says otherwise).  One map-side-
    combined aggregate + CASE.  Returns (host, n_pages, n_modified,
    modified_permille, suggested_interval_s).
    """
    agg = diffs.groupBy(host_col).agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col(change_col) == "modified", 1).otherwise(0))
        .alias("n_modified"),
    )
    pm = F.expr("(1000 * n_modified) div n_pages")
    interval = None
    for thr, sec in CHANGE_RATE_INTERVALS_S:
        cond = pm >= thr
        interval = (F.when(cond, sec) if interval is None
                    else interval.when(cond, sec))
    interval = interval.otherwise(CHANGE_RATE_DEFAULT_S)
    return agg.select(
        host_col,
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_modified").cast("long").alias("n_modified"),
        pm.cast("long").alias("modified_permille"),
        interval.cast("long").alias("suggested_interval_s"),
    )


def keepalive_connections(
    schedule: "DataFrame",
    keepalive_ms: int,
    host_col: str = "host",
    start_col: str = "fetch_start_ms",
    end_col: str = "fetch_end_ms",
) -> "DataFrame":
    """Connection-churn estimate from a wave schedule: per host, a new
    TCP/TLS connection is needed for the first fetch and after every
    idle gap longer than the server's keep-alive timeout — the metric
    that decides whether per-host politeness delays are quietly paying
    a TLS handshake per request (wait > keep-alive means 100%% churn,
    and the politeness config should know).

    One partitioned window (lag of the previous fetch end).  Returns
    (host, n_fetches, n_connections, churn_permille).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(start_col)
    prev_end = F.lag(F.col(end_col)).over(w)
    new_conn = (
        prev_end.isNull()
        | ((F.col(start_col) - prev_end) > int(keepalive_ms))
    ).cast("long")
    per = schedule.withColumn("__nc", new_conn)
    return per.groupBy(host_col).agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum("__nc").cast("long").alias("n_connections"),
        F.expr("(1000 * sum(__nc)) div count(*)").cast("long")
        .alias("churn_permille"),
    )


AIMD_OUT_SCHEMA = (
    "host STRING, final_c LONG, max_c LONG, n_halvings LONG"
)


def aimd_concurrency(
    history: DataFrame,
    c_max: int = 16,
    host_col: str = "host",
    ord_col: str = "ord",
    ok_col: str = "ok",
) -> DataFrame:
    """AIMD per-host fetch concurrency from outcome history — the TCP
    congestion-control discipline applied to polite crawling (what
    adaptive-politeness fetchers do beyond the reference's fixed
    Throttler multipliers, src/Loader/Http/Politeness/Throttler.php:49-55):
    start at 1 in-flight request; each success window adds one
    (additive increase, capped at ``c_max``); any 429/5xx/timeout halves
    it (multiplicative decrease, floor 1).  Returns per host the final
    and peak concurrency plus the halving count (the health signal).

    The recurrence is sequential BY DESIGN (c_t depends on c_{t-1} with
    data-dependent branching), so no window expresses it; the
    distributed shape is the natural one — hosts partition the state,
    each host's retained history is bounded (last K outcomes), and the
    per-group Arrow batch is scanned once in ord order.  Same
    plan family as throttle_schedule_in_task: applyInPandas keyed by
    host, never a row-at-a-time UDF.
    """
    import numpy as np
    import pandas as pd

    cmax = int(c_max)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ord_col)
        ok = pdf[ok_col].to_numpy(dtype=bool)
        c, peak, halvings = 1, 1, 0
        for good in ok:
            if good:
                c = min(cmax, c + 1)
            else:
                c = max(1, c // 2)
                halvings += 1
            peak = max(peak, c)
        return pd.DataFrame(
            {"host": [pdf[host_col].iloc[0]], "final_c": [c],
             "max_c": [peak], "n_halvings": [halvings]}
        )

    return history.groupBy(host_col).applyInPandas(run, AIMD_OUT_SCHEMA)


DNS_PLAN_SCHEMA = (
    "host STRING, n_lookups LONG, n_resolves LONG, n_hits LONG"
)


def dns_cache_plan(
    lookups: DataFrame,
    ttl_ms: int,
    host_col: str = "host",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Resolver-cache planning for the fetch stage — at 10^10-URL
    frontier scale DNS is a real bottleneck (every fetch task must map
    host -> IP before it can open a socket), and the planning question
    is how many actual resolutions a wave costs under a TTL cache vs the
    raw lookup count.  Semantics are the standard positive cache: the
    first lookup of a host MISSES (one resolution) and caches until
    ``t + ttl_ms``; lookups strictly before expiry HIT; the first lookup
    at-or-after expiry misses again and restarts the window from ITS
    timestamp (not from expiry — caches refresh on demand, they don't
    tick).  The reference resolves through PHP's per-process socket
    layer with no cross-request planning at all (src/Loader/Http/
    HttpLoader.php delegates to Guzzle); this is the distributed
    replacement.

    The miss chain is sequential by design (each miss re-anchors the
    expiry at a data-dependent timestamp), so no window expresses it —
    same family as :func:`aimd_concurrency`: hosts partition the state,
    applyInPandas scans each host group once.  Within a group the scan
    is O(n_misses) ``searchsorted`` jumps over the sorted timestamp
    array, NOT O(n_lookups) Python iterations — for a hot host with
    millions of lookups and a handful of TTL windows the interpreter
    work is proportional to the handful.
    """
    import numpy as np
    import pandas as pd

    ttl = int(ttl_ms)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(pdf[ts_col].to_numpy(dtype=np.int64))
        n = len(ts)
        misses = 0
        i = 0
        while i < n:
            misses += 1
            # everything in [ts[i], ts[i]+ttl) is served by this resolve
            i = int(np.searchsorted(ts, ts[i] + ttl, side="left"))
        return pd.DataFrame(
            {
                "host": [pdf[host_col].iloc[0]],
                "n_lookups": [n],
                "n_resolves": [misses],
                "n_hits": [n - misses],
            }
        )

    return lookups.groupBy(host_col).applyInPandas(run, DNS_PLAN_SCHEMA)


def adaptive_timeouts(
    responses: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    factor_permille: int = 2000,
    min_timeout_ms: int = 1000,
    max_timeout_ms: int = 30000,
) -> DataFrame:
    """Per-host adaptive fetch timeouts from observed latency — a fixed
    global timeout either wastes slots on a slow-but-healthy host
    (false timeouts -> retries -> more load, the congestion spiral) or
    waits far too long on a fast host's rare hang.  The classic recipe:
    timeout = clamp(2 x p95 latency).  The reference exposes only a
    static per-request timeout (Guzzle options through
    src/Loader/Http/HttpLoader.php).

    p95 is an EXACT order statistic, not percentile_approx and not the
    interpolated float percentile: rank the host's latencies with a
    partitioned row_number and take rank ceil(0.95 n) — integer-exact
    (gate-replayable) and deterministic under ties thanks to a latency+
    rank ordering.  Shape: one partitioned window + a map-side-combined
    count, no global sort; hosts partition the work.
    """
    from pyspark.sql import Window

    lat = F.col(latency_col).cast("long")
    w = Window.partitionBy(host_col).orderBy("__lat")
    ranked = responses.select(
        F.col(host_col), lat.alias("__lat")
    ).withColumn("__rn", F.row_number().over(w))
    counts = ranked.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_samples")
    )
    # ceil(0.95 n) in integers
    target = F.expr("(95 * n_samples + 99) div 100")
    p95 = (
        ranked.join(F.broadcast(counts), host_col)
        .filter(F.col("__rn") == F.greatest(F.lit(1), target))
        .select(
            host_col, "n_samples", F.col("__lat").alias("p95_ms")
        )
    )
    raw = F.expr(f"(p95_ms * {int(factor_permille)}) div 1000")
    return p95.withColumn(
        "timeout_ms",
        F.greatest(
            F.lit(int(min_timeout_ms)),
            F.least(F.lit(int(max_timeout_ms)), raw),
        ).cast("long"),
    )


def latency_histogram(
    responses: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    quantile_pct: int = 95,
) -> DataFrame:
    """Mergeable per-host latency histogram + histogram-derived quantile
    BOUNDS — the bounded-state alternative to ``adaptive_timeouts``'
    exact order statistic: the exact p95 needs every sample shuffled;
    this keeps O(hosts x ~40 buckets) rows that merge across days by
    simple addition (the HdrHistogram trade, at 1 significant digit).

    Bucketing is decimal-exact and string-derived so the SQL oracle
    replays it bit-for-bit with no float log: a latency with first digit
    d and k trailing digits falls in [d*10^k, (d+1)*10^k - 1] — lb/ub
    built by digit concatenation, never pow().  The quantile bound is
    the first bucket whose cumulative count reaches
    greatest(1, ceil(pct*n/100)) per host (bounded window: <= ~40
    buckets per host).

    Returns (host, n_samples, q_lb_ms, q_ub_ms): the true p-quantile is
    PROVABLY inside [q_lb_ms, q_ub_ms] (asserted against the exact rank
    statistic in tests).
    """
    return latency_quantile_bounds(
        latency_buckets(responses, host_col=host_col,
                        latency_col=latency_col),
        quantile_pct=quantile_pct,
    )


def latency_buckets(
    responses: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
) -> DataFrame:
    """The mergeable half: (host, lb, ub, cnt) bucket rows.  Two bucket
    relations built on different days MERGE by unioning and re-summing
    cnt per (host, lb, ub) — asserted in tests against the one-pass
    path."""
    # clamp at 0: a clock-skewed negative latency would otherwise build
    # a corrupt '-…' bucket with lb > ub that sorts before every real
    # bucket and silently shifts the cumulative quantile read-out
    x = F.greatest(F.col(latency_col).cast("long"), F.lit(0))
    s = x.cast("string")
    digits = F.length(s)
    d1 = F.substring(s, 1, 1)
    lb = F.concat(d1, F.repeat(F.lit("0"), digits - 1)).cast("long")
    ub = F.concat(d1, F.repeat(F.lit("9"), digits - 1)).cast("long")
    return (
        responses.select(F.col(host_col).alias("host"),
                         lb.alias("lb"), ub.alias("ub"))
        .groupBy("host", "lb", "ub")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def latency_quantile_bounds(
    hist: DataFrame, quantile_pct: int = 95
) -> DataFrame:
    """The read-out half: first bucket whose cumulative count reaches
    the quantile rank, per host (bounded window: <= ~40 buckets/host)."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("lb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("host")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(tot)
    )
    pct = int(quantile_pct)
    need = F.greatest(F.lit(1), F.expr(f"({pct} * n + 99) div 100"))
    hits = cum.filter(F.col("cum") >= need)
    wmin = Window.partitionBy("host").orderBy("lb")
    return (
        hits.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            "host", F.col("n").alias("n_samples"),
            F.col("lb").alias("q_lb_ms"), F.col("ub").alias("q_ub_ms"),
        )
    )


def sitemap_lastmod_trust(
    snapshots: "DataFrame",
    host_col: str = "host",
    lastmod_col: str = "lastmod_ts",
    prev_fetch_col: str = "prev_fetch_ts",
    prev_hash_col: str = "prev_hash",
    cur_hash_col: str = "cur_hash",
    min_samples: int = 20,
) -> "DataFrame":
    """Per-host trust score for sitemap ``<lastmod>`` claims — the signal
    that decides whether a recrawl scheduler may SKIP unchanged-claiming
    URLs (big hosts publish accurate lastmod; many CMSes stamp every URL
    with "now", making the field worthless).  Extends the reference's
    Sitemap::getUrlsFromSitemap withData=true surface
    (src/Steps/Loading/Sitemap.php:27-61), which parses lastmod but
    cannot say whether to believe it.

    Per URL the claim is ``lastmod > prev_fetch_ts`` (page says it changed
    since we last fetched) and the truth is ``prev_hash != cur_hash``.
    Per host this yields the confusion counts and integer-permille
    precision (claimed-changed that really changed) and recall (real
    changes that were claimed): ``trusted`` needs precision AND recall
    >= 900 over >= min_samples URLs — such hosts' unclaimed URLs can be
    skipped; ``noisy`` (>= 500 both) halves their recrawl priority;
    ``untrusted`` means ignore the field; fewer than min_samples URLs is
    ``insufficient``.

    One map-side-combined groupBy on host; pure JVM conditional sums.
    """
    claimed = F.col(lastmod_col) > F.col(prev_fetch_col)
    actual = F.col(prev_hash_col) != F.col(cur_hash_col)

    def cnt(cond) -> "F.Column":
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    g = snapshots.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n_urls"),
        cnt(claimed & actual).alias("tp"),
        cnt(claimed & ~actual).alias("fp"),
        cnt(~claimed & actual).alias("fn"),
        cnt(~claimed & ~actual).alias("tn"),
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0,
        (1000 * F.col("tp")) / (F.col("tp") + F.col("fp")),
    ).cast("long")
    recall = F.when(
        F.col("tp") + F.col("fn") > 0,
        (1000 * F.col("tp")) / (F.col("tp") + F.col("fn")),
    ).cast("long")
    g = g.withColumn("precision_permille", precision).withColumn(
        "recall_permille", recall)
    p = F.coalesce(F.col("precision_permille"), F.lit(1000))
    r = F.coalesce(F.col("recall_permille"), F.lit(1000))
    trust = (
        F.when(F.col("n_urls") < min_samples, "insufficient")
        .when((p >= 900) & (r >= 900), "trusted")
        .when((p >= 500) & (r >= 500), "noisy")
        .otherwise("untrusted")
    )
    return g.withColumn("trust", trust)


def interarrival_burstiness(
    log: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-host inter-arrival burstiness (squared coefficient of
    variation of the gaps) — the pacing diagnostic that separates a
    host whose traffic is a steady politeness-shaped drip (CV^2 ~ 0)
    from one hammered in bursts (CV^2 >> 1, Poisson = 1): bursty
    per-host arrival is what triggers 429 storms even when the MEAN
    rate respects the crawl delay, so the scheduler smooths exactly
    the hosts this flags.

        cv2 = Var(g)/Mean(g)^2 = (n*Sg2 - Sg^2) / Sg^2

    Gaps from one lag window PARTITIONED by host; the two gap sums
    are integer-exact per host (map-side combined), and only the
    final ratio runs in doubles on those exact operands.  Pick the
    timestamp UNIT so sum(gap^2) fits int64 (milliseconds for
    month-scale logs; microseconds only for dense traces — a lone
    3e9-us gap already squares past 2^63).  Returns (host, n_gaps,
    sum_gap, cv2_milli); hosts with < 2 gaps or a zero mean report
    NULL cv2.
    """
    w = Window.partitionBy(host_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("long")
    gap = ts - F.lag(ts).over(w)
    g = (
        log.withColumn("__gap", gap)
        .filter(F.col("__gap").isNotNull())
        .groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("__gap").cast("long").alias("sum_gap"),
            F.sum(F.col("__gap") * F.col("__gap")).cast("long")
            .alias("__sum_gap2"),
        )
    )
    cv2 = (
        (F.col("n_gaps").cast("double") * F.col("__sum_gap2")
         - F.col("sum_gap").cast("double") * F.col("sum_gap"))
        / (F.col("sum_gap").cast("double") * F.col("sum_gap"))
    )
    return g.select(
        "host", "n_gaps", "sum_gap",
        F.when((F.col("n_gaps") >= 2) & (F.col("sum_gap") > 0),
               F.round(1e3 * cv2, 0).cast("long")).alias("cv2_milli"),
    )


def nxdomain_cache_plan(
    lookups: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    rcode_col: str = "rcode",
    neg_ttl: int = 300,
) -> DataFrame:
    """Negative DNS caching audit (RFC 2308): an NXDOMAIN answer is
    cacheable for the SOA-bounded TTL, and a frontier full of link-rot
    hosts re-resolves the same dead names thousands of times per wave
    unless the resolver layer honors it.  Replays a lookup log against
    a ``neg_ttl`` negative cache: a lookup is SUPPRESSED when the most
    recent prior NXDOMAIN for its host is within the TTL (the cache
    answers), otherwise it goes to the wire.

    One conditional running max per host (window PARTITIONED by host,
    exclusive frame), then a map-side-combined rollup.  Returns
    (host, n_lookups, n_nxdomain, n_suppressed, saved_permille).
    """
    w = (
        Window.partitionBy(host_col).orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts = F.col(ts_col).cast("long")
    last_nx = F.max(
        F.when(F.col(rcode_col) == "nxdomain", ts)).over(w)
    suppressed = (
        last_nx.isNotNull() & (ts - last_nx <= int(neg_ttl))
        & (ts > last_nx)
    )
    g = lookups.withColumn("__sup", F.coalesce(suppressed, F.lit(False)))
    return (
        g.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lookups"),
            F.sum(F.when(F.col(rcode_col) == "nxdomain", 1)
                  .otherwise(0)).cast("long").alias("n_nxdomain"),
            F.sum(F.when(F.col("__sup"), 1).otherwise(0)).cast("long")
            .alias("n_suppressed"),
        )
        .withColumn("saved_permille",
                    F.expr("(1000 * n_suppressed) div n_lookups"))
    )


def parallel_throttle_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    ord_col: str = "ord",
    delay_col: str = "delay_ms",
    connections: int = 2,
) -> DataFrame:
    """k-connection politeness schedule — HTTP/2 politeness is not
    "one request per delay" but "k concurrent streams, each paced":
    with ``connections`` lanes per host, the i-th URL (0-based within
    its host, priority order) dispatches on lane i mod k at
    (i div k) * delay_ms.  k=1 degenerates to the sequential
    :func:`throttle_schedule` spacing; the host finishes in
    ceil(n/k) * delay instead of n * delay.

    One window per host (partitioned — the politeness unit owns its
    partition, same shape as the sequential scheduler).  Returns
    (host, url-ord columns passthrough, lane, dispatch_ms).
    """
    w = Window.partitionBy(host_col).orderBy(ord_col)
    seq = F.row_number().over(w) - 1
    k = int(connections)
    return (
        frontier.withColumn("lane", (seq % k).cast("int"))
        .withColumn(
            "dispatch_ms",
            (F.floor(seq / k) * F.col(delay_col).cast("long"))
            .cast("long"),
        )
    )


def token_bucket_admission(
    requests: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts_ms",
    capacity: int = 5,
    refill_per_s: int = 1,
) -> DataFrame:
    """Token-bucket admission replay — the rate-limit model most CDNs
    actually run (burst up to ``capacity``, sustained ``refill_per_s``):
    unlike every other schedule in this module the bucket's clamped
    state (tokens = min(C, tokens + r*dt) - 1 on admit) is a genuine
    sequential recurrence — neither a window nor a prefix sum
    expresses the min-clamp — so this is the module's honest
    applyInPandas case: per-host groups replay in arrival order
    inside one Arrow batch, hosts in parallel (state never crosses
    hosts, the same key-ownership shape as politeness_partition).

    Integer millitoken arithmetic (no float drift): refill =
    refill_per_s * dt_ms.  Returns (host, ts_ms, admitted,
    tokens_after_milli).
    """
    import pandas as pd

    cap_m = int(capacity) * 1000
    out_schema = ("host string, ts_ms long, admitted boolean, "
                  "tokens_after_milli long")

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        toks = cap_m
        last = None
        admitted, after = [], []
        for t in pdf[ts_col]:
            if last is not None:
                toks = min(cap_m, toks + int(refill_per_s) * (t - last))
            last = t
            if toks >= 1000:
                toks -= 1000
                admitted.append(True)
            else:
                admitted.append(False)
            after.append(toks)
        return pd.DataFrame({
            "host": pdf[host_col].values,
            "ts_ms": pdf[ts_col].values,
            "admitted": admitted,
            "tokens_after_milli": after,
        })

    return (
        requests.select(F.col(host_col).alias(host_col),
                        F.col(ts_col).cast("long").alias(ts_col))
        .groupBy(host_col)
        .applyInPandas(replay, out_schema)
    )


def host_anomaly_z(
    daily: DataFrame,
    host_col: str = "host",
    day_col: str = "day",
    count_col: str = "n",
    z_milli_threshold: int = 3000,
) -> DataFrame:
    """Per-host traffic anomaly z-score — is TODAY's fetch volume for
    a host an outlier against its own history?  A spike usually means
    a trap opened (calendar pages, faceted search) or a sitemap dump
    landed; a collapse means the host started blocking us.  Flag
    before the wave planner trusts the backlog.

        z = (x_latest - mean(history)) / stddev(history)

    All sums integer-exact per host (count/sum/sum-of-squares over
    the history EXCLUDING the latest day); the final z is one double
    on exact operands, milli-quantized.  Hosts with < 3 history days
    or zero variance report NULL z.  Returns (host, latest_day,
    latest_n, hist_days, z_milli, anomalous).
    """
    latest = daily.groupBy(F.col(host_col).alias("host")).agg(
        F.max(F.col(day_col).cast("long")).alias("latest_day"))
    d = daily.select(F.col(host_col).alias("host"),
                     F.col(day_col).cast("long").alias("day"),
                     F.col(count_col).cast("long").alias("n"))
    j = d.join(latest, "host")
    hist = j.filter(F.col("day") < F.col("latest_day")).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("hist_days"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    cur = j.filter(F.col("day") == F.col("latest_day")).select(
        "host", F.col("day").alias("latest_day"),
        F.col("n").alias("latest_n"))
    out = cur.join(hist, "host", "left")
    k = F.col("hist_days").cast("double")
    mean = F.col("s1") / k
    var = (F.col("s2") - F.col("s1") * F.col("s1") / k) / k
    z = (F.col("latest_n") - mean) / F.sqrt(var)
    z_milli = F.when(
        (F.col("hist_days") >= 3)
        & (F.col("s2") * F.col("hist_days")
           > F.col("s1") * F.col("s1")),
        F.round(1e3 * z, 0).cast("long"),
    )
    return out.select(
        "host", "latest_day", "latest_n",
        F.coalesce("hist_days", F.lit(0)).alias("hist_days"),
        z_milli.alias("z_milli"),
        F.coalesce(F.abs(z_milli) >= int(z_milli_threshold),
                   F.lit(False)).alias("anomalous"),
    )


def schedule_audit(
    schedule: DataFrame,
    host_col: str = "host",
    start_col: str = "fetch_start_ms",
    end_col: str = "fetch_end_ms",
    min_gap_col: str | None = None,
    min_gap_ms: int = 0,
) -> DataFrame:
    """Trust-but-verify audit of a fetch schedule: per host, check every
    consecutive pair (in start order) leaves the required politeness gap
    (``max(min_gap_ms, min_gap_col)``) between the previous fetch's END
    and the next fetch's START, and that fetches never overlap.  The
    robots compliance audit (suite14) checks WHAT was fetched; this
    checks WHEN — the invariant the north rule's host-keyed priority
    queue must uphold, re-verified from the emitted schedule rather than
    trusted from the scheduler's construction.

    Returns per host: n_fetches, n_gap_violations, n_overlaps,
    min_gap_ms_observed (NULL for single-fetch hosts).  One shuffle on
    host (lag window + groupBy share the partitioning).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    req = F.lit(min_gap_ms).cast("long")
    if min_gap_col is not None:
        req = F.greatest(req, F.coalesce(
            F.col(min_gap_col).cast("long"), F.lit(0)))
    gap = F.col(start_col) - F.lag(end_col).over(w)
    d = schedule.withColumn("__gap", gap).withColumn("__req", req)
    return d.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum(F.when((F.col("__gap") < F.col("__req"))
                     & F.col("__gap").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_gap_violations"),
        F.sum(F.when(F.col("__gap") < 0, 1).otherwise(0))
        .cast("long").alias("n_overlaps"),
        F.min("__gap").alias("min_gap_ms_observed"),
    )
