"""The fetch stage: politeness-paced batched fetching inside mapInPandas.

This is the live counterpart of the corpus equi-join used by tests/bench
(engine.py): the frontier is repartitioned so each host lives in exactly one
partition (politeness.politeness_partition), then each task walks its
partition in (host, ord) order, sleeping the throttle wait between same-host
rows and calling a pluggable transport (reference flow: HttpLoader::load,
src/Loader/Http/HttpLoader.php:122-168 — robots gate and cache probe happen
BEFORE this stage as joins; redirects are followed inside the transport like
the loader does, HttpLoader.php:430-470).

Transports:
- :class:`DictTransport` — deterministic in-memory corpus (tests).
- :class:`UrllibTransport` — stdlib HTTP client for real crawls (no network
  in this sandbox; constructing it is fine, fetching requires egress).

Retry policy per reference RetryErrorResponseHandler: 429/503 → wait and
retry (waits from steps.RETRY_WAITS_MS, Retry-After honored up to 60 s),
give up after 2 retries.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import politeness

RESPONSE_SCHEMA = (
    "url STRING, host STRING, ord LONG, status INT, body BINARY, "
    "effective_url STRING, elapsed_ms LONG, attempts INT"
)


def _make_caller(transport):
    """Adapt a transport to the full (url, cookie_header, method, req_body)
    calling convention by inspecting its signature ONCE — never by catching
    TypeError around the call, which would swallow a TypeError raised
    *inside* the transport and silently retry with arguments dropped
    (e.g. a POST re-issued as a GET)."""
    import inspect

    try:
        params = inspect.signature(transport).parameters
        names = set(params)
        var_kw = any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
    except (TypeError, ValueError):  # builtins / C callables: assume full
        names, var_kw = {"cookie_header", "method", "req_body"}, False

    def call(url, cookie_header, method="GET", req_body=None):
        kwargs = {}
        if var_kw or "cookie_header" in names:
            kwargs["cookie_header"] = cookie_header
        if var_kw or "method" in names:
            kwargs["method"] = method
        if var_kw or "req_body" in names:
            kwargs["req_body"] = req_body
        return transport(url, **kwargs)

    return call


@dataclass
class FetchResult:
    status: int
    body: bytes
    effective_url: str
    retry_after_s: int | None = None
    # raw Set-Cookie values; the stage keeps a per-registrable-domain jar
    # (reference: src/Loader/Http/Cookies/CookieJar.php:95-130)
    set_cookies: tuple = ()


_SHORT_SLD = {"co", "com", "net", "org", "gov", "ac", "edu"}


def registrable_domain_py(host: str) -> str:
    """Python twin of canon.registrable_domain (same PSL snapshot +
    short-SLD fallback — keep the two in lockstep)."""
    from .canon import THREE_PART_SUFFIXES, TWO_PART_SUFFIXES

    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if len(parts) >= 4 and ".".join(parts[-3:]) in THREE_PART_SUFFIXES:
        return ".".join(parts[-4:])
    if ".".join(parts[-2:]) in TWO_PART_SUFFIXES or parts[-2] in _SHORT_SLD:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


class DictTransport:
    """Deterministic transport over an in-memory page dict (tests/bench)."""

    def __init__(self, pages: dict[str, tuple[int, bytes]], latency_s: float = 0.0):
        self.pages = pages
        self.latency_s = latency_s

    def __call__(
        self,
        url: str,
        cookie_header: str | None = None,
        method: str = "GET",
        req_body: bytes | None = None,
    ) -> FetchResult:
        if self.latency_s:
            time.sleep(self.latency_s)
        # non-GET routes are keyed (method, url) — reference Http::post/put/
        # patch/delete build method-specific requests (Http.php:42-79)
        status, body = self.pages.get(
            (method, url), self.pages.get(url, (404, b""))
        )
        if callable(body):
            body = body(req_body)
        return FetchResult(status=status, body=body, effective_url=url)


class UrllibTransport:
    """stdlib HTTP transport; follows redirects like the reference loader
    (<= 10 hops).  Requires network egress — not exercised in this sandbox."""

    def __init__(self, user_agent: str = "crawlspark/0.1", timeout_s: float = 10.0):
        self.user_agent = user_agent
        self.timeout_s = timeout_s

    def __call__(
        self,
        url: str,
        cookie_header: str | None = None,
        method: str = "GET",
        req_body: bytes | None = None,
    ) -> FetchResult:
        import urllib.error
        import urllib.request

        headers = {"User-Agent": self.user_agent}
        if cookie_header:
            headers["Cookie"] = cookie_header
        req = urllib.request.Request(
            url, headers=headers, method=method, data=req_body
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return FetchResult(
                    status=resp.status, body=resp.read(), effective_url=resp.url,
                    set_cookies=tuple(resp.headers.get_all("Set-Cookie") or ()),
                )
        except urllib.error.HTTPError as e:
            ra = e.headers.get("Retry-After")
            return FetchResult(
                status=e.code, body=b"", effective_url=url,
                retry_after_s=int(ra) if ra and ra.isdigit() else None,
            )
        except (urllib.error.URLError, OSError, TimeoutError):
            # DNS failure / refused connection / socket timeout: the
            # reference loader turns these into error responses via its
            # onError hook (Loader.php:86-118) — one dead URL must not
            # kill the whole mapInPandas task.  Status 599 (the de-facto
            # network-connect-timeout code) keeps every downstream
            # 'error <=> status >= 400' gate correct (yield suppression,
            # retry_filter, metrics) without a special sentinel.
            return FetchResult(status=599, body=b"", effective_url=url)


class FetchMetrics:
    """Loader-hook counters as Spark accumulators — the distributed analog
    of the reference's beforeLoad/onSuccess/onError hooks
    (src/Loader/Loader.php:20-63,86-118): executors increment during the
    fetch task, the driver reads totals after the action completes."""

    def __init__(self, spark):
        sc = spark.sparkContext
        self.attempted = sc.accumulator(0)
        self.succeeded = sc.accumulator(0)
        self.errored = sc.accumulator(0)  # final status >= 400
        self.retries = sc.accumulator(0)

    def as_dict(self) -> dict:
        return {
            "attempted": self.attempted.value,
            "succeeded": self.succeeded.value,
            "errored": self.errored.value,
            "retries": self.retries.value,
        }


def fetch_stage(
    frontier: DataFrame,
    transport_factory: Callable[[], Callable[[str], FetchResult]],
    cfg: politeness.PolitenessConfig | None = None,
    sleep: Callable[[float], None] = time.sleep,
    retry_waits_ms: tuple[int, ...] = politeness.RETRY_WAITS_MS,
    metrics: FetchMetrics | None = None,
    use_cookies: bool = True,
) -> DataFrame:
    """Fetch the frontier with per-host pacing.

    ``use_cookies=False`` is the loader's dontUseCookies()
    (HttpLoader.php:206-210); the per-task jar is neither read nor fed.

    ``frontier`` needs (url, host, ord, latency_ms?); rows come back with
    status/body/effective_url.  ``transport_factory`` is called once per
    task (connection pools etc. live per executor, never serialized).
    Pass a :class:`FetchMetrics` to get hook-style counters (read them
    AFTER an action materializes the result).
    """
    cfg = cfg or politeness.PolitenessConfig()
    queued = politeness.politeness_partition(
        frontier.withColumn("priority", frontier["ord"])
        .withColumn("crawl_ts", frontier["ord"]),
        host_col="host", priority_col="priority", ts_col="crawl_ts", cfg=cfg,
    )
    min_wait_s = cfg.min_wait_ms / 1000.0
    max_wait_s = cfg.max_wait_ms / 1000.0 if cfg.max_wait_ms is not None else None
    f_from, f_to, point = cfg.wait_factor, cfg.wait_to_factor, cfg.wait_point
    fix_from_s = cfg.wait_from_ms / 1000.0 if cfg.wait_from_ms is not None else None
    fix_to_s = cfg.wait_to_ms / 1000.0 if cfg.wait_to_ms is not None else None

    def _wait_s(prev_dur: float) -> float:
        # same formula as throttle_schedule (full Throttler surface:
        # fixed-or-multiple from/to, deterministic point, min/max clamps)
        frm = fix_from_s if fix_from_s is not None else f_from * prev_dur
        to = fix_to_s if fix_to_s is not None else f_to * prev_dur
        w = max(min_wait_s, frm + point * (to - frm))
        return min(max_wait_s, w) if max_wait_s is not None else w

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        caller = _make_caller(transport)
        last_end: dict[str, float] = {}
        last_dur: dict[str, float] = {}
        # full-semantics per-task jar (cookies.PyCookieJar: registrable-
        # domain keyed, attribute-aware shouldBeSentTo — Cookie.php:66-78)
        from .cookies import PyCookieJar

        jar = PyCookieJar()
        out = []
        for pdf in batches:
            for r in pdf.itertuples():
                host = r.host
                now = time.monotonic()
                # throttle: wait max(min_wait, factor*last_duration) since
                # the host's previous fetch finished (Throttler.php:125-197)
                if host in last_end:
                    wait = _wait_s(last_dur.get(host, 0.0))
                    pace = r.pace_factor if hasattr(r, "pace_factor") else 1
                    remaining = last_end[host] + wait * pace - now
                    if remaining > 0:
                        sleep(remaining)
                cookie_header = (
                    jar.cookie_header(r.url, int(time.time()))
                    if use_cookies
                    else None
                )
                # optional per-row verb/body columns (Http::post/put/patch/
                # delete, Http.php:42-79); absent columns default to GET
                method = getattr(r, "method", None) or "GET"
                req_body = getattr(r, "req_body", None)
                if req_body is not None and not isinstance(req_body, bytes):
                    req_body = bytes(req_body)
                # time each ATTEMPT separately: the throttle multiple and
                # elapsed_ms reflect the final response duration, not the
                # 10s/60s retry backoff sleeps (a 429 sequence would
                # otherwise inflate the next same-host wait to ~70s)
                a0 = time.monotonic()
                res = caller(r.url, cookie_header, method, req_body)
                a1 = time.monotonic()
                attempts = 1
                # 429/503 retry with backoff; abort row after 2 retries
                for wait_ms in retry_waits_ms:
                    if res.status not in (429, 503):
                        break
                    ra = res.retry_after_s
                    w = min(ra, 60) if ra else wait_ms / 1000.0
                    sleep(w)
                    a0 = time.monotonic()
                    res = caller(r.url, cookie_header, method, req_body)
                    a1 = time.monotonic()
                    attempts += 1
                if metrics is not None:
                    metrics.attempted.add(1)
                    metrics.retries.add(attempts - 1)
                    if res.status >= 400 or res.status <= 0:
                        metrics.errored.add(1)
                    else:
                        metrics.succeeded.add(1)
                last_end[host] = a1
                last_dur[host] = a1 - a0
                if use_cookies:
                    # reference adds from the post-redirect effective URI
                    # (HttpLoader.php:662); invalid cookies are dropped by
                    # the parser, matching the loader's catch-and-skip
                    jar.add_from(
                        res.effective_url or r.url,
                        getattr(res, "set_cookies", ()) or (),
                        received_at=int(time.time()),
                    )
                out.append(
                    {
                        "url": r.url,
                        "host": host,
                        "ord": int(r.ord),
                        "status": int(res.status),
                        "body": res.body,
                        "effective_url": res.effective_url,
                        "elapsed_ms": int((a1 - a0) * 1000),
                        "attempts": attempts,
                    }
                )
        if out:
            yield pd.DataFrame(out)

    return queued.mapInPandas(run, RESPONSE_SCHEMA)


CIRCUIT_OPEN_MIN_FAILS = 5
CIRCUIT_OPEN_FAIL_PERMILLE = 500
CIRCUIT_COOLDOWN_S = 600


def circuit_breaker_state(
    outcomes: DataFrame,
    now_ts: int,
    host_col: str = "host",
    ok_col: str = "ok",
    ts_col: str = "fetch_ts",
    window_s: int = 3600,
) -> DataFrame:
    """Per-host circuit breaker from recent fetch outcomes — the fetch
    layer's protection against hammering a failing origin (and wasting
    wave slots on it): within the trailing ``window_s``,

    - ``open``      — >= 5 failures AND failure share >= 50%, and the
                      LAST failure is younger than the cooldown: send
                      nothing;
    - ``half_open`` — tripped, but the cooldown has passed since the
                      last failure: send one probe fetch;
    - ``closed``    — everything else: normal scheduling.

    ONE map-side-combined aggregate over the outcome log (conditional
    sums + max-ts); integer arithmetic, SQL-replayable.  Returns (host,
    n_recent, n_fail, fail_permille, last_fail_age_s, state).
    """
    recent = outcomes.filter(
        F.col(ts_col) >= F.lit(int(now_ts) - int(window_s))
    )
    agg = recent.groupBy(host_col).agg(
        F.count("*").alias("n_recent"),
        F.sum(F.when(~F.col(ok_col), 1).otherwise(0)).alias("n_fail"),
        F.max(F.when(~F.col(ok_col), F.col(ts_col))).alias("__last_fail"),
    )
    fail_pm = F.expr("(1000 * n_fail) div n_recent")
    last_age = (F.lit(int(now_ts)) - F.col("__last_fail")).cast("long")
    tripped = (
        (F.col("n_fail") >= CIRCUIT_OPEN_MIN_FAILS)
        & (fail_pm >= CIRCUIT_OPEN_FAIL_PERMILLE)
    )
    state = (
        F.when(tripped & (last_age < CIRCUIT_COOLDOWN_S), F.lit("open"))
        .when(tripped, F.lit("half_open"))
        .otherwise(F.lit("closed"))
    )
    return agg.select(
        host_col,
        F.col("n_recent").cast("long").alias("n_recent"),
        F.col("n_fail").cast("long").alias("n_fail"),
        fail_pm.cast("long").alias("fail_permille"),
        last_age.alias("last_fail_age_s"),
        state.alias("state"),
    )


def range_fetch_plan(
    objects: DataFrame,
    chunk_bytes: int,
    url_col: str = "url",
    size_col: str = "est_bytes",
    max_parts: int = 64,
) -> DataFrame:
    """Byte-range download plan for large objects (HTTP Range requests,
    RFC 9110 §14): split each object into ``chunk_bytes`` parts so a
    multi-GB video/image archive downloads as parallel resumable parts
    — a failed part retries alone instead of restarting the object.
    Objects at or under one chunk get a single full-object part with a
    null range (plain GET — no Range header beats an open-ended one).

    Pure HOF fan-out (sequence -> transform -> posexplode), bounded at
    ``max_parts`` parts per object (bigger objects get proportionally
    bigger tail parts rather than unbounded fan-out).  Returns
    (url, part, range_start, range_end, part_bytes); range_end is
    inclusive per the Range header convention.
    """
    size = F.col(size_col).cast("long")
    cb = int(chunk_bytes)
    n_parts = F.least(
        F.lit(int(max_parts)).cast("long"),
        F.expr(f"({size_col} + {cb - 1}) div {cb}"),
    )
    part_size = F.expr(f"({size_col} + __np - 1) div __np").cast("long")
    plan = objects.withColumn("__np", F.greatest(n_parts, F.lit(1))) \
        .withColumn("__ps", part_size)
    parts = F.transform(
        F.sequence(F.lit(0), F.col("__np").cast("int") - 1),
        lambda i: F.struct(
            (i.cast("long") * F.col("__ps")).alias("range_start"),
            F.least(size - 1,
                    (i.cast("long") + 1) * F.col("__ps") - 1)
            .alias("range_end"),
        ),
    )
    out = plan.select(
        url_col, size.alias("__size"), F.col("__np"),
        F.posexplode(parts).alias("part", "r"),
    )
    single = F.col("__np") == 1
    return out.select(
        url_col,
        F.col("part").cast("int").alias("part"),
        F.when(~single, F.col("r.range_start")).alias("range_start"),
        F.when(~single, F.col("r.range_end")).alias("range_end"),
        (F.when(single, F.col("__size"))
         .otherwise(F.col("r.range_end") - F.col("r.range_start") + 1))
        .cast("long").alias("part_bytes"),
    )


def rendezvous_assign(
    urls: DataFrame,
    fetchers: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing of URLs onto fetcher
    nodes: each URL goes to argmax_f hash(url, f).  Unlike mod-N
    hashing, adding or removing ONE fetcher remaps only ~1/N of the
    URLs (the rows whose winner was the departed node) — connection
    pools, DNS caches and per-host politeness state on the surviving
    fetchers stay warm through fleet resizes.

    The fetcher list is a literal array (fleet-sized, tiny); the argmax
    is an aggregate HOF over it — narrow map, SQL-replayable via the
    md5-prefix hash.  Returns input + (fetcher, weight).
    """
    from .textops.dedup import base_hash

    def weight(f: str) -> F.Column:
        return base_hash(F.concat(F.col(url_col), F.lit("#"), F.lit(f)))

    pairs = F.array(*[
        F.struct(weight(f).alias("w"), F.lit(f).alias("f"))
        for f in fetchers
    ])
    best = F.array_max(pairs)
    return urls.select(
        "*", best["f"].alias("fetcher"), best["w"].alias("weight")
    )


def transfer_accounting(
    responses: DataFrame,
    host_col: str = "host",
    content_length_col: str = "content_length",
    body_bytes_col: str = "body_bytes",
) -> DataFrame:
    """Per-host transfer integrity accounting — a connection dropped
    mid-body yields FEWER bytes than the declared ``Content-Length``
    (truncated: for an image payload that is a corrupt file that must
    be quarantined before it reaches training, reference behavior is a
    transport error in Guzzle, src/Loader/Http/HttpLoader.php), a
    misbehaving server yields MORE (over-read), and chunked/streamed
    responses declare nothing.  At 100 TB the per-host truncation rate
    is a live health signal (a CDN edge going bad shows up here first)
    and the declared-vs-actual byte delta is the bandwidth-accounting
    input for :func:`crawlspark.politeness.bandwidth_throttle_schedule`.

    One map-side-combined groupBy over the response log — conditional
    sums in whole-stage codegen, integer-exact, result O(hosts).
    """
    cl = F.col(content_length_col).cast("long")
    got = F.col(body_bytes_col).cast("long")
    return responses.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_responses"),
        F.sum(F.when(cl.isNotNull() & (got < cl), 1).otherwise(0))
        .alias("n_truncated"),
        F.sum(F.when(cl.isNotNull() & (got > cl), 1).otherwise(0))
        .alias("n_overread"),
        F.sum(F.when(cl.isNull(), 1).otherwise(0)).alias("n_undeclared"),
        F.sum(F.coalesce(cl, F.lit(0))).alias("declared_bytes"),
        F.sum(got).alias("actual_bytes"),
    )


def resume_ranges(
    parts: DataFrame,
    url_col: str = "url",
    start_col: str = "start",
    end_col: str = "end",
    size_col: str = "total_size",
) -> DataFrame:
    """Resume planning for partial (Range) downloads of large media: merge
    the byte intervals [start, end) already on disk per URL — overlaps
    and duplicates collapse — and emit what a resuming fetcher needs:
    union coverage, gap count, and the offset for the next
    ``Range: bytes=N-`` header.  The inverse of ``range_fetch_plan``
    (which splits a download into parts up front); this reconstructs
    state after crashes and mixed-success part fetches.

    Classic interval-union dataflow: one window per URL ordered by
    (start, end) carrying the running max of previous ends — a gap
    exists where start > that prefix max, and the covered increment is
    greatest(0, end - greatest(start, prefix_max_end)).  Partitioned by
    URL (attempts per URL are few and bounded — no skew), all JVM
    expressions.

    Returns (url, total_size, bytes_have, n_gaps, next_missing_start,
    complete) — next_missing_start NULL when complete=1; complete is a
    0/1 int.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(url_col)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    pme = F.coalesce(F.max(e).over(w), F.lit(0)).cast("long")
    rows = parts.select(
        F.col(url_col).alias("url"),
        F.col(size_col).cast("long").alias("total_size"),
        s.alias("s"), e.alias("e"), pme.alias("pme"),
    ).select(
        "url", "total_size", "s", "e", "pme",
        F.greatest(F.lit(0), F.col("e") - F.greatest(F.col("s"), F.col("pme")))
        .alias("inc"),
        (F.col("s") > F.col("pme")).cast("int").alias("is_gap"),
        F.when(F.col("s") > F.col("pme"), F.col("pme")).alias("gap_at"),
    )
    agg = rows.groupBy("url", "total_size").agg(
        F.sum("inc").cast("long").alias("bytes_have"),
        F.sum("is_gap").cast("long").alias("n_gaps"),
        F.min("gap_at").cast("long").alias("first_gap"),
        F.max("e").cast("long").alias("max_end"),
    )
    # complete = the prefix [0, total_size) is covered: no gap anywhere
    # (leading gaps count — pme starts at 0) and the union reaches the
    # declared size.  NOT bytes_have == total_size: a server that
    # ignored the Range header can overshoot the declared size, and
    # that download is still complete (bytes_have records the overshoot)
    complete = (F.col("n_gaps") == 0) & (
        F.col("max_end") >= F.col("total_size")
    )
    next_start = F.when(
        complete, F.lit(None).cast("long")
    ).otherwise(
        F.coalesce(
            F.col("first_gap"),
            F.when(F.col("max_end") < F.col("total_size"), F.col("max_end")),
        )
    )
    return agg.select(
        "url", "total_size", "bytes_have", "n_gaps",
        next_start.alias("next_missing_start"),
        complete.cast("int").alias("complete"),
    )


def accept_negotiation(
    requests: DataFrame,
    available: list[str],
    accept_col: str = "accept",
) -> DataFrame:
    """Proactive content negotiation (RFC 9110 §12): given each
    request's ``Accept`` header and the server's ``available`` variant
    list (in server preference order), pick the variant the crawler
    should expect back — the offline replay that explains why the same
    image URL returns AVIF to one crawler and JPEG to another (and
    therefore which bytes a cache key must anticipate, cf. the Vary
    identity op).

    Effective quality of a variant = q of the MOST SPECIFIC matching
    clause (exact type > type/* > */*), q parsed in integer millis
    (default 1000); winner = highest q, ties broken by server
    preference order; q=0 excludes.  Pure JVM: one split + transform
    over the header per row, a small literal variant array — no
    shuffle at all, fuses into the scan.

    Adds (chosen_type, chosen_q_millis); NULL chosen_type when nothing
    acceptable.
    """
    acc = F.coalesce(F.col(accept_col), F.lit("*/*"))
    # RFC 9110 8.3.1: media types and parameter names are case-insensitive
    # ('Image/Webp' and ';Q=0.5' are valid) — normalize before matching
    clauses = F.transform(
        F.split(acc, ","),
        lambda c: F.struct(
            F.lower(F.trim(F.regexp_extract(c, r"^\s*([^;]+)", 1))).alias("mt"),
            F.coalesce(
                F.when(
                    F.regexp_extract(c, r"(?i);\s*q=([0-9.]+)", 1) != "",
                    # round, don't truncate: 0.7 * 1000 is 699.999... in
                    # binary doubles and must become 700, not 699
                    F.round(
                        F.regexp_extract(c, r"(?i);\s*q=([0-9.]+)", 1)
                        .cast("double") * 1000
                    ).cast("long"),
                ),
                F.lit(1000),
            ).alias("q"),
        ),
    )

    def best_for(i: int, mt: str):
        mt = mt.lower()
        t, sub = mt.split("/", 1)
        exact = F.filter(clauses, lambda c: c["mt"] == mt)
        range_ = F.filter(clauses, lambda c: c["mt"] == f"{t}/*")
        star = F.filter(clauses, lambda c: c["mt"] == "*/*")
        # F.get is 0-based and NULL on out-of-bounds (ANSI-safe on the
        # empty arrays a non-matching clause family produces)
        q = F.coalesce(
            F.get(exact, 0)["q"],
            F.get(range_, 0)["q"],
            F.get(star, 0)["q"],
        )
        return F.struct(
            F.coalesce(q, F.lit(-1)).alias("q"),
            F.lit(-i).alias("pref"),       # earlier in server order wins ties
            F.lit(mt).alias("mt"),
        )

    cand = F.array(*[best_for(i, mt) for i, mt in enumerate(available)])
    best = F.array_max(F.filter(cand, lambda c: c["q"] > 0))
    return (
        requests.withColumn("__b", best)
        .withColumn("chosen_type", F.col("__b.mt"))
        .withColumn(
            "chosen_q_millis",
            F.when(F.col("__b").isNotNull(), F.col("__b.q")).cast("long"),
        )
        .drop("__b")
    )


def hedged_fetch_plan(
    samples: DataFrame,
    host_col: str = "host",
    id_col: str = "req_id",
    latency_col: str = "latency_ms",
    hedge_pct: int = 95,
) -> DataFrame:
    """Tail-latency hedging read-out per host ("The Tail at Scale":
    issue a second request once the first has been outstanding longer
    than the p-th percentile, take whichever answers first).  The
    reference's retry layer only reacts to FAILURES
    (src/Loader/Http/Politeness/RetryErrorResponseHandler.php); hedging
    is the scale policy for the slow-but-successful tail a 1000-executor
    fetch wave stalls on.

    Per host, from observed latency samples: the hedge delay as the
    EXACT p-th percentile order statistic (rank ceil(p*n/100), no
    interpolation — replayable integer), and an empirical replay that
    pairs each request deterministically with the next request on the
    same host (by id order, wrapping): hedged completion
    ``min(x_i, delay + x_next)``.  Read-outs: how many requests would
    hedge (latency > delay), total duplicate-work rate, and the
    permille cut of summed latency — the data that says whether hedging
    pays for a host before any scheduler turns it on.

    Plan: per-host windows (rank + lead) partitioned on host — never a
    global window; one groupBy for the read-out.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(latency_col, id_col)
    wi = Window.partitionBy("host").orderBy("rid")
    n = F.count("*").over(Window.partitionBy(host_col))
    ranked = samples.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("rid"),
        F.col(latency_col).cast("long").alias("lat"),
        F.row_number().over(w).cast("long").alias("__r"),
        n.cast("long").alias("__n"),
    )
    delay = ranked.filter(
        F.col("__r") == F.ceil(F.lit(hedge_pct) * F.col("__n") / 100)
    ).select("host", F.col("lat").alias("hedge_delay_ms"))
    partner = F.coalesce(
        F.lead("lat", 1).over(wi),
        F.first("lat").over(
            wi.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)),
    )
    paired = (
        ranked.withColumn("__partner", partner)
        .join(F.broadcast(delay), "host")
        .withColumn(
            "__hedged",
            F.least(F.col("lat"),
                    F.col("hedge_delay_ms") + F.col("__partner")))
    )
    out = paired.groupBy("host").agg(
        F.count("*").cast("long").alias("n_requests"),
        F.first("hedge_delay_ms").alias("hedge_delay_ms"),
        F.sum("lat").cast("long").alias("sum_latency_ms"),
        F.sum("__hedged").cast("long").alias("sum_hedged_ms"),
        F.sum(F.when(F.col("lat") > F.col("hedge_delay_ms"), 1)
              .otherwise(0)).cast("long").alias("n_hedged"),
    )
    return out.select(
        "host", "n_requests", "hedge_delay_ms", "sum_latency_ms",
        "sum_hedged_ms", "n_hedged",
        ((1000 * F.col("n_hedged")) / F.col("n_requests")).cast("long")
        .alias("hedge_rate_permille"),
        ((1000 * (F.col("sum_latency_ms") - F.col("sum_hedged_ms")))
         / F.col("sum_latency_ms")).cast("long")
        .alias("latency_cut_permille"),
    )


def consistent_ring_assign(
    hosts: DataFrame,
    fetchers: list[str],
    host_col: str = "host",
    vnodes: int = 16,
    load_cap_permille: int = 1250,
) -> DataFrame:
    """Consistent-hash ring assignment of hosts onto the fetcher fleet,
    with virtual nodes and a bounded-load read-out — the OTHER classic
    fleet-assignment scheme next to :func:`rendezvous_assign`: rendezvous
    recomputes argmax over ALL fetchers per key (O(F) per key, perfect
    balance), the ring does one successor lookup against F*vnodes points
    (O(log) per key in a real router) and its reassignment set under
    fetcher loss is PROVABLY only the lost fetcher's keys — the property
    that matters when the fleet autoscales mid-wave (asserted in tests).

    Each fetcher contributes ``vnodes`` ring points (hash of
    ``fetcher#replica``); a host goes to the first point clockwise from
    its own hash (wrapping).  ``load_cap = ceil(cap_permille/1000 *
    n_hosts/|fetchers|)`` is Karger-style bounded load: hosts ranked
    within their fetcher by ring distance; rank beyond the cap =>
    ``would_spill`` (the keys a bounded-load router would push to the
    next ring point) — the skew read-out that says whether vnodes are
    too few before the wave launches.

    Plan: ring table is F*vnodes literal rows broadcast against the host
    table (narrow min-struct aggregation per host, no shuffle of hosts
    beyond the final per-fetcher rank window partitioned by fetcher).
    """
    from .textops.dedup import base_hash

    spark = hosts.sparkSession
    ring = spark.createDataFrame(
        [(f, r) for f in fetchers for r in range(int(vnodes))],
        "fetcher string, replica int",
    ).select(
        "fetcher",
        base_hash(F.concat(F.col("fetcher"), F.lit("#"),
                           F.col("replica").cast("string"))).alias("pos"),
    )
    key = base_hash(F.col(host_col))
    ring_span = 1 << 32  # base_hash range: first 8 md5 hex digits
    joined = (
        hosts.select(F.col(host_col).alias("host"), key.alias("__k"))
        .join(F.broadcast(ring))
        .withColumn(
            "__delta",
            F.pmod(F.col("pos") - F.col("__k"), F.lit(ring_span)))
    )
    best = joined.groupBy("host", "__k").agg(
        F.min(F.struct("__delta", "pos", "fetcher")).alias("__b")
    ).select(
        "host",
        F.col("__b.fetcher").alias("fetcher"),
        F.col("__b.__delta").alias("ring_delta"),
    )
    from pyspark.sql import Window

    n_total = best.count()
    cap = -(-int(load_cap_permille) * n_total // (1000 * len(fetchers)))
    wr = Window.partitionBy("fetcher").orderBy("ring_delta", "host")
    return best.select(
        "host", "fetcher", "ring_delta",
        F.row_number().over(wr).cast("long").alias("rank_in_fetcher"),
        (F.row_number().over(wr) > cap).alias("would_spill"),
    )


def parse_link_headers(
    responses: DataFrame,
    link_col: str = "link_header",
) -> DataFrame:
    """RFC 8288 ``Link`` header parse — one row per link-value with its
    target and the ``rel`` / ``as`` parameters.  The crawl uses two of
    them: ``rel=preload; as=image`` (including 103 Early Hints replays
    stored alongside the final response) announces the page's critical
    images BEFORE HTML parsing — a fetch scheduler that seeds
    image-payload candidates from these beats one that waits for the
    DOM; and ``rel="next"`` is the header-side pagination signal
    (the reference reads only the HTML rel=next,
    src/Steps/Loading/Http/Paginators/SimpleWebsitePaginator.php).

    Pure JVM: split the header on commas FOLLOWED by a ``<`` target
    (commas are legal inside quoted params, but a new link-value always
    starts ``<url>``), then per entry regexp-extract the target and the
    (possibly quoted) rel/as params.  Lineage columns pass through; adds
    (link_url, link_rel lowercased, link_as lowercased, ord).
    """
    entries = F.split(F.col(link_col), r",(?=\s*<)")
    parsed = F.transform(
        entries,
        lambda e, i: F.struct(
            F.regexp_extract(e, r"<\s*([^>]*?)\s*>", 1).alias("u"),
            F.lower(F.regexp_extract(
                e, "(?i)[;\\s]rel\\s*=\\s*\"?([A-Za-z0-9_ -]+)\"?", 1)
            ).alias("rel"),
            F.lower(F.regexp_extract(
                e, "(?i)[;\\s]as\\s*=\\s*\"?([A-Za-z0-9_-]+)\"?", 1)
            ).alias("as_"),
            i.cast("long").alias("ord"),
        ),
    )
    keep = [c for c in responses.columns if c != link_col]
    return (
        responses.select(*keep, F.explode(parsed).alias("__l"))
        .filter(F.col("__l.u") != "")
        .select(
            *keep,
            F.col("__l.u").alias("link_url"),
            F.nullif(F.col("__l.rel"), F.lit("")).alias("link_rel"),
            F.nullif(F.col("__l.as_"), F.lit("")).alias("link_as"),
            F.col("__l.ord").alias("ord"),
        )
    )


RETRY_BUDGET_MIN = 2
RETRY_BUDGET_PERMILLE = 100


def retry_budget(
    outcomes: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    ok_col: str = "ok",
    window_s: int = 60,
    min_retries: int = RETRY_BUDGET_MIN,
    ratio_permille: int = RETRY_BUDGET_PERMILLE,
) -> DataFrame:
    """Finagle-style per-host retry budgets — the complement of
    :func:`circuit_breaker_state`: the breaker decides whether to talk
    to a host AT ALL, the budget bounds how much retry AMPLIFICATION a
    degraded host may induce (a retry storm against a struggling server
    is self-inflicted DoS; Finagle's RetryBudget caps retries at a
    fixed percentage of recent successful traffic plus a small floor).

    Deterministic batch model over a fetch log: per (host, window
    bucket of ``window_s``), requested retries = failures in the
    bucket, budget = min_retries + floor(successes *
    ratio_permille/1000), granted = least(requested, budget).  One
    map-side-combined groupBy — no windows, no state; the streaming
    twin carries the same two counters per host in
    applyInPandasWithState.

    Returns (host, bucket, n_ok, n_fail, budget, granted, deferred).
    """
    b = (F.col(ts_col).cast("long") / int(window_s)).cast("long")
    agg = (
        outcomes.groupBy(
            F.col(host_col).alias("host"), b.alias("bucket"))
        .agg(
            F.sum(F.when(F.col(ok_col), 1).otherwise(0)).cast("long")
            .alias("n_ok"),
            F.sum(F.when(F.col(ok_col), 0).otherwise(1)).cast("long")
            .alias("n_fail"),
        )
    )
    budget = (
        F.lit(int(min_retries))
        + (F.col("n_ok") * int(ratio_permille)) / F.lit(1000)
    ).cast("long")
    return (
        agg.withColumn("budget", budget)
        .withColumn("granted", F.least(F.col("n_fail"), F.col("budget")))
        .withColumn("deferred", (F.col("n_fail") - F.col("granted"))
                    .cast("long"))
    )


def h2_connection_coalescing(
    hosts: DataFrame,
    certs: DataFrame,
    host_col: str = "host",
    ip_col: str = "ip",
) -> DataFrame:
    """HTTP/2 connection-coalescing plan (RFC 9113 §9.1.1): two
    hostnames may share one TLS connection when they resolve to the
    same IP AND the connection's certificate covers both — for a
    crawler that means one handshake and one congestion window for a
    whole CDN tenant block, a direct politeness/throughput lever the
    reference's per-host curl pool cannot see.

    ``certs`` is the per-IP serving certificate: (ip, san) one row per
    subject-alt-name, ``*.example.com`` wildcards covering exactly one
    extra label (RFC 6125 §6.4.3 — no partial-label or multi-label
    match).  A host matches via an exact SAN or its parent wildcard;
    matched hosts coalesce under conn_key = the ip, unmatched hosts
    get their own key (host-keyed connection).  The cert relation is
    per-IP (small): broadcast equi-join on the candidate SAN forms —
    never a wildcard theta-join.  Returns (host, ip, coalesced,
    conn_key).
    """
    h = hosts.select(F.col(host_col).alias("host"),
                     F.col(ip_col).alias("ip"))
    # candidate SAN forms: the host itself and *.parent
    parent = F.regexp_replace(F.col("host"), r"^[^.]+", "*")
    cand = h.select(
        "host", "ip",
        F.explode(F.array(F.col("host"), parent)).alias("san"),
    ).filter(F.col("san") != "*")
    c = certs.select(F.col("ip").alias("ip"), F.col("san").alias("san"))
    hit = (
        cand.join(F.broadcast(c), ["ip", "san"])
        .select("host", "ip").distinct()
        .withColumn("__hit", F.lit(True))
    )
    out = h.join(hit, ["host", "ip"], "left")
    coalesced = F.coalesce(F.col("__hit"), F.lit(False))
    return out.select(
        "host", "ip",
        coalesced.alias("coalesced"),
        F.when(coalesced, F.col("ip"))
        .otherwise(F.concat(F.lit("solo:"), F.col("host")))
        .alias("conn_key"),
    )


def slo_burn_alerts(
    windows: DataFrame,
    host_col: str = "host",
    window_col: str = "window",
    ok_col: str = "n_ok",
    err_col: str = "n_err",
    slo_permille: int = 995,
    fast_burn_milli: int = 14_400,
    slow_burn_milli: int = 6_000,
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE workbook
    policy) applied to the fetch fleet: with an availability SLO of
    ``slo_permille``, the error BUDGET is 1-SLO, and burn_rate =
    observed_error_rate / budget.  The fast window (5m) pages at
    14.4x (budget gone in 2 days), the slow window (1h) tickets at
    6x.  Per (host, window) the burn is integer-exact up to the final
    divide.

    ``window`` in {'fast','slow'}.  Returns (host, window, n_total,
    burn_milli, alert) — NULL burn for empty windows.
    """
    n = (F.col(ok_col).cast("long") + F.col(err_col).cast("long"))
    budget_permille = 1000 - int(slo_permille)
    burn = (
        (F.col(err_col).cast("double") * 1000.0)
        / (n.cast("double") * budget_permille)
    )
    burn_milli = F.when(n > 0, F.round(1e3 * burn, 0).cast("long"))
    thresh = (
        F.when(F.col(window_col) == "fast", F.lit(int(fast_burn_milli)))
        .otherwise(F.lit(int(slow_burn_milli)))
    )
    return windows.select(
        F.col(host_col).alias("host"),
        F.col(window_col).alias("window"),
        n.alias("n_total"),
        burn_milli.alias("burn_milli"),
        F.coalesce(burn_milli >= thresh, F.lit(False)).alias("alert"),
    )


def chunked_framing_check(
    docs: DataFrame,
    bytes_col: str = "bytes",
) -> DataFrame:
    """Chunked transfer-encoding framing validation (RFC 9112 §7.1):
    walk the hex-size chunk frames and verify the stream ends with
    the 0-size terminator — a connection cut mid-transfer leaves a
    chunked body whose truncation Content-Length can't reveal
    (there is none), so THIS walk is the only integrity check such a
    payload gets before the archive write.

    Arrow-batched pandas UDF (sequential frame walk).  Adds
    (chunked_n_chunks, chunked_payload_bytes, chunked_complete,
    chunked_malformed): malformed = a size line that isn't hex;
    complete = saw the 0 chunk with final CRLF.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n long, pb long, comp int, mal int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        out = {"n": [], "pb": [], "comp": [], "mal": []}
        for b in bs:
            if b is None:
                for k in out:
                    out[k].append(None)
                continue
            data = bytes(b)
            i, n, pb, comp, mal = 0, 0, 0, 0, 0
            while True:
                j = data.find(b"\r\n", i)
                if j < 0:
                    break
                line = data[i:j].split(b";")[0].strip()
                try:
                    size = int(line, 16)
                except ValueError:
                    mal = 1
                    break
                if size == 0:
                    comp = 1 if data[j + 2:j + 4] == b"\r\n" else 0
                    break
                start = j + 2
                end = start + size
                if end + 2 > len(data):
                    break
                n += 1
                pb += size
                if data[end:end + 2] != b"\r\n":
                    mal = 1
                    break
                i = end + 2
            out["n"].append(n)
            out["pb"].append(pb)
            out["comp"].append(comp)
            out["mal"].append(mal)
        return pd.DataFrame({
            "n": pd.array(out["n"], dtype="Int64"),
            "pb": pd.array(out["pb"], dtype="Int64"),
            "comp": pd.array(out["comp"], dtype="Int32"),
            "mal": pd.array(out["mal"], dtype="Int32"),
        })

    g = docs.withColumn("__c", scan(F.col(bytes_col)))
    return (
        g.withColumn("chunked_n_chunks", F.col("__c.n"))
        .withColumn("chunked_payload_bytes", F.col("__c.pb"))
        .withColumn("chunked_complete", F.col("__c.comp"))
        .withColumn("chunked_malformed", F.col("__c.mal"))
        .drop("__c")
    )


def encoding_mismatch_audit(
    responses: DataFrame,
    encoding_col: str = "content_encoding",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Declared Content-Encoding vs payload magic — CDNs misconfigure
    this constantly (double-gzip, 'gzip' headers on identity bodies),
    and a pipeline that trusts the header feeds garbage to the
    decompressor.  gzip (1F 8B) and zstd (28 B5 2F FD) have magic;
    brotli deliberately has NONE, so a 'br' declaration is honestly
    'unverifiable' rather than guessed.

    Pure JVM prefix tests.  Adds (sniffed_encoding, encoding_verdict
    in {'match','mismatch','unverifiable'}).
    """
    enc = F.lower(F.coalesce(F.col(encoding_col), F.lit("identity")))
    head = F.hex(F.substring(F.col(bytes_col), 1, 4))
    sniffed = (
        F.when(head.startswith("1F8B"), F.lit("gzip"))
        .when(head.startswith("28B52FFD"), F.lit("zstd"))
        .otherwise(F.lit("identity"))
    )
    verdict = (
        F.when(enc == "br", F.lit("unverifiable"))
        .when(enc == sniffed, F.lit("match"))
        .when((enc == "identity") & (sniffed != "identity"),
              F.lit("mismatch"))
        .when((enc != "identity") & (sniffed != enc),
              F.lit("mismatch"))
        .otherwise(F.lit("match"))
    )
    return (
        responses.withColumn("sniffed_encoding", sniffed)
        .withColumn("encoding_verdict", verdict)
    )


def retry_after_parse(
    responses: DataFrame,
    header_col: str = "retry_after",
    now_ts: int = 0,
) -> DataFrame:
    """Retry-After header parsing, BOTH RFC 9110 forms: delta-seconds
    (``120``) and HTTP-date (``Wed, 21 Oct 2026 07:28:00 GMT``) — the
    date form is what big CDNs actually send, and a parser that only
    reads integers silently retries immediately.  Dates resolve
    against ``now_ts`` (epoch seconds); past dates clamp to 0.

    JVM to_timestamp with the IMF-fixdate pattern.  Adds
    (retry_after_s, retry_after_form in {'seconds','date','invalid'});
    NULL header -> NULL/absent.
    """
    h = F.trim(F.col(header_col))
    is_secs = h.rlike(r"^\d+$")
    # Spark 3+ refuses 'EEE' in PARSE patterns; the weekday is
    # redundant in IMF-fixdate anyway — strip it and anchor on the
    # literal GMT (session timezone is UTC, crawlspark.session)
    stripped = F.regexp_replace(h, r"^[A-Za-z]{3},\s*", "")
    ts = F.try_to_timestamp(stripped,
                            F.lit("dd MMM yyyy HH:mm:ss 'GMT'"))
    date_s = F.greatest(
        F.unix_timestamp(ts) - F.lit(int(now_ts)),
        F.lit(0).cast("long"),
    )
    form = (
        F.when(h.isNull(), F.lit(None).cast("string"))
        .when(is_secs, F.lit("seconds"))
        .when(ts.isNotNull(), F.lit("date"))
        .otherwise(F.lit("invalid"))
    )
    secs = (
        F.when(is_secs, h.cast("long"))
        .when(ts.isNotNull(), date_s)
    )
    return (
        responses.withColumn("retry_after_s", secs)
        .withColumn("retry_after_form", form)
    )


def content_disposition_info(value: Column) -> Column:
    """Parse a ``Content-Disposition`` response header (RFC 6266):
    struct(disp_type, filename, from_ext_value).  ``filename*``
    (RFC 5987 ext-value, ``UTF-8''percent%20encoded``) takes precedence
    over plain ``filename=`` per the RFC; the percent-decode rides
    Spark's builtin url_decode.  A crawler uses this for download
    routing (save-as names, attachment vs inline rendering) and for
    payload-type sanity (an 'attachment' HTML page is a phishing tell).

    Pure JVM regexp + url_decode — narrow map over the header scan.
    """
    v = F.coalesce(value, F.lit(""))
    disp_type = F.lower(F.nullif(
        F.regexp_extract(v, r"^\s*([A-Za-z0-9-]+)", 1), F.lit("")))
    ext = F.regexp_extract(
        v, r"(?i)filename\*\s*=\s*[A-Za-z0-9-]+'[A-Za-z-]*'([^;\s]+)", 1)
    plain_q = F.regexp_extract(v, r'(?i)filename\s*=\s*"([^"]*)"', 1)
    plain_t = F.regexp_extract(
        v, r"(?i)filename\s*=\s*([^\";][^;\s]*)", 1)
    # url_decode THROWS on malformed percent-escapes; one adversarial
    # header must not abort a 10^10-row scan — validate the escape
    # grammar first and fall back to the raw ext-value otherwise
    ext_valid = ext.rlike(r"^(?:%[0-9A-Fa-f]{2}|[^%])*$")
    filename = (
        F.when((ext != "") & ext_valid, F.url_decode(ext))
        .when(ext != "", ext)
        .when(plain_q != "", plain_q)
        .when(plain_t != "", plain_t)
    )
    return F.struct(
        disp_type.alias("disp_type"),
        filename.alias("filename"),
        (ext != "").alias("from_ext_value"),
    )


CSP_FETCH_DIRECTIVES = ["default-src", "script-src"]


def csp_audit(value: Column) -> Column:
    """Content-Security-Policy audit: struct(n_directives,
    has_default_src, unsafe_inline, unsafe_eval, wildcard_script) —
    the flags that matter for rendering risk triage ('unsafe-inline' /
    'unsafe-eval' in the script path, a bare ``*`` source) and for
    page-kind signals (no CSP at all vs a locked-down one).  The
    script-effective policy is ``script-src`` falling back to
    ``default-src`` per the spec's fetch-directive fallback.

    Pure regexp over the header value; null/empty -> zero directives.
    """
    v = F.trim(F.coalesce(value, F.lit("")))
    dirs = F.filter(
        F.transform(F.split(v, ";"), lambda d: F.trim(d)),
        lambda d: d != "",
    )
    n = F.size(dirs).cast("int")
    script = F.regexp_extract(v, r"(?i)(?:^|;)\s*script-src\s+([^;]*)", 1)
    default = F.regexp_extract(v, r"(?i)(?:^|;)\s*default-src\s+([^;]*)", 1)
    eff = F.when(script != "", script).otherwise(default)
    has_default = default != ""
    unsafe_inline = F.lower(eff).contains("'unsafe-inline'")
    unsafe_eval = F.lower(eff).contains("'unsafe-eval'")
    wildcard = eff.rlike(r"(^|\s)\*(\s|$)")
    return F.struct(
        n.alias("n_directives"),
        has_default.alias("has_default_src"),
        F.coalesce(unsafe_inline, F.lit(False)).alias("unsafe_inline"),
        F.coalesce(unsafe_eval, F.lit(False)).alias("unsafe_eval"),
        F.coalesce(wildcard, F.lit(False)).alias("wildcard_script"),
    )


def ratelimit_headers_info(
    limit: Column, remaining: Column, reset: Column,
    now: Column | None = None,
) -> Column:
    """Server-declared rate-limit state (the RateLimit-*/X-RateLimit-*
    header family APIs actually send): struct(limit, remaining,
    reset_s, exhausted, suggested_delay_ms).  This is the
    budget signal that should OVERRIDE the crawler's own politeness
    interval when present: remaining/reset define the server's real
    admission rate, and the suggested pacing spreads the remaining
    budget evenly across the window (remaining=0 -> wait out the full
    reset).

    suggested_delay_ms = 1000 * reset / remaining (integer ceil via
    (a + b - 1) div b), or 1000 * reset when exhausted; nulls (absent
    headers) -> null struct fields, no delay suggestion.  Pure integer
    arithmetic, narrow map; feed the result into
    politeness.throttle_schedule's delay column.

    Two ``reset`` dialects exist in the wild: delta-seconds
    (RateLimit-Reset per the IETF draft) and absolute epoch seconds
    (the widely deployed X-RateLimit-Reset variant).  A raw value
    > 10^6 (~11.6 days — no sane window) is treated as epoch: it is
    converted to a delta against ``now`` (a column of epoch seconds,
    e.g. the fetch timestamp) when provided, clamped at 0; without
    ``now`` the reset/delay fields are nulled rather than emitting an
    absurd ~5*10^13 ms suggestion.
    """
    lim = limit.cast("long")
    rem = remaining.cast("long")
    rst_raw = reset.cast("long")
    is_epoch = rst_raw > F.lit(1_000_000)
    if now is not None:
        rst = F.when(
            is_epoch, F.greatest(rst_raw - now.cast("long"), F.lit(0))
        ).otherwise(rst_raw)
    else:
        rst = F.when(is_epoch, F.lit(None).cast("long")).otherwise(rst_raw)
    exhausted = F.coalesce(rem <= 0, F.lit(False))
    delay = (
        F.when(rem.isNull() | rst.isNull(), F.lit(None).cast("long"))
        .when(rem <= 0, rst * 1000)
        # integer ceil(reset_ms / remaining): positive double quotient
        # truncates to floor on the cast, +rem-1 turns it into ceil
        .otherwise(((rst * 1000 + rem - 1) / rem).cast("long"))
    )
    return F.struct(
        lim.alias("limit"),
        rem.alias("remaining"),
        rst.alias("reset_s"),
        exhausted.alias("exhausted"),
        delay.alias("suggested_delay_ms"),
    )


def parse_link_header(value: Column) -> Column:
    """RFC 8288 ``Link`` response-header parse: array<struct<url, rel>>
    — one entry per ``<url>; rel="x"`` member, one row per rel token
    (``rel="next prefetch"`` yields two entries).  The HTTP-layer
    sibling of HTML ``<link>`` discovery: API pagination (GitHub-style
    rel=next/last), rel=canonical at the header level (which by spec
    BEATS the HTML tag for non-HTML payloads like images/PDFs), and
    preload hints.

    Pure regexp + HOFs, narrow map.  Members without a rel param yield
    rel=NULL entries (kept: the URL reference may still matter).
    """
    v = F.coalesce(value, F.lit(""))
    members = F.regexp_extract_all(
        v, F.lit(r"<([^>]*)>((?:\s*;\s*[A-Za-z0-9*-]+=(?:\"[^\"]*\"|[^,;\s]+))*)"), 0
    )
    def entry(m):
        url = F.regexp_extract(m, r"^<([^>]*)>", 1)
        rels = F.regexp_extract(m, r'(?i);\s*rel\s*=\s*("([^"]*)"|[^,;\s]+)', 1)
        rels_clean = F.regexp_replace(rels, '"', "")
        rel_arr = F.when(
            rels_clean == "", F.array(F.lit(None).cast("string"))
        ).otherwise(F.filter(F.split(rels_clean, r"\s+"),
                             lambda x: x != ""))
        return F.transform(
            rel_arr,
            lambda r: F.struct(url.alias("url"), F.lower(r).alias("rel")),
        )
    return F.flatten(F.transform(members, entry))


def permissions_policy_audit(value: Column) -> Column:
    """Permissions-Policy response-header audit: struct(n_directives,
    camera_allowed, microphone_allowed, geolocation_allowed,
    interest_cohort_blocked) — the feature-gating companion of the CSP
    audit.  A feature is 'allowed' here when its allowlist is anything
    other than the empty ``()`` (self/origins/* all count as exposure);
    ``interest_cohort=()`` is the FLoC/Topics opt-out a privacy-posture
    report tracks.

    Pure regexp over the header; null/empty -> zero directives.
    """
    v = F.trim(F.coalesce(value, F.lit("")))
    dirs = F.filter(
        F.transform(F.split(v, ","), lambda d: F.trim(d)),
        lambda d: d != "",
    )
    allow = lambda name: F.coalesce(  # noqa: E731
        F.nullif(
            F.regexp_extract(v, r"(?i)\b" + name + r"=(\([^)]*\)|\*)", 1),
            F.lit(""),
        ).rlike(r"^\*$|\(.+\)"),
        F.lit(False),
    )
    blocked_ic = F.coalesce(
        F.regexp_extract(v, r"(?i)\binterest-cohort=(\(\s*\))", 1) != "",
        F.lit(False),
    )
    return F.struct(
        F.size(dirs).cast("int").alias("n_directives"),
        allow("camera").alias("camera_allowed"),
        allow("microphone").alias("microphone_allowed"),
        allow("geolocation").alias("geolocation_allowed"),
        blocked_ic.alias("interest_cohort_blocked"),
    )


def server_timing_metrics(value: Column) -> Column:
    """Server-Timing header harvest: array<struct<metric, dur_micros,
    descr>> — origins that emit it (CDNs, app servers) hand the crawler
    a free backend-latency breakdown; per-host aggregates of ``total``
    / ``db`` / ``cache`` metrics separate slow ORIGINS from slow
    NETWORKS far better than wall-clock fetch times, which feeds the
    adaptive-timeout and hedged-fetch policies.

    dur= values are decimal MILLISECONDS in the wild; stored as exact
    integer MICROseconds (milli-string split at the dot, no float
    parsing).  Metrics without dur keep a null duration.
    """
    v = F.coalesce(value, F.lit(""))
    entries = F.filter(
        F.transform(F.split(v, ","), lambda e: F.trim(e)),
        lambda e: e.rlike(r"^[A-Za-z0-9_-]+"),
    )

    def one(e):
        name = F.regexp_extract(e, r"^([A-Za-z0-9_-]+)", 1)
        dur = F.regexp_extract(e, r'(?i);\s*dur=("?)(\d+(?:\.\d+)?)\1', 2)
        whole = F.substring_index(dur, ".", 1)
        frac = F.when(
            F.instr(dur, ".") > 0,
            F.rpad(F.substring_index(dur, ".", -1), 3, "0").substr(1, 3),
        ).otherwise(F.lit("000"))
        dur_us = F.when(
            dur != "",
            whole.cast("long") * 1000 + frac.cast("long"),
        )
        descr = F.nullif(
            F.regexp_extract(e, r'(?i);\s*desc="([^"]*)"', 1), F.lit(""))
        return F.struct(
            name.alias("metric"),
            dur_us.alias("dur_micros"),
            descr.alias("descr"),
        )

    return F.transform(entries, one)
