"""Headless-browser loading — Spark-side plumbing with a stubbed engine.

Reference surface:
- `HttpLoader::useHeadlessBrowser()` routes fetches through a Chrome CDP
  session (src/Loader/Http/HttpLoader.php:232,305-311,413) via
  `HeadlessBrowserLoaderHelper::navigateToPageAndGetRespondedRequest`
  (src/Loader/Http/HeadlessBrowserLoaderHelper.php:96-154).
- `BrowserAction` — post-navigate hooks: wait for selector, click, scroll,
  type, evaluate JS, screenshot, ... (src/Steps/Loading/Http/Browser/
  BrowserAction.php:17-171).
- `Screenshot` — a saved screenshot path attached to the response
  (src/Loader/Http/Browser/Screenshot.php:5-10, RespondedRequest
  screenshots at src/Loader/Http/Messages/RespondedRequest.php:16-35).

There is no Chrome in this container, so the CDP transport raises
NotImplementedError; the DETERMINISTIC FAKE renders page body + screenshot
pixels from the URL fingerprint (same fake codec as images.py), which keeps
the distributed plumbing — politeness partitioning, Arrow batching, the
response schema with a binary screenshot column — real and testable.

Action lists are plain serializable descriptors (broadcast with the task,
like the reference's closures ride the step), NOT Python closures: at
1000-executor scale the plan must not capture driver state.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import politeness
from .images import _encode, _pixels

BROWSER_RESPONSE_SCHEMA = (
    "url STRING, host STRING, ord LONG, status INT, body BINARY, "
    "effective_url STRING, screenshot BINARY, screenshot_fmt STRING, "
    "actions_applied INT"
)

DEFAULT_TIMEOUT_MS = 30_000  # BrowserAction.php DEFAULT_TIMEOUT


@dataclass(frozen=True)
class BrowserAction:
    """One post-navigate hook (BrowserAction.php:17-171), serializable."""

    kind: str
    args: tuple = field(default_factory=tuple)

    # constructors mirroring the reference's static factory names
    @staticmethod
    def wait_until_document_contains_element(css: str,
                                             timeout_ms: int = DEFAULT_TIMEOUT_MS):
        return BrowserAction("waitUntilDocumentContainsElement", (css, timeout_ms))

    @staticmethod
    def click_element(css: str, timeout_ms: int = DEFAULT_TIMEOUT_MS):
        return BrowserAction("clickElement", (css, timeout_ms))

    @staticmethod
    def scroll_down(distance: int):
        return BrowserAction("scrollDown", (distance,))

    @staticmethod
    def type_text(text: str, delay_ms: int | None = None):
        return BrowserAction("typeText", (text, delay_ms))

    @staticmethod
    def evaluate(js: str):
        return BrowserAction("evaluate", (js,))

    @staticmethod
    def wait(seconds: float):
        return BrowserAction("wait", (seconds,))

    @staticmethod
    def screenshot(full_page: bool = False, fmt: str = "png"):
        return BrowserAction("screenshot", (full_page, fmt))


class CdpTransport:
    """Real Chrome-DevTools-Protocol transport — NOT available here.

    On a real deployment this holds one browser per executor (reference
    keeps one browser per loader, HeadlessBrowserLoaderHelper.php:156-181)
    and is constructed lazily inside the task, never on the driver."""

    def __init__(self, executable: str = "chromium", options: dict | None = None):
        self.executable = executable
        self.options = options or {}

    def __call__(self, url: str, actions: list[BrowserAction]):
        raise NotImplementedError(
            "no headless browser in this container; use FakeBrowserTransport"
        )


class FakeBrowserTransport:
    """Deterministic stand-in: body + screenshot derived from the URL.

    Screenshot pixels come from the same seeded generator as the image
    pipeline (images._pixels), so PSNR/phash validation applies to
    screenshots too."""

    W, H = 32, 24

    def __call__(self, url: str, actions: list[BrowserAction]):
        import zlib

        # crc32, not hash(): str hash is per-process salted — workers must
        # render identical pixels for the same URL
        seed = zlib.crc32(url.encode()) & 0x7FFFFFFF
        body = f"<html><body>rendered {url}</body></html>".encode()
        shot, fmt = None, None
        applied = 0
        for a in actions:
            applied += 1
            if a.kind == "screenshot":
                fmt = a.args[1] if len(a.args) > 1 else "png"
                shot = _encode(_pixels(seed, self.W, self.H), fmt)
        return 200, body, url, shot, fmt, applied


def browser_fetch_stage(
    frontier: DataFrame,
    actions: list[BrowserAction] | None = None,
    transport_factory=FakeBrowserTransport,
    cfg: politeness.PolitenessConfig | None = None,
    sleep=None,
) -> DataFrame:
    """Browser-rendered fetch over the politeness-partitioned frontier.

    Same shape as fetch.fetch_stage: politeness_partition already sorts
    each partition by (host_bucket, priority, crawl_ts), so rows arrive in
    walk order; the task sleeps the throttle wait between same-host pages
    (browser navigations honor the same per-host budget as plain fetches,
    Throttler.php:125-197).  The transport navigates a browser and applies
    the action list per page; screenshots come back as a binary column
    beside the body — ready for the image sink.  The transport is built
    ONCE per task (a browser is expensive)."""
    import time as _time

    actions = actions or []
    action_descriptors = [(a.kind, tuple(a.args)) for a in actions]
    cfg = cfg or politeness.PolitenessConfig()
    sleep = sleep or _time.sleep
    min_wait_s = cfg.min_wait_ms / 1000.0
    factor = cfg.wait_factor
    queued = politeness.politeness_partition(
        frontier.withColumn("priority", frontier["ord"]).withColumn(
            "crawl_ts", frontier["ord"].cast("timestamp")
        ),
        host_col="host", priority_col="priority", ts_col="crawl_ts", cfg=cfg,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()
        acts = [BrowserAction(k, tuple(a)) for k, a in action_descriptors]
        last_end: dict[str, float] = {}
        last_dur: dict[str, float] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for row in pdf.itertuples(index=False):
                host = row.host
                now = _time.monotonic()
                if host in last_end:
                    wait = max(min_wait_s, factor * last_dur.get(host, 0.0))
                    pace = getattr(row, "pace_factor", 1)
                    remaining = last_end[host] + wait * pace - now
                    if remaining > 0:
                        sleep(remaining)
                t0 = _time.monotonic()
                status, body, eff, shot, fmt, applied = transport(row.url, acts)
                t1 = _time.monotonic()
                last_end[host] = t1
                last_dur[host] = t1 - t0
                out.append((row.url, row.host, row.ord, status, body, eff,
                            shot, fmt, applied))
            yield pd.DataFrame(
                out,
                columns=["url", "host", "ord", "status", "body",
                         "effective_url", "screenshot", "screenshot_fmt",
                         "actions_applied"],
            )

    return queued.mapInPandas(run, BROWSER_RESPONSE_SCHEMA)


def render_budget_classifier(
    pages: DataFrame,
    body_col: str = "body",
) -> DataFrame:
    """Static-vs-JS triage for the headless budget — rendering costs
    ~100x a plain fetch, so the browser fleet (browser.py) should only
    see pages that NEED it: an empty SPA mount point (<div id="root">
    </div>) or a script-heavy shell with almost no server-rendered
    text.  The reference loads either way (Http vs headless loader is
    a config flag, src/Loader); at 10^10 URLs the flag must be a
    per-page decision.

    Signals (pure JVM regex): empty_mount — a root/app div with no
    content; n_script_srcs; text_permille — visible text length
    against raw markup length after tag strip.  needs_render =
    empty_mount OR (>= 3 external scripts AND text under 10%).
    Returns every page + (empty_mount, n_script_srcs, text_permille,
    needs_render).
    """
    b = F.col(body_col)
    empty_mount = b.rlike(
        r'(?is)<div[^>]*id\s*=\s*["\'](root|app)["\'][^>]*>\s*</div>')
    n_scripts = F.size(F.regexp_extract_all(
        b, F.lit(r"(?is)<script\b[^>]*\bsrc\s*="), 0)).cast("long")
    text = F.trim(F.regexp_replace(
        F.regexp_replace(b, r"(?is)<(script|style)\b.*?</\1\s*>", " "),
        r"(?s)<[^>]*>", " "))
    text_len = F.length(F.regexp_replace(text, r"\s+", " "))
    ratio = F.when(
        F.length(b) > 0,
        (F.lit(1000) * text_len / F.length(b)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    needs = empty_mount | ((n_scripts >= 3) & (ratio < 100))
    return (
        pages.withColumn("empty_mount", empty_mount)
        .withColumn("n_script_srcs", n_scripts)
        .withColumn("text_permille", ratio)
        .withColumn("needs_render", needs)
    )
