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

DEFAULT_TIMEOUT_MS = 15_000  # BrowserAction.php:15 DEFAULT_TIMEOUT
NAVIGATE_TIMEOUT_MS = 30_000  # HeadlessBrowserLoaderHelper.php $timeout


@dataclass
class ScreenshotConfig:
    """Mirror of ScreenshotConfig.php:12-88: file type validation, the
    lossy-quality defaulting rules, and the CDP capture params."""

    store_path: str = ""
    file_type: str = "png"
    quality: int | None = None
    full_page: bool = False

    @classmethod
    def make(cls, store_path: str) -> "ScreenshotConfig":
        return cls(store_path)

    def set_image_file_type(self, t: str) -> "ScreenshotConfig":
        # ScreenshotConfig.php:36-48: only jpeg/png/webp accepted; lossy
        # types default quality to 80, png clears it
        if t in ("jpeg", "png", "webp"):
            self.file_type = t
            if t in ("jpeg", "webp") and self.quality is None:
                self.quality = 80
            elif t == "png":
                self.quality = None
        return self

    def set_quality(self, q: int) -> "ScreenshotConfig":
        if self.file_type in ("jpeg", "webp") and 0 < q <= 100:
            self.quality = q
        return self

    def set_full_page(self) -> "ScreenshotConfig":
        self.full_page = True
        return self

    def full_path(self, url: str, microseconds: int) -> str:
        """ScreenshotConfig.php:29-33: md5(url)-microseconds.ext under
        store_path.  The timestamp is a parameter (no wall clock in plan
        construction — replayable)."""
        import hashlib

        name = f"{hashlib.md5(url.encode()).hexdigest()}-{microseconds}.{self.file_type}"
        sep = "" if self.store_path.endswith("/") else "/"
        return f"{self.store_path}{sep}{name}"

    def to_cdp_params(self) -> dict:
        """ScreenshotConfig.php:70-88 toChromePhpScreenshotConfig: format
        always; quality only for lossy; captureBeyondViewport for full
        page."""
        p: dict = {"format": self.file_type}
        if self.quality and self.file_type in ("jpeg", "webp"):
            p["quality"] = self.quality
        if self.full_page:
            p["captureBeyondViewport"] = True
        return p


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
    def click_inside_shadow_dom(shadow_host: str, click_sel: str,
                                timeout_ms: int = DEFAULT_TIMEOUT_MS):
        return BrowserAction(
            "clickInsideShadowDom", (shadow_host, click_sel, timeout_ms))

    @staticmethod
    def move_mouse_to_element(css: str, timeout_ms: int = DEFAULT_TIMEOUT_MS):
        return BrowserAction("moveMouseToElement", (css, timeout_ms))

    @staticmethod
    def move_mouse_to_position(x: int, y: int, steps: int | None = None):
        return BrowserAction("moveMouseToPosition", (x, y, steps))

    @staticmethod
    def scroll_down(distance: int):
        return BrowserAction("scrollDown", (distance,))

    @staticmethod
    def scroll_up(distance: int):
        return BrowserAction("scrollUp", (distance,))

    @staticmethod
    def type_text(text: str, delay_ms: int | None = None):
        return BrowserAction("typeText", (text, delay_ms))

    @staticmethod
    def evaluate(js: str):
        return BrowserAction("evaluate", (js,))

    @staticmethod
    def wait_for_reload(timeout_ms: int = DEFAULT_TIMEOUT_MS):
        return BrowserAction("waitForReload", (timeout_ms,))

    @staticmethod
    def wait(seconds: float):
        return BrowserAction("wait", (seconds,))

    @staticmethod
    def screenshot(full_page: bool = False, fmt: str = "png",
                   quality: int | None = None):
        return BrowserAction("screenshot", (full_page, fmt, quality))


def build_cdp_transcript(
    url: str,
    actions: list[BrowserAction] | None = None,
    user_agent: str | None = None,
    headers: dict | None = None,
    page_init_script: str | None = None,
    wait_event: str = "Page.loadEventFired",
    timeout_ms: int = NAVIGATE_TIMEOUT_MS,
) -> list[dict]:
    """The pinned CDP message surface: the exact ordered protocol
    operations a real Chrome transport must perform for one page load +
    action list.  Pure data (JSON-serializable), no sockets — contract
    tests freeze it so a real browser can drop in behind
    :class:`CdpTransport` without touching the politeness partitioning
    or the fetch-stage plumbing.

    Ops: ``send`` (a CDP command), ``await_event`` (block until the CDP
    event fires), ``poll`` (re-issue the command until the result is
    truthy), ``sleep``.  Sequence mirrors
    HeadlessBrowserLoaderHelper.php:96-154,283-289 (navigate + wait for
    the configured navigation event, then run post-navigate hooks, then
    read the DOM) and BrowserAction.php:17-171 per hook.
    """
    t: list[dict] = [
        {"op": "send", "method": "Page.enable", "params": {}},
        {"op": "send", "method": "Network.enable", "params": {}},
    ]
    if user_agent is not None:
        t.append({"op": "send", "method": "Network.setUserAgentOverride",
                  "params": {"userAgent": user_agent}})
    if headers:
        t.append({"op": "send", "method": "Network.setExtraHTTPHeaders",
                  "params": {"headers": dict(headers)}})
    if page_init_script is not None:
        # HeadlessBrowserLoaderHelper.php:355-357 setPagePreScript
        t.append({"op": "send",
                  "method": "Page.addScriptToEvaluateOnNewDocument",
                  "params": {"source": page_init_script}})
    t.append({"op": "send", "method": "Page.navigate", "params": {"url": url}})
    t.append({"op": "await_event", "event": wait_event,
              "timeout_ms": timeout_ms})

    def poll_selector(css: str, to_ms: int):
        return {"op": "poll", "method": "Runtime.evaluate",
                "params": {"expression":
                           f"!!document.querySelector({css!r})",
                           "returnByValue": True},
                "until": "truthy", "timeout_ms": to_ms}

    def mouse(kind: str, **params):
        return {"op": "send", "method": "Input.dispatchMouseEvent",
                "params": {"type": kind, **params}}

    for a in actions or []:
        k, ar = a.kind, a.args
        if k == "waitUntilDocumentContainsElement":
            t.append(poll_selector(ar[0], ar[1]))
        elif k == "clickElement":
            # Page.mouse()->find(css)->click(): locate center, press+release
            t.append(poll_selector(ar[0], ar[1]))
            t.append({"op": "send", "method": "Runtime.evaluate",
                      "params": {"expression":
                                 "JSON.stringify(document.querySelector("
                                 f"{ar[0]!r}).getBoundingClientRect())",
                                 "returnByValue": True}})
            t.append(mouse("mousePressed", button="left", clickCount=1))
            t.append(mouse("mouseReleased", button="left", clickCount=1))
        elif k == "clickInsideShadowDom":
            host, sel, to_ms = ar
            t.append({"op": "send", "method": "Runtime.evaluate",
                      "params": {"expression":
                                 _shadow_click_js(host, sel),
                                 "awaitPromise": True},
                      "timeout_ms": to_ms})
        elif k == "moveMouseToElement":
            t.append(poll_selector(ar[0], ar[1]))
            t.append({"op": "send", "method": "Runtime.evaluate",
                      "params": {"expression":
                                 "JSON.stringify(document.querySelector("
                                 f"{ar[0]!r}).getBoundingClientRect())",
                                 "returnByValue": True}})
            t.append(mouse("mouseMoved"))
        elif k == "moveMouseToPosition":
            x, y, steps = ar
            p = {"x": x, "y": y}
            if steps is not None:
                p["steps"] = steps
            t.append(mouse("mouseMoved", **p))
        elif k == "scrollDown":
            t.append(mouse("mouseWheel", deltaX=0, deltaY=int(ar[0])))
        elif k == "scrollUp":
            t.append(mouse("mouseWheel", deltaX=0, deltaY=-int(ar[0])))
        elif k == "typeText":
            e = {"op": "send", "method": "Input.insertText",
                 "params": {"text": ar[0]}}
            if len(ar) > 1 and ar[1] is not None:
                e["key_interval_ms"] = ar[1]
            t.append(e)
        elif k == "evaluate":
            t.append({"op": "send", "method": "Runtime.evaluate",
                      "params": {"expression": ar[0],
                                 "awaitPromise": True}})
        elif k == "waitForReload":
            t.append({"op": "await_event", "event": "Page.loadEventFired",
                      "timeout_ms": ar[0]})
        elif k == "wait":
            t.append({"op": "sleep", "ms": int(ar[0] * 1000)})
        elif k == "screenshot":
            cfg = ScreenshotConfig()
            cfg.set_image_file_type(ar[1] if len(ar) > 1 and ar[1] else "png")
            if len(ar) > 2 and ar[2] is not None:
                cfg.set_quality(ar[2])
            if ar[0]:
                cfg.set_full_page()
            t.append({"op": "send", "method": "Page.captureScreenshot",
                      "params": cfg.to_cdp_params()})
        else:
            raise ValueError(f"unknown browser action {k!r}")
    # HeadlessBrowserLoaderHelper.php:475-513 getHtmlFromPage
    t.append({"op": "send", "method": "Runtime.evaluate",
              "params": {"expression":
                         "document.documentElement.outerHTML",
                         "returnByValue": True}})
    return t


def _shadow_click_js(host: str, sel: str) -> str:
    """The shadow-DOM click polyfill (BrowserAction.php:49-71), with the
    same 25 ms poll cadence."""
    return (
        "(async function() {"
        + f" let h = document.querySelector({host!r});"
        + " while (!h) { await new Promise(r => setTimeout(r, 25));"
        + f" h = document.querySelector({host!r});" + " }"
        + " if (h.shadowRoot) {"
        + f" let c = h.shadowRoot.querySelector({sel!r});"
        + " while (!c) { await new Promise(r => setTimeout(r, 25));"
        + f" c = h.shadowRoot.querySelector({sel!r});" + " }"
        + ' c.dispatchEvent(new MouseEvent("click", { bubbles: true }));'
        + " } })()"
    )


class CdpTransport:
    """Real Chrome-DevTools-Protocol transport — NOT available here.

    On a real deployment this holds one browser per executor (reference
    keeps one browser per loader, HeadlessBrowserLoaderHelper.php:156-181)
    and is constructed lazily inside the task, never on the driver."""

    def __init__(self, executable: str = "chromium", options: dict | None = None):
        self.executable = executable
        self.options = options or {}

    def transcript(self, url: str, actions: list[BrowserAction]) -> list[dict]:
        """The protocol operations this transport would perform — pinned
        by contract tests (tests/test_browser_contract.py) so a real CDP
        socket layer drops in by implementing only :meth:`_execute`."""
        return build_cdp_transcript(
            url, actions,
            user_agent=self.options.get("user_agent"),
            headers=self.options.get("headers"),
            page_init_script=self.options.get("page_init_script"),
            wait_event=self.options.get("wait_event", "Page.loadEventFired"),
            timeout_ms=self.options.get("timeout_ms", NAVIGATE_TIMEOUT_MS),
        )

    def _execute(self, transcript: list[dict]):
        raise NotImplementedError(
            "no headless browser in this container; use FakeBrowserTransport"
        )

    def __call__(self, url: str, actions: list[BrowserAction]):
        return self._execute(self.transcript(url, actions))


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
