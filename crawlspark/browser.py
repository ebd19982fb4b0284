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


def find_chrome() -> str | None:
    """Locate a Chrome/Chromium binary: $CRAWLSPARK_CHROME wins, else the
    usual names on PATH.  None when the container has no browser (the
    sandbox case — the deterministic FakeBrowserTransport serves tests)."""
    import os
    import shutil

    env = os.environ.get("CRAWLSPARK_CHROME")
    if env and (shutil.which(env) or os.path.exists(env)):
        return shutil.which(env) or env
    for name in ("chromium", "chromium-browser", "google-chrome",
                 "google-chrome-stable", "chrome", "headless_shell"):
        p = shutil.which(name)
        if p:
            return p
    return None


class _WsClient:
    """Minimal RFC 6455 websocket client for the local CDP socket — text
    frames only, client-side masking, ping/pong, fragmentation reassembly.
    No external deps (the container has no websocket lib)."""

    def __init__(self, ws_url: str, timeout_s: float = 30.0):
        import base64
        import os as _os
        import socket
        from urllib.parse import urlparse

        u = urlparse(ws_url)
        self.sock = socket.create_connection(
            (u.hostname, u.port or 80), timeout=timeout_s
        )
        key = base64.b64encode(_os.urandom(16)).decode()
        path = u.path + (f"?{u.query}" if u.query else "")
        req = (
            f"GET {path} HTTP/1.1\r\nHost: {u.hostname}:{u.port}\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        )
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("websocket handshake EOF")
            resp += chunk
        if b" 101 " not in resp.split(b"\r\n", 1)[0]:
            raise ConnectionError(f"websocket handshake failed: {resp[:200]!r}")
        self._buf = resp.split(b"\r\n\r\n", 1)[1]

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("websocket EOF")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def send_text(self, payload: str) -> None:
        import os as _os
        import struct

        data = payload.encode()
        mask = _os.urandom(4)
        n = len(data)
        head = b"\x81"  # FIN + text
        if n < 126:
            head += bytes([0x80 | n])
        elif n < (1 << 16):
            head += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            head += bytes([0x80 | 127]) + struct.pack(">Q", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
        self.sock.sendall(head + mask + masked)

    def recv_text(self) -> str:
        """Next complete text message (transparently answers pings)."""
        import struct

        parts: list[bytes] = []
        while True:
            b0, b1 = self._read_exact(2)
            fin, opcode = b0 & 0x80, b0 & 0x0F
            ln = b1 & 0x7F
            if ln == 126:
                (ln,) = struct.unpack(">H", self._read_exact(2))
            elif ln == 127:
                (ln,) = struct.unpack(">Q", self._read_exact(8))
            if b1 & 0x80:  # masked server frame: tolerated, unmask
                mask = self._read_exact(4)
                payload = bytes(
                    b ^ mask[i % 4]
                    for i, b in enumerate(self._read_exact(ln))
                )
            else:
                payload = self._read_exact(ln)
            if opcode == 0x9:  # ping -> pong
                self.sock.sendall(b"\x8a\x80" + b"\x00\x00\x00\x00")
                continue
            if opcode == 0x8:
                raise ConnectionError("websocket closed by peer")
            if opcode in (0x1, 0x0):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode()
                continue
            # binary/pong frames: ignore

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class CdpTransport:
    """Chrome-DevTools-Protocol transport.

    The protocol surface is the PINNED transcript
    (:func:`build_cdp_transcript`, contract-frozen in
    tests/test_browser_contract.py).  When a chromium/chrome binary is
    present ($CRAWLSPARK_CHROME or PATH — :func:`find_chrome`),
    :meth:`_execute` launches it headless and replays the transcript over
    a real CDP websocket; otherwise it raises NotImplementedError and the
    deterministic FakeBrowserTransport stands in.  On a real deployment
    this holds one browser per executor (reference keeps one browser per
    loader, HeadlessBrowserLoaderHelper.php:156-181) and is constructed
    lazily inside the task, never on the driver."""

    def __init__(self, executable: str | None = None, options: dict | None = None):
        self.executable = executable
        self.options = options or {}

    def transcript(self, url: str, actions: list[BrowserAction]) -> list[dict]:
        """The protocol operations this transport performs — pinned by
        contract tests (tests/test_browser_contract.py) so the live CDP
        socket layer and any future engine stay protocol-identical."""
        return build_cdp_transcript(
            url, actions,
            user_agent=self.options.get("user_agent"),
            headers=self.options.get("headers"),
            page_init_script=self.options.get("page_init_script"),
            wait_event=self.options.get("wait_event", "Page.loadEventFired"),
            timeout_ms=self.options.get("timeout_ms", NAVIGATE_TIMEOUT_MS),
        )

    # -- live execution ----------------------------------------------------
    def _launch(self, exe: str):
        """Headless chrome with an ephemeral DevTools port; returns
        (process, user_data_dir, port)."""
        import subprocess
        import tempfile
        import time as _t

        udir = tempfile.mkdtemp(prefix="crawlspark-cdp-")
        proc = subprocess.Popen(
            [exe, "--headless=new", "--disable-gpu", "--no-sandbox",
             "--no-first-run", "--remote-debugging-port=0",
             f"--user-data-dir={udir}", "about:blank"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        port_file = f"{udir}/DevToolsActivePort"
        deadline = _t.time() + 30
        import os as _os

        while _t.time() < deadline:
            if _os.path.exists(port_file):
                with open(port_file) as fh:
                    first = fh.readline().strip()
                if first.isdigit():
                    return proc, udir, int(first)
            _t.sleep(0.05)
        proc.kill()
        raise ConnectionError("chrome did not publish DevToolsActivePort")

    @staticmethod
    def _page_ws_url(port: int) -> str:
        import json as _json
        from urllib.request import urlopen

        with urlopen(f"http://127.0.0.1:{port}/json/list", timeout=10) as r:
            targets = _json.loads(r.read())
        for t in targets:
            if t.get("type") == "page" and t.get("webSocketDebuggerUrl"):
                return t["webSocketDebuggerUrl"]
        raise ConnectionError(f"no page target on port {port}")

    def _ensure_session(self, exe: str) -> "_WsClient":
        """One browser per transport instance, reused across page loads
        (reference: one browser per loader,
        HeadlessBrowserLoaderHelper.php:156-181).  Launch is lazy; a dead
        socket triggers one relaunch."""
        ws = getattr(self, "_ws", None)
        if ws is not None:
            return ws
        self._proc, self._udir, port = self._launch(exe)
        self._ws = _WsClient(self._page_ws_url(port))
        return self._ws

    def close(self) -> None:
        """Tear down the cached browser session (idempotent)."""
        import shutil

        ws = getattr(self, "_ws", None)
        if ws is not None:
            ws.close()
            self._ws = None
        proc = getattr(self, "_proc", None)
        if proc is not None:
            proc.kill()
            try:
                proc.wait(timeout=10)
            except Exception:
                pass
            self._proc = None
        udir = getattr(self, "_udir", None)
        if udir:
            shutil.rmtree(udir, ignore_errors=True)
            self._udir = None

    def _execute(self, transcript: list[dict]):
        """Replay the pinned transcript against a live browser.

        Returns (status, body, final_url, screenshot, shot_fmt) — the
        caller (:meth:`__call__`) appends the applied-action count so the
        tuple shape matches FakeBrowserTransport exactly.

        Execution-layer glue the pure transcript cannot carry:
        - a CDP ``error`` response fails the page load LOUDLY (a silently
          swallowed error would return a body as if the action ran);
        - ``Input.dispatchMouseEvent`` ops that the transcript records
          without coordinates get the center of the most recent
          getBoundingClientRect evaluation injected (the transcript pins
          the rect lookup immediately before each mouse op);
        - main-document status/final_url come from the
          ``Network.responseReceived`` event whose frameId matches the
          ``Page.navigate`` response — an iframe's Document response must
          not override the page's.
        """
        import base64
        import json as _json
        import time as _t

        exe = self.executable or find_chrome()
        if not exe:
            raise NotImplementedError(
                "no headless browser in this container; use FakeBrowserTransport"
            )
        try:
            ws = self._ensure_session(exe)
        except (ConnectionError, OSError):
            self.close()
            ws = self._ensure_session(exe)
        msg_id = 0
        events: list[dict] = []
        status, final_url, nav_frame = None, None, None
        body, shot, fmt = b"", None, None
        last_rect: dict | None = None

        def pump_until(pred, deadline):
            while _t.time() < deadline:
                m = _json.loads(ws.recv_text())
                if "id" not in m:
                    events.append(m)
                r = pred(m)
                if r is not None:
                    return r
            raise TimeoutError("CDP wait timed out")

        def send(method, params, timeout_s=30.0):
            nonlocal msg_id
            msg_id += 1
            mid = msg_id
            ws.send_text(_json.dumps(
                {"id": mid, "method": method, "params": params}))
            resp = pump_until(
                lambda m: m if m.get("id") == mid else None,
                _t.time() + timeout_s,
            )
            if "error" in resp:
                raise ConnectionError(
                    f"CDP {method} failed: {resp['error']}"
                )
            return resp

        try:
            for op in transcript:
                kind = op["op"]
                if kind == "send":
                    params = dict(op.get("params") or {})
                    if (op["method"] == "Input.dispatchMouseEvent"
                            and "x" not in params and last_rect):
                        params["x"] = last_rect["x"] + last_rect["width"] / 2
                        params["y"] = last_rect["y"] + last_rect["height"] / 2
                    resp = send(op["method"], params)
                    res = (resp.get("result") or {})
                    if op["method"] == "Page.navigate":
                        if res.get("errorText"):
                            raise ConnectionError(
                                f"navigate failed: {res['errorText']}"
                            )
                        nav_frame = res.get("frameId", nav_frame)
                    if op["method"] == "Page.captureScreenshot":
                        shot = base64.b64decode(res.get("data", ""))
                        fmt = (op.get("params") or {}).get("format", "png")
                    if op["method"] == "Runtime.evaluate":
                        expr = (op.get("params") or {}).get("expression", "")
                        val = (res.get("result") or {}).get("value")
                        if "outerHTML" in expr:
                            body = str(val or "").encode()
                        elif "getBoundingClientRect" in expr and val:
                            try:
                                last_rect = _json.loads(val)
                            except (TypeError, ValueError):
                                last_rect = None
                elif kind == "await_event":
                    want = op["event"]
                    deadline = _t.time() + op.get("timeout_ms", 30000) / 1000
                    if not any(e.get("method") == want for e in events):
                        pump_until(
                            lambda m: True if m.get("method") == want else None,
                            deadline,
                        )
                elif kind == "poll":
                    deadline = _t.time() + op.get("timeout_ms", 30000) / 1000
                    while True:
                        resp = send(op["method"], op.get("params") or {})
                        val = ((resp.get("result") or {})
                               .get("result") or {}).get("value")
                        if val:
                            break
                        if _t.time() >= deadline:
                            raise TimeoutError(f"poll timed out: {op}")
                        _t.sleep(0.025)
                elif kind == "sleep":
                    _t.sleep(op["ms"] / 1000)
                else:
                    raise ValueError(f"unknown transcript op {kind!r}")
        except (ConnectionError, TimeoutError):
            # a broken session must not poison the NEXT page load
            self.close()
            raise

        # main-document status + final url: the FIRST Document response on
        # the navigated frame (iframes carry a different frameId)
        for e in events:
            p = e.get("params") or {}
            if (e.get("method") == "Network.responseReceived"
                    and p.get("type") == "Document"
                    and (nav_frame is None
                         or p.get("frameId") in (None, nav_frame))):
                status = (p.get("response") or {}).get("status")
                final_url = (p.get("response") or {}).get("url")
                break
        return (status if status is not None else 200, body,
                final_url, shot, fmt)

    def __call__(self, url: str, actions: list[BrowserAction]):
        status, body, final_url, shot, fmt = self._execute(
            self.transcript(url, actions)
        )
        return (status, body, final_url or url, shot, fmt,
                len(actions or []))

    def __del__(self):  # best-effort: don't leak a chrome per executor
        try:
            self.close()
        except Exception:
            pass


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
