"""CDP contract tests (VERDICT r3 item 7): freeze the protocol surface a
real Chrome transport must implement — recorded-transcript fixtures for
the navigate + action sequences, plus ScreenshotConfig semantics goldens
(reference ScreenshotConfig.php:12-88) — so a live browser drops in
behind CdpTransport._execute without touching the Spark plumbing."""

import json

from pyspark.sql import functions as F

from crawlspark.browser import (
    BrowserAction,
    CdpTransport,
    ScreenshotConfig,
    build_cdp_transcript,
)

# ---- recorded fixture: plain navigate, no actions ------------------------

NAVIGATE_FIXTURE = [
    {"op": "send", "method": "Page.enable", "params": {}},
    {"op": "send", "method": "Network.enable", "params": {}},
    {"op": "send", "method": "Page.navigate",
     "params": {"url": "https://www.example.com/a"}},
    {"op": "await_event", "event": "Page.loadEventFired",
     "timeout_ms": 30000},
    {"op": "send", "method": "Runtime.evaluate",
     "params": {"expression": "document.documentElement.outerHTML",
                "returnByValue": True}},
]


def test_navigate_transcript_matches_fixture():
    assert build_cdp_transcript("https://www.example.com/a") == \
        NAVIGATE_FIXTURE


def test_navigate_with_identity_and_prescript():
    t = build_cdp_transcript(
        "https://www.example.com/a",
        user_agent="TestBot/1.0",
        headers={"Accept-Language": "de"},
        page_init_script="delete window.cdc;",
        wait_event="Page.domContentEventFired",
        timeout_ms=1234,
    )
    methods = [e.get("method") for e in t]
    # identity setup strictly BEFORE navigation
    # (HeadlessBrowserLoaderHelper.php:96-154)
    assert methods.index("Network.setUserAgentOverride") < \
        methods.index("Page.navigate")
    assert methods.index("Network.setExtraHTTPHeaders") < \
        methods.index("Page.navigate")
    assert methods.index("Page.addScriptToEvaluateOnNewDocument") < \
        methods.index("Page.navigate")
    ev = [e for e in t if e["op"] == "await_event"][0]
    assert ev == {"op": "await_event", "event": "Page.domContentEventFired",
                  "timeout_ms": 1234}


# ---- recorded fixture: the full action vocabulary ------------------------

def test_action_vocabulary_transcript():
    actions = [
        BrowserAction.wait_until_document_contains_element("#app"),
        BrowserAction.click_element(".btn", timeout_ms=5000),
        BrowserAction.scroll_down(300),
        BrowserAction.scroll_up(100),
        BrowserAction.move_mouse_to_position(10, 20, steps=5),
        BrowserAction.type_text("hello", delay_ms=50),
        BrowserAction.evaluate("window.x = 1;"),
        BrowserAction.wait(0.25),
        BrowserAction.wait_for_reload(timeout_ms=7000),
        BrowserAction.screenshot(full_page=True, fmt="jpeg", quality=90),
    ]
    t = build_cdp_transcript("https://h.example.com/", actions)
    body = t[4:-1]  # between navigate-wait and the final outerHTML read

    # waitUntilDocumentContainsElement -> truthy poll with action timeout
    assert body[0] == {
        "op": "poll", "method": "Runtime.evaluate",
        "params": {"expression": "!!document.querySelector('#app')",
                   "returnByValue": True},
        "until": "truthy", "timeout_ms": 15000}
    # clickElement -> wait, rect lookup, press+release
    # (BrowserAction.php:26-35: waitUntilContainsElement then
    # mouse()->find()->click())
    assert body[1]["op"] == "poll" and body[1]["timeout_ms"] == 5000
    assert body[2]["method"] == "Runtime.evaluate"
    assert "getBoundingClientRect" in body[2]["params"]["expression"]
    assert body[3]["params"]["type"] == "mousePressed"
    assert body[4]["params"]["type"] == "mouseReleased"
    # scrollDown / scrollUp -> wheel events with signed deltas
    assert body[5]["params"] == {"type": "mouseWheel", "deltaX": 0,
                                 "deltaY": 300}
    assert body[6]["params"] == {"type": "mouseWheel", "deltaX": 0,
                                 "deltaY": -100}
    # moveMouseToPosition carries steps (BrowserAction.php:84-92)
    assert body[7]["params"] == {"type": "mouseMoved", "x": 10, "y": 20,
                                 "steps": 5}
    # typeText with key interval (keyboard()->setKeyInterval()->typeText())
    assert body[8] == {"op": "send", "method": "Input.insertText",
                       "params": {"text": "hello"}, "key_interval_ms": 50}
    # evaluate awaits promises like chrome-php Page::evaluate
    assert body[9]["params"] == {"expression": "window.x = 1;",
                                 "awaitPromise": True}
    assert body[10] == {"op": "sleep", "ms": 250}
    assert body[11] == {"op": "await_event", "event": "Page.loadEventFired",
                        "timeout_ms": 7000}
    # screenshot params follow ScreenshotConfig.toChromePhpScreenshotConfig
    assert body[12] == {"op": "send", "method": "Page.captureScreenshot",
                        "params": {"format": "jpeg", "quality": 90,
                                   "captureBeyondViewport": True}}
    assert len(body) == 13


def test_shadow_dom_click_polyfill_pinned():
    t = build_cdp_transcript(
        "https://h.example.com/",
        [BrowserAction.click_inside_shadow_dom("#host", ".inner")])
    e = t[4]
    assert e["method"] == "Runtime.evaluate"
    assert e["timeout_ms"] == 15000
    js = e["params"]["expression"]
    # the 25ms poll cadence and bubbling MouseEvent are load-bearing
    # (BrowserAction.php:49-71)
    assert "setTimeout(r, 25)" in js
    assert "shadowRoot" in js and "bubbles: true" in js
    assert e["params"]["awaitPromise"] is True


def test_transcript_is_json_serializable():
    t = build_cdp_transcript(
        "https://h.example.com/",
        [BrowserAction.screenshot(), BrowserAction.type_text("x")])
    assert json.loads(json.dumps(t)) == t


def test_cdp_transport_builds_transcript_but_socket_is_stubbed():
    import pytest

    tr = CdpTransport(options={"user_agent": "B/1"})
    t = tr.transcript("https://e.example.com/", [])
    assert t[2]["method"] == "Network.setUserAgentOverride"
    with pytest.raises(NotImplementedError):
        tr("https://e.example.com/", [])


# ---- ScreenshotConfig semantics (ScreenshotConfig.php goldens) ----------

def test_screenshot_config_quality_rules():
    c = ScreenshotConfig.make("/shots")
    assert c.to_cdp_params() == {"format": "png"}
    c.set_quality(50)            # ignored for png (php:52-58)
    assert c.quality is None
    c.set_image_file_type("jpeg")
    assert c.quality == 80       # lossy default (php:40-42)
    c.set_quality(33)
    assert c.to_cdp_params() == {"format": "jpeg", "quality": 33}
    c.set_image_file_type("png")
    assert c.quality is None     # png clears quality (php:43-44)
    c.set_image_file_type("bmp")  # invalid type ignored (php:38)
    assert c.file_type == "png"
    c.set_image_file_type("webp")
    c.set_full_page()
    assert c.to_cdp_params() == {"format": "webp", "quality": 80,
                                 "captureBeyondViewport": True}


def test_screenshot_full_path_layout():
    import hashlib

    c = ScreenshotConfig.make("/shots").set_image_file_type("jpeg")
    p = c.full_path("https://www.example.com/x", 1723456789000000)
    md5 = hashlib.md5(b"https://www.example.com/x").hexdigest()
    assert p == f"/shots/{md5}-1723456789000000.jpeg"
    # no double slash when store path already ends with /
    assert ScreenshotConfig.make("/s/").full_path("u", 1).startswith("/s/")
    assert "//" not in ScreenshotConfig.make("/s/").full_path("u", 1)[3:]


def test_screenshot_column_golden(spark):
    """Screenshot-format plumbing through the politeness-partitioned
    stage: jpeg screenshots come back lossy-validated (PSNR vs the
    deterministic render), png come back exact."""
    from crawlspark.browser import FakeBrowserTransport, browser_fetch_stage
    from crawlspark.images import _decode, _pixels
    import zlib

    f = spark.createDataFrame(
        [(f"https://h{i}.example.com/p", f"h{i}.example.com", i)
         for i in range(6)],
        "url STRING, host STRING, ord LONG")
    out = browser_fetch_stage(
        f, actions=[BrowserAction.screenshot(fmt="jpeg", quality=80)],
        transport_factory=FakeBrowserTransport, sleep=lambda s: None,
    ).collect()
    assert len(out) == 6
    for r in out:
        assert r.screenshot_fmt == "jpeg"
        seed = zlib.crc32(r.url.encode()) & 0x7FFFFFFF
        want = _pixels(seed, FakeBrowserTransport.W, FakeBrowserTransport.H)
        got = _decode(bytes(r.screenshot), FakeBrowserTransport.W,
                      FakeBrowserTransport.H)
        assert got.shape == want.shape
        mse = ((got.astype("f8") - want.astype("f8")) ** 2).mean()
        import math
        psnr = 99.0 if mse == 0 else 10 * math.log10(255.0 ** 2 / mse)
        assert psnr >= 40.0, (r.url, psnr)
