"""Headless-browser stage: stubbed engine, real distributed plumbing.

Reference: HttpLoader browser routing (HttpLoader.php:305-311,413),
BrowserAction post-navigate hooks (Browser/BrowserAction.php:17-171),
screenshots on the response (RespondedRequest.php:16-35)."""

import pytest
from pyspark.sql import functions as F

from crawlspark import browser, images
from crawlspark.politeness import PolitenessConfig

NOWAIT = PolitenessConfig(min_wait_ms=0, num_buckets=4)


def _frontier(spark, n=40, hosts=4):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % hosts).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias("host"),
        F.col("id").alias("ord"),
    )


def test_browser_stage_renders_and_screenshots(spark):
    actions = [
        browser.BrowserAction.wait_until_document_contains_element("#main"),
        browser.BrowserAction.scroll_down(500),
        browser.BrowserAction.screenshot(fmt="png"),
    ]
    out = browser.browser_fetch_stage(_frontier(spark), actions, cfg=NOWAIT).collect()
    assert len(out) == 40
    for r in out:
        assert r.status == 200
        assert b"rendered " + r.url.encode() in r.body
        assert r.actions_applied == 3
        assert r.screenshot_fmt == "png"
        # screenshot decodes to the seeded pixels (PSNR-exact for png)
        import zlib

        seed = zlib.crc32(r.url.encode()) & 0x7FFFFFFF
        px = images._decode(r.screenshot,
                            browser.FakeBrowserTransport.W,
                            browser.FakeBrowserTransport.H)
        assert (px == images._pixels(seed, browser.FakeBrowserTransport.W,
                                     browser.FakeBrowserTransport.H)).all()


def test_browser_stage_no_screenshot_action(spark):
    out = browser.browser_fetch_stage(_frontier(spark, n=8), [], cfg=NOWAIT).collect()
    assert all(r.screenshot is None and r.screenshot_fmt is None for r in out)


def test_browser_screenshot_deterministic_across_runs(spark):
    a = [browser.BrowserAction.screenshot()]
    r1 = {r.url: bytes(r.screenshot)
          for r in browser.browser_fetch_stage(_frontier(spark), a, cfg=NOWAIT).collect()}
    r2 = {r.url: bytes(r.screenshot)
          for r in browser.browser_fetch_stage(_frontier(spark), a, cfg=NOWAIT).collect()}
    assert r1 == r2


def test_cdp_transport_is_explicit_stub(spark):
    if browser.find_chrome() is not None:
        pytest.skip("a live browser is present; covered by contract tests")
    with pytest.raises(NotImplementedError):
        browser.CdpTransport()("http://x.test/", [])
