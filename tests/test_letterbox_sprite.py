"""Round-3 part-21 operators: letterbox and sprite-sheet detection."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _img_df(spark, doc_ids, edit=None):
    from crawlspark.images import _encode, _pixels, dims_for

    rows = []
    for d in doc_ids:
        w, h = dims_for(d)
        px = _pixels(d, w, h).copy()
        if edit is not None:
            px = edit(d, px)
        rows.append({
            "image_id": f"img-{d}", "bytes": _encode(px, "png"),
            "w": w, "h": h, "fmt": "png", "caption": "", "phash": 0,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


def test_detect_letterbox_clean_images_have_no_bars(spark):
    from crawlspark.images import detect_letterbox

    out = detect_letterbox(_img_df(spark, [2, 6, 10])).collect()
    for r in out:
        assert (r["bar_top"], r["bar_bottom"],
                r["bar_left"], r["bar_right"]) == (0, 0, 0, 0)


def test_detect_letterbox_planted_bars_exact(spark):
    from crawlspark.images import detect_letterbox

    def edit_h(d, px):
        px[:3, :, :] = 0          # 3-row top bar
        px[-2:, :, :] = 0         # 2-row bottom bar
        return px

    r = detect_letterbox(_img_df(spark, [5], edit_h)).collect()[0]
    assert r["bar_top"] == 3 and r["bar_bottom"] == 2
    assert r["bar_left"] == 0 and r["bar_right"] == 0
    w, h = 32 + 5 % 32, 32 + 5 % 24
    assert r["content_w"] == w and r["content_h"] == h - 5

    def edit_v(d, px):
        px[:, :1, :] = 7          # 1-col left bar (non-black uniform)
        return px

    r2 = detect_letterbox(_img_df(spark, [5], edit_v)).collect()[0]
    assert r2["bar_left"] == 1 and r2["bar_right"] == 0
    assert r2["bar_top"] == 0 and r2["bar_bottom"] == 0
    assert r2["content_w"] == w - 1


def test_detect_letterbox_caps_at_half(spark):
    from crawlspark.images import detect_letterbox

    def edit(d, px):
        px[:, :, :] = 42          # fully uniform image
        return px

    r = detect_letterbox(_img_df(spark, [4], edit)).collect()[0]
    w, h = 32 + 4 % 32, 32 + 4 % 24
    # each side consumes at most half; content never goes negative
    assert r["bar_top"] == h // 2 and r["bar_bottom"] == h // 2
    assert r["content_h"] >= 0 and r["content_w"] >= 0


def test_detect_sprite_sheets(spark):
    from crawlspark.images import detect_sprite_sheets

    def edit(d, px):
        tile = px[:8, :8, :]
        h, w, _ = px.shape
        reps = np.tile(tile, ((h + 7) // 8, (w + 7) // 8, 1))
        return reps[:h, :w, :]

    tiled = detect_sprite_sheets(_img_df(spark, [9], edit)).collect()[0]
    assert tiled["is_tiled"] and tiled["n_distinct_tiles"] == 1
    w, h = 32 + 9 % 32, 32 + 9 % 24
    assert tiled["n_tiles"] == (h // 8) * (w // 8)

    noise = detect_sprite_sheets(_img_df(spark, [9])).collect()[0]
    assert not noise["is_tiled"]
    assert noise["n_distinct_tiles"] == noise["n_tiles"]
