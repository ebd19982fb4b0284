"""image_quality_stats + shot_boundaries + sitemap_news_entries."""

import numpy as np
from pyspark.sql import functions as F

from crawlspark.images import image_quality_stats
from crawlspark.media import shot_boundaries


def _img_df(spark, arrays):
    rows = [
        (f"i{k}", a.tobytes(), a.shape[1], a.shape[0])
        for k, a in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "image_id STRING, bytes BINARY, w INT, h INT")


def test_image_stats_match_numpy(spark):
    rng = np.random.default_rng(11)
    arrays = [rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
              for _ in range(4)]
    got = {r.image_id: r for r in
           image_quality_stats(_img_df(spark, arrays)).collect()}
    for k, a in enumerate(arrays):
        gray = a.astype(np.float64).mean(axis=2)
        lap = (gray[:-2, 1:-1] + gray[2:, 1:-1] + gray[1:-1, :-2]
               + gray[1:-1, 2:] - 4 * gray[1:-1, 1:-1])
        counts = np.bincount(a.reshape(-1), minlength=256).astype(float)
        p = counts[counts > 0] / counts.sum()
        r = got[f"i{k}"]
        assert r.mean_permille == int(np.floor(gray.mean() * 1000))
        assert r.contrast_permille == int(np.floor(gray.std() * 1000))
        assert r.sharpness_permille == int(np.floor(np.abs(lap).mean() * 1000))
        assert r.entropy_millibits == int(
            np.floor(-(p * np.log2(p)).sum() * 1000))


def test_image_stats_blur_ranks_below_sharp(spark):
    """The blur detector must rank a smoothed image below its sharp
    source — the cut a curation filter actually makes."""
    rng = np.random.default_rng(3)
    sharp = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    # 3x3 box blur, valid region padded by edge replication
    f = sharp.astype(np.float64)
    blur = f.copy()
    blur[1:-1, 1:-1] = sum(
        f[1 + dy:15 + dy, 1 + dx:15 + dx]
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ) / 9.0
    blurred = np.clip(blur, 0, 255).astype(np.uint8)
    got = {r.image_id: r for r in
           image_quality_stats(_img_df(spark, [sharp, blurred])).collect()}
    assert got["i1"].sharpness_permille < got["i0"].sharpness_permille / 2


def test_image_stats_tiny_image_sharpness_zero(spark):
    tiny = np.full((2, 2, 3), 7, dtype=np.uint8)
    r = image_quality_stats(_img_df(spark, [tiny])).collect()[0]
    assert r.sharpness_permille == 0 and r.mean_permille == 7000


def test_shot_boundaries_segments_and_threshold(spark):
    # 2 videos x 8 frames, solid 2x2 frames; video B has one soft change
    # below threshold that must NOT cut
    rows = []
    for vid, colors in (
        ("a", [0, 0, 0, 90, 90, 90, 200, 200]),
        ("b", [50, 50, 52, 52, 50, 180, 180, 180]),
    ):
        for i, c in enumerate(colors):
            rows.append((vid, i, bytes([c]) * 12))
    f = spark.createDataFrame(
        rows, "video_id STRING, frame_idx INT, bytes BINARY")
    out = {(r.video_id, r.frame_idx): r
           for r in shot_boundaries(f, threshold_permille=5000).collect()}
    assert [out[("a", i)].shot_id for i in range(8)] == [0, 0, 0, 1, 1, 1, 2, 2]
    # soft 50->52 delta (2000 permille) below the 5000 threshold: same shot
    assert [out[("b", i)].shot_id for i in range(8)] == [0, 0, 0, 0, 0, 1, 1, 1]
    assert out[("b", 2)].diff_permille == 2000
    assert out[("a", 0)].diff_permille is None
    assert not out[("a", 0)].is_boundary


def test_sitemap_news_ignores_plain_urls(spark):
    from crawlspark.extract import sitemap_news_entries

    xml = (
        "<urlset><url><loc>https://x/plain</loc></url>"
        "<url><loc>https://x/n</loc><news:news><news:publication>"
        "<news:name>P</news:name><news:language>de</news:language>"
        "</news:publication><news:publication_date>2026-01-02"
        "</news:publication_date><news:title>T</news:title>"
        "</news:news></url></urlset>"
    )
    d = spark.createDataFrame([(xml,)], ["b"])
    out = d.select(
        F.explode(sitemap_news_entries(F.col("b"))).alias("e")
    ).select("e.*").collect()
    assert len(out) == 1
    assert out[0].page_url == "https://x/n"
    assert (out[0].publication, out[0].language, out[0].pub_date,
            out[0].title) == ("P", "de", "2026-01-02", "T")
