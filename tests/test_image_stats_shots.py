"""image_quality_stats + shot_boundaries + sitemap_news_entries."""

import numpy as np
from pyspark.sql import functions as F

from crawlspark.images import image_pixel_stats
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
           image_pixel_stats(_img_df(spark, arrays)).collect()}
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
           image_pixel_stats(_img_df(spark, [sharp, blurred])).collect()}
    assert got["i1"].sharpness_permille < got["i0"].sharpness_permille / 2


def test_image_stats_tiny_image_sharpness_zero(spark):
    tiny = np.full((2, 2, 3), 7, dtype=np.uint8)
    r = image_pixel_stats(_img_df(spark, [tiny])).collect()[0]
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


def test_schedule_audit_gap_col_and_singletons(spark):
    from crawlspark.politeness import schedule_audit

    rows = [
        # host a: crawl-delay column says 200ms; 100ms gaps -> violations
        ("a", 0, 20, 200), ("a", 120, 140, 200), ("a", 240, 260, 200),
        # host b: single fetch -> no gaps, NULL min
        ("b", 0, 50, None),
        # host c: NULL delay col falls back to min_gap_ms floor (10)
        ("c", 0, 20, None), ("c", 25, 45, None),
    ]
    df = spark.createDataFrame(
        rows, "host STRING, fetch_start_ms LONG, fetch_end_ms LONG, "
              "crawl_delay_ms LONG")
    out = {r.host: r for r in schedule_audit(
        df, min_gap_col="crawl_delay_ms", min_gap_ms=10).collect()}
    assert out["a"].n_gap_violations == 2 and out["a"].n_overlaps == 0
    assert out["b"].n_fetches == 1
    assert out["b"].min_gap_ms_observed is None
    assert out["b"].n_gap_violations == 0
    assert out["c"].n_gap_violations == 1  # 5ms gap < 10ms floor
    assert out["c"].min_gap_ms_observed == 5


def test_schedule_audit_passes_real_scheduler_output(spark):
    """The audit must certify throttle_schedule's own output clean: the
    scheduler's invariant re-verified from its emitted rows."""
    from crawlspark import politeness

    f = spark.createDataFrame(
        [(f"h{i % 7}", i, 40 + (i % 3) * 10) for i in range(200)],
        "host STRING, ord LONG, latency_ms LONG")
    cfg = politeness.PolitenessConfig()
    sched = politeness.throttle_schedule(f, cfg=cfg)
    audit = politeness.schedule_audit(
        sched, min_gap_ms=cfg.min_wait_ms).collect()
    assert sum(r.n_gap_violations for r in audit) == 0
    assert sum(r.n_overlaps for r in audit) == 0
    assert sum(r.n_fetches for r in audit) == 200
