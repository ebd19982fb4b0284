"""Round-3 part-9 operators: exact order statistics — adaptive timeouts,
bytes-per-pixel outliers."""

import numpy as np
from pyspark.sql import functions as F


def test_adaptive_timeouts_differential(spark):
    from crawlspark.politeness import adaptive_timeouts

    rng = np.random.default_rng(5)
    rows = []
    for hn in range(8):
        n = int(rng.integers(1, 60))
        for _ in range(n):
            rows.append((f"h{hn}", int(rng.integers(10, 5000))))
    df = spark.createDataFrame(rows, "host string, latency_ms long")
    got = {r["host"]: r for r in adaptive_timeouts(df).collect()}
    by = {}
    for h, l in rows:
        by.setdefault(h, []).append(l)
    for h, lats in by.items():
        lats.sort()
        k = max(1, -(-95 * len(lats) // 100))  # ceil(0.95 n)
        p95 = lats[k - 1]
        assert got[h]["p95_ms"] == p95, h
        assert got[h]["timeout_ms"] == max(1000, min(30000, p95 * 2))
        assert got[h]["n_samples"] == len(lats)


def test_adaptive_timeouts_single_sample(spark):
    from crawlspark.politeness import adaptive_timeouts

    df = spark.createDataFrame([("h", 40)], "host string, latency_ms long")
    r = adaptive_timeouts(df).collect()[0]
    assert (r["p95_ms"], r["timeout_ms"]) == (40, 1000)  # clamped to floor


def test_bpp_outliers_classes(spark):
    from crawlspark.images import bytes_per_pixel_outliers

    rows = (
        [(f"n{i}", "jpeg", 100, 100, 20_000) for i in range(9)]  # 2000 bpp
        + [("fat", "jpeg", 100, 100, 90_000)]     # 9000 > 3x median
        + [("thin", "jpeg", 100, 100, 5_000)]     # 500 * 3 < 2000
        + [("zero", "jpeg", 0, 100, 1_000)]       # unmeasurable
        + [("lonefmt", "webp", 10, 10, 300)]      # own format, own median
    )
    df = spark.createDataFrame(
        rows, "image_id string, fmt string, w long, h long, nbytes long"
    )
    got = {r["image_id"]: r for r in bytes_per_pixel_outliers(df).collect()}
    assert got["n0"]["bpp_class"] == "ok"
    assert got["fat"]["bpp_class"] == "bloated"
    assert got["thin"]["bpp_class"] == "tiny"
    assert got["zero"]["bpp_class"] == "unmeasurable"
    assert got["lonefmt"]["bpp_class"] == "ok"  # median of itself
    assert got["n0"]["fmt_median_bpp"] == 2000
