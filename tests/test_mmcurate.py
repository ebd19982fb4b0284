"""Boundary-exactness of the multimodal pair filter and aspect buckets
(mmcurate.py): integer thresholds must flip on exactly the documented
boundary, bit-for-bit what the DuckDB oracle computes."""

from crawlspark import mmcurate


def _row(spark, image_id, w, h, caption):
    return spark.createDataFrame(
        [(image_id, w, h, caption)], "image_id string, w int, h int, caption string"
    )


def _keep(spark, w, h, caption):
    df = mmcurate.caption_pair_filter(_row(spark, "x", w, h, caption))
    return {r["image_id"]: r.asDict() for r in df.collect()}["x"]


CAP_OK = "one two three four"


def test_aspect_boundaries(spark):
    assert _keep(spark, 80, 40, CAP_OK)["ar_ok"] is True       # ar == 2 exactly
    assert _keep(spark, 81, 40, CAP_OK)["ar_ok"] is False
    assert _keep(spark, 40, 80, CAP_OK)["ar_ok"] is True       # ar == 1/2 exactly
    assert _keep(spark, 40, 81, CAP_OK)["ar_ok"] is False


def test_size_boundary(spark):
    assert _keep(spark, 40, 100, CAP_OK)["size_ok"] is True
    assert _keep(spark, 39, 100, CAP_OK)["size_ok"] is False


def test_caption_token_boundaries(spark):
    assert _keep(spark, 50, 50, "a b")["cap_ok"] is False          # 2 tokens
    assert _keep(spark, 50, 50, "a b c")["cap_ok"] is True         # 3 tokens
    assert _keep(spark, 50, 50, " ".join(["w"] * 32))["cap_ok"] is True
    assert _keep(spark, 50, 50, " ".join(["w"] * 33))["cap_ok"] is False
    r = _keep(spark, 50, 50, "")
    assert r["n_cap_tokens"] == 0 and r["cap_ok"] is False


def test_digit_ratio_boundary(spark):
    # 3 digits / 10 chars = 300 permille -> ok; 4/10 = 400 -> not
    assert _keep(spark, 50, 50, "abc 123 xy")["digit_ok"] is True
    assert _keep(spark, 50, 50, "ab 1234 xy")["digit_ok"] is False
    assert _keep(spark, 50, 50, "")["digit_permille"] == 0


def test_keep_is_conjunction(spark):
    r = _keep(spark, 50, 50, CAP_OK)
    assert r["keep"] is True
    assert _keep(spark, 39, 50, CAP_OK)["keep"] is False


def test_bucket_boundaries(spark):
    rows = [
        ("t", 29, 40), ("sq_lo", 30, 40),   # 4w<3h tall; 4w==3h square
        ("sq_hi", 40, 30), ("w", 41, 30),   # 3w==4h square; 3w>4h wide
    ]
    df = spark.createDataFrame(
        [(i, w, h, CAP_OK) for i, w, h in rows],
        "image_id string, w int, h int, caption string",
    )
    got = {
        r["image_id"]: r["bucket"]
        for r in df.select(
            "image_id",
            mmcurate.aspect_bucket_col(df["w"], df["h"]).alias("bucket"),
        ).collect()
    }
    assert got == {"t": "tall", "sq_lo": "square", "sq_hi": "square", "w": "wide"}


def test_bucket_stats_shape(spark):
    df = spark.createDataFrame(
        [("a", 29, 40, CAP_OK), ("b", 45, 45, CAP_OK), ("c", 41, 30, "a b")],
        "image_id string, w int, h int, caption string",
    )
    got = {r["bucket"]: r.asDict() for r in mmcurate.aspect_bucket_stats(df).collect()}
    assert got["tall"]["n_pairs"] == 1 and got["tall"]["n_kept"] == 0  # 29 < 40
    assert got["square"]["n_kept"] == 1
    assert got["wide"]["n_kept"] == 0  # caption too short
    assert got["square"]["min_w"] == got["square"]["max_w"] == 45
