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


# ---------------------------------------------------------------------------
# caption_alignment (CLIP-score-style filter)
# ---------------------------------------------------------------------------

def _py_align(caption: str, phash: int) -> tuple[int, int]:
    """Pure-Python twin of mmcurate.caption_alignment's scorer."""
    import hashlib

    dot = 0
    toks = [t for t in caption.split(" ") if t != ""]
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        sign = 1 if (h >> 6) & 1 == 1 else -1
        bit = 1 if (phash >> (h % 64)) & 1 == 1 else -1
        dot += sign * bit
    return len(toks), dot


def _align_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "image_id string, caption string, phash long"
    )
    out = mmcurate.caption_alignment(df)
    return {r["image_id"]: r.asDict() for r in out.collect()}


def test_caption_alignment_matches_python_twin(spark):
    rows = [
        ("a", "red cat on mat", 0x0123456789ABCDEF),
        ("b", "red cat on mat", -0x0123456789ABCDF0),  # negative phash
        ("c", "", 42),                                  # empty caption
        ("d", "one", -1),                               # all bits set
        ("e", "x y z w v u t s", 0),                    # no bits set
    ]
    got = _align_rows(spark, rows)
    for image_id, caption, phash in rows:
        n, dot = _py_align(caption, phash)
        r = got[image_id]
        assert r["n_cap_tokens"] == n, image_id
        assert r["align_dot"] == dot, image_id
        assert r["keep"] == (n > 0 and 1000 * dot >= 280 * n), image_id


def test_caption_alignment_threshold_cross_multiplied(spark):
    # craft a caption whose every token hits img bit == sign (dot == n):
    # phash = -1 -> every img bit is +1, so dot = sum of signs; pick tokens
    # with sign +1 only (hash bit 6 set)
    import hashlib

    toks = []
    i = 0
    while len(toks) < 5:
        t = f"tok{i}"
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        if (h >> 6) & 1 == 1:
            toks.append(t)
        i += 1
    got = _align_rows(spark, [("p", " ".join(toks), -1)])["p"]
    assert got["align_dot"] == 5 and got["keep"] is True  # 1000*5 >= 280*5


def test_caption_alignment_codec_composition(spark):
    """End-to-end over the REAL codec path: generate_images' pixel-derived
    phash + derived captions, every row vs the pure-Python twin."""
    from pyspark.sql import functions as F
    from crawlspark import images

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    imgs = images.generate_images(spark, "/root/testdata/sf0.001", docs=docs)
    src = {r["image_id"]: r for r in imgs.select("image_id", "caption", "phash").collect()}
    got = {r["image_id"]: r.asDict()
           for r in mmcurate.caption_alignment(imgs).collect()}
    assert len(got) == 60
    for image_id, r in src.items():
        n, dot = _py_align(r["caption"], r["phash"])
        assert got[image_id]["n_cap_tokens"] == n
        assert got[image_id]["align_dot"] == dot


def test_caption_alignment_plan_is_narrow(spark):
    """No shuffle: the filter must fuse into the scan (a narrow map)."""
    df = spark.createDataFrame(
        [("a", "some caption here", 7)], "image_id string, caption string, phash long"
    )
    plan = mmcurate.caption_alignment(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
