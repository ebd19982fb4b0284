"""Round-2 part-11 operators: wave completion, interleaving, splits."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.mmcurate import interleave_doc
from crawlspark.scheduler import wave_completion
from crawlspark.textops.curate import train_val_test_split


def _wc(spark, rows):
    df = spark.createDataFrame(
        rows, "url STRING, status INT, attempt LONG, retry_after_s LONG")
    return {r.url: r for r in wave_completion(df, now_ts=1000).collect()}


def test_wave_completion_dispositions(spark):
    out = _wc(spark, [
        ("ok", 200, 0, None), ("mv", 301, 0, None), ("gone", 410, 0, None),
        ("retry0", 503, 0, None),       # backoff 60
        ("retry3", 429, 3, None),       # backoff 480
        ("retry-ra", 503, 0, 900),      # Retry-After 900 beats 60
        ("retry-ra-small", 503, 3, 10),  # backoff 480 beats RA 10
        ("exhausted", 503, 4, None),    # attempt ceiling -> dead
        ("teapot", 418, 0, None),
    ])
    assert out["ok"].disposition == "done"
    assert out["mv"].disposition == "rewrite"
    assert out["gone"].disposition == "dead"
    assert out["retry0"].disposition == "retry"
    assert out["retry0"].requeue_at == 1060
    assert out["retry0"].next_attempt == 1
    assert out["retry3"].requeue_at == 1000 + 480
    assert out["retry-ra"].requeue_at == 1900
    assert out["retry-ra-small"].requeue_at == 1480
    assert out["exhausted"].disposition == "dead"
    assert out["exhausted"].requeue_at is None
    assert out["teapot"].disposition == "dead"


def test_interleave_doc_shapes(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d", img_offsets=[2], image_ids=["x"]),
        Row(doc_id=2, text="a b c d", img_offsets=[0], image_ids=["y"]),
        Row(doc_id=3, text="a b", img_offsets=[], image_ids=[]),
        Row(doc_id=4, text="a b", img_offsets=[2], image_ids=["z"]),  # at end
    ])
    out = {}
    for r in interleave_doc(df).collect():
        out.setdefault(r.doc_id, []).append((r.seq, r.kind, r.content))
    assert sorted(out[1]) == [(0, "text", "a b"), (1, "image", "x"),
                              (2, "text", "c d")]
    # leading image: empty first segment dropped, seq renumbered
    assert sorted(out[2]) == [(0, "image", "y"), (1, "text", "a b c d")]
    assert sorted(out[3]) == [(0, "text", "a b")]
    # trailing image: empty last segment dropped
    assert sorted(out[4]) == [(0, "text", "a b"), (1, "image", "z")]


def test_split_stability_and_bounds(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = train_val_test_split(df).collect()
    counts = {}
    for r in out:
        counts[r.split] = counts.get(r.split, 0) + 1
        assert (r.split == "train") == (r.split_bucket < 900)
    # roughly proportional (hash-uniform): train ~90%, val+test ~10%
    assert counts["train"] > 1700
    assert 40 <= counts.get("val", 0) <= 160
    # stability: same ids -> identical assignment on recompute
    again = {r.doc_id: r.split for r in train_val_test_split(df).collect()}
    for r in out:
        assert again[r.doc_id] == r.split


def test_wave_fairness_bounds(spark):
    from crawlspark.scheduler import wave_fairness
    even = spark.createDataFrame(
        [(f"h{i % 4}",) for i in range(40)], "host STRING")
    r = wave_fairness(even).head()
    assert r.n_hosts == 4 and r.n_slots == 40
    assert r.fairness_scaled == 1000  # perfectly even
    skew = spark.createDataFrame(
        [("hot",)] * 37 + [("a",), ("b",), ("c",)], "host STRING")
    r2 = wave_fairness(skew).head()
    # heavily skewed: J ~ (40^2)/(4 * (37^2+3)) ~ 0.29
    assert r2.fairness_scaled < 350


def test_thumb_pyramid_levels(spark):
    from crawlspark.images import thumbnail_pyramid_plan
    imgs = spark.createDataFrame(
        [("big", 256, 512), ("small", 40, 40), ("tiny", 8, 8)],
        "image_id STRING, w INT, h INT")
    out = {}
    for r in thumbnail_pyramid_plan(imgs, min_side=64).collect():
        out.setdefault(r.image_id, []).append((r.level, r.w, r.h))
    # big: short edge 256 -> levels 0 (256x512), 1 (128x256), 2 (64x128)
    assert sorted(out["big"]) == [(0, 256, 512), (1, 128, 256),
                                  (2, 64, 128)]
    # below min_side already: level 0 only (original always kept)
    assert out["small"] == [(0, 40, 40)]
    assert out["tiny"] == [(0, 8, 8)]
