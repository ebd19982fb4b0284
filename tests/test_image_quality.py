"""Image quality gates: closed-form families + metric invariants."""

import numpy as np
import pandas as pd

from crawlspark.images import (
    QUALITY_FAMILIES,
    _encode,
    _quality_pixels,
    image_quality_stats,
    planted_quality_images,
)


def _stats_for(spark, pixel_arrays):
    """Run image_quality_stats over in-memory pixel arrays."""
    rows = [
        {
            "image_id": f"t-{i}",
            "bytes": _encode(px, "png"),
            "w": px.shape[1],
            "h": px.shape[0],
        }
        for i, px in enumerate(pixel_arrays)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = image_quality_stats(df).toPandas()
    return out.sort_values("image_id").reset_index(drop=True)


def test_planted_family_closed_forms(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    out = (
        image_quality_stats(planted_quality_images(docs))
        .toPandas()
        .assign(doc=lambda d: d.image_id.str.split("-").str[1].astype(int))
        .sort_values("doc")
        .reset_index(drop=True)
    )
    expect = {
        "flat": (0, 0, 146, 1000),
        "ramp": (0, 6000, 0, 500),
        "checker": (800 * 1860, 1000, 0, 500),
        "stripes": (192 * 1860, 1000, 0, 500),
    }
    for _, r in out.iterrows():
        fam = QUALITY_FAMILIES[r.doc % 4]
        sharp, ent, bucket, share = expect[fam]
        assert r.sharp_energy == sharp, fam
        assert r.entropy_mbits == ent, fam
        assert r.top_bucket == bucket, fam
        assert r.top_share_permille == share, fam
        assert r.interior == 62 * 30


def test_entropy_exact_for_power_of_two_values(spark):
    # k equally-frequent byte values -> exactly 1000*log2(k) milli-bits
    arrays = []
    for k in (1, 2, 4, 8):
        xs = np.arange(16 * 16).reshape(16, 16) % k
        arrays.append(np.repeat((xs * 17).astype(np.uint8)[:, :, None], 3, axis=2))
    out = _stats_for(spark, arrays)
    assert list(out.entropy_mbits) == [0, 1000, 2000, 3000]


def test_box_blur_strictly_reduces_sharpness(spark):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    g = px.astype(np.int32)
    blur = (
        g[:-2, :-2] + g[:-2, 1:-1] + g[:-2, 2:]
        + g[1:-1, :-2] + g[1:-1, 1:-1] + g[1:-1, 2:]
        + g[2:, :-2] + g[2:, 1:-1] + g[2:, 2:]
    ) // 9
    out = _stats_for(spark, [px, blur.clip(0, 255).astype(np.uint8)])
    sharp, blurred = out.sharp_energy[0], out.sharp_energy[1]
    assert blurred < sharp / 2


def test_dominant_share_and_tiny_image(spark):
    # 75% one colour / 25% another -> shares 750; ties -> smaller bucket
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[6:, :, :] = 255  # bottom quarter bucket 511
    tiny = np.full((2, 2, 3), 9, dtype=np.uint8)  # interior 0 -> sharp 0
    out = _stats_for(spark, [px, tiny])
    assert out.top_bucket[0] == 0 and out.top_share_permille[0] == 750
    assert out.sharp_energy[1] == 0 and out.interior[1] == 0
    assert out.top_share_permille[1] == 1000


def test_spatial_permutation_invariance(spark):
    # entropy + dominant share depend only on the histogram; Laplacian
    # energy depends on layout — sorting the pixels must change it
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    flat = px.reshape(-1, 3)
    order = np.lexsort((flat[:, 2], flat[:, 1], flat[:, 0]))
    sorted_px = flat[order].reshape(16, 16, 3)
    out = _stats_for(spark, [px, sorted_px])
    assert out.entropy_mbits[0] == out.entropy_mbits[1]
    assert out.top_bucket[0] == out.top_bucket[1]
    assert out.top_share_permille[0] == out.top_share_permille[1]
    assert out.sharp_energy[0] != out.sharp_energy[1]
