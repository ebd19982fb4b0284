"""Image payload invariants (BASELINE.json input_hint): lossless round-trip,
PSNR >= 40 dB for lossy formats, caption equality, phash stability."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlspark import images

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def img_df(spark):
    return images.generate_images(spark, SF_DIR).persist()


def test_schema_matches_input_hint(img_df):
    assert img_df.schema.simpleString() == (
        "struct<image_id:string,bytes:binary,w:int,h:int,fmt:string,"
        "caption:string,phash:bigint>"
    )


def test_lossless_roundtrip_and_psnr_gate(spark, img_df):
    v = images.validate_images(img_df).persist()
    n = v.count()
    assert n == img_df.count() and n > 0
    # png rows must round-trip exactly
    assert v.filter((F.col("fmt") == "png") & ~F.col("lossless_ok")).count() == 0
    # lossy rows must clear 40 dB (milli-dB units)
    bad = v.filter((F.col("fmt") != "png") & (F.col("psnr_mdb") < 40_000)).count()
    assert bad == 0
    # phash recomputed from decoded pixels must match the stored hash
    assert v.filter(~F.col("phash_match")).count() == 0


def test_caption_normalization(spark, img_df):
    """Caption = first 10 words of the doc text after the reference
    whitespace normalization (Dom/Node.php:108-120)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    joined = img_df.withColumn(
        "doc_id", F.split("image_id", "-").getItem(1).cast("long")
    ).join(docs, "doc_id")
    expected = F.concat_ws(" ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 10))
    assert joined.filter(F.col("caption") != expected).count() == 0


def test_codec_determinism():
    px1 = images._pixels(42, 40, 30)
    px2 = images._pixels(42, 40, 30)
    assert np.array_equal(px1, px2)
    assert images._encode(px1, "jpeg") == images._encode(px2, "jpeg")
    dec = images._decode(images._encode(px1, "png"), 40, 30)
    assert np.array_equal(px1, dec)


def test_psnr_math():
    px = images._pixels(7, 64, 48)
    dec = images._decode(images._encode(px, "webp"), 64, 48)
    diff = dec.astype(np.float64) - px.astype(np.float64)
    mse = (diff * diff).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 40.0


def test_near_dup_phash_self_pairs(spark, img_df):
    """A jpeg re-encode of the same pixels keeps a small phash distance."""
    a = img_df.limit(0)  # structure probe only; pair logic tested on dupes:
    dup = img_df.limit(50).withColumn("image_id", F.concat(F.lit("dup-"), "image_id"))
    both = img_df.limit(50).unionByName(dup)
    pairs = images.near_dup_images_by_phash(both, max_dist=0)
    # every original must pair with its duplicate at distance 0
    assert pairs.count() >= 50


def test_codec_roundtrip_fused(spark):
    """Fused single-stage codec job: every row passes the PSNR>=40dB gate,
    png rows are lossless, and psnr/phash agree with the chained
    generate->validate path on the same ids."""
    v = images.codec_roundtrip_virtual(spark, 300)
    rows = {r.image_id: r for r in v.collect()}
    assert len(rows) == 300
    assert all(r.psnr_mdb >= 40_000 for r in rows.values())
    assert all(r.lossless_ok for r in rows.values())
    gen = {r.image_id: r for r in images.generate_images_virtual(spark, 300).collect()}
    chained = images.validate_images(images.generate_images_virtual(spark, 300))
    for r in chained.collect():
        f = rows[r.image_id]
        assert (f.psnr_mdb, f.lossless_ok) == (r.psnr_mdb, r.lossless_ok)
        assert f.phash == gen[r.image_id].phash  # same decoded-pixel hash


def test_near_dup_phash_recall_across_bands(spark):
    """Pigeonhole banding (max_dist+1 bands) must find a pair whose
    differing bits land in DIFFERENT 16-bit quarters — the old fixed 4-band
    join missed any pair with >= 1 differing bit per band (regression)."""
    # distance 4: one bit flipped in each 16-bit quarter
    a = 0x0123456789ABCDEF
    b = a ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    df = spark.createDataFrame(
        [("ia", a - (1 << 64) if a >= 1 << 63 else a),
         ("ib", b - (1 << 64) if b >= 1 << 63 else b)],
        "image_id STRING, phash LONG",
    )
    pairs = images.near_dup_images_by_phash(df, max_dist=6).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 4


def test_caption_words_ascii_whitespace_only():
    """caption_words must match Java \\s (the Spark rederivation in the
    pipeline): U+00A0 is NOT a separator on either side."""
    assert images.caption_words("foo bar baz") == ["foo bar", "baz"]
    assert images.caption_words("  a\tb\nc  ") == ["a", "b", "c"]
    assert images.caption_words(None) == []


def test_ref_caption_col_matches_caption_words(spark):
    """The Spark re-derivation (images.ref_caption_col) must agree
    byte-for-byte with the generator's caption_words on adversarial
    whitespace: LEADING/trailing Unicode whitespace stays in the word on
    both sides (regression: Python .strip() removed U+00A0 while the Java
    regex could not)."""
    texts = [
        "plain words here and more tokens to fill the caption up fully",
        " leading nbsp word stays attached here ok right now yes sir",
        "trailing nbsp  inner joined word more pad pad pad pad pad",
        "  \t mixed\nascii\x0bws \f everywhere \r done pad pad pad pad",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [
        r["c"]
        for r in df.select(
            images.ref_caption_col(F.col("text")).alias("c")
        ).collect()
    ]
    expect = [
        " ".join(images.caption_words(t)[: images.CAPTION_WORDS])
        for t in texts
    ]
    assert got == expect


def test_near_dup_banding_differential_vs_bruteforce(spark):
    """Randomized differential: the banded operator's pair set must equal
    the O(n^2) brute-force hamming pair set EXACTLY (both directions: no
    missed pairs = the pigeonhole recall claim, no extra pairs = the
    verify stage), across max_dist 0/3/6 on clustered random phashes."""
    import itertools

    import numpy as np

    rng = np.random.default_rng(42)
    # 40 cluster centers, 2-3 members each perturbed by 0-4 random bit flips
    vals = []
    for c in range(40):
        center = int(rng.integers(0, 1 << 63, dtype=np.int64))
        for m in range(int(rng.integers(2, 4))):
            v = center
            for b in rng.choice(64, size=int(rng.integers(0, 5)), replace=False):
                v ^= 1 << int(b)
            vals.append(v - (1 << 64) if v >= (1 << 63) else v)
    ids = [f"p{i:03d}" for i in range(len(vals))]
    df = spark.createDataFrame(
        list(zip(ids, vals)), "image_id string, phash long"
    )
    for max_dist in (0, 3, 6):
        want = set()
        for (ia, va), (ib, vb) in itertools.combinations(zip(ids, vals), 2):
            d = bin((va ^ vb) & ((1 << 64) - 1)).count("1")
            if d <= max_dist:
                want.add((min(ia, ib), max(ia, ib), d))
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in images.near_dup_images_by_phash(df, max_dist=max_dist).collect()
        }
        assert got == want, f"max_dist={max_dist}: {got ^ want}"


def test_near_dup_bucket_cap_bounds_degenerate_buckets(spark):
    """20 identical phashes with max_bucket_size=5: every band bucket keeps
    the 5 lowest ids, so exactly C(5,2)=10 pairs survive (the degenerate
    O(n^2) blowup is bounded); uncapped returns all C(20,2)=190."""
    df = spark.createDataFrame(
        [(f"p{i:02d}", 12345) for i in range(20)], "image_id string, phash long"
    )
    capped = images.near_dup_images_by_phash(df, max_dist=6, max_bucket_size=5)
    rows = capped.collect()
    assert len(rows) == 10
    kept_ids = {r["id_a"] for r in rows} | {r["id_b"] for r in rows}
    assert kept_ids == {f"p{i:02d}" for i in range(5)}
    assert all(r["hamming"] == 0 for r in rows)
    full = images.near_dup_images_by_phash(df, max_dist=6, max_bucket_size=None)
    assert full.count() == 190
