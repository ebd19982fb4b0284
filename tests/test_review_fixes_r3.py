"""Regression tests for the round-3 review findings: degenerate inputs
that previously crashed a job (ANSI overflow / out-of-bounds / divide by
zero) or silently misclassified (case-sensitive matching)."""

from pyspark.sql import functions as F


def test_shingles_short_doc_empty_not_crash(spark):
    from crawlspark.textops.dedup import ngram_containment_pairs, shingles

    df = spark.createDataFrame(
        [(0, "only two"), (1, "w0 w1 w2 w3"), (2, "")],
        "doc_id long, text string",
    )
    # short docs yield EMPTY shingle arrays (previously: descending
    # sequence -> element_at out of bounds under ANSI)
    sizes = (
        df.select(F.size(shingles(F.split("text", " "), 3)).alias("n"))
        .orderBy("n").collect()
    )
    assert [r.n for r in sizes] == [0, 0, 2]
    # and the containment pair join runs without aborting
    assert ngram_containment_pairs(df, n=3).count() == 0


def test_accept_negotiation_case_insensitive(spark):
    from crawlspark.fetch import accept_negotiation

    df = spark.createDataFrame(
        [("Image/Webp,*/*;q=0.1",), ("image/avif;Q=0.5,image/webp;q=0.4",)],
        "accept string",
    )
    out = accept_negotiation(
        df, available=["image/avif", "image/webp", "image/jpeg"]
    ).collect()
    # RFC 9110: media types and parameter names are case-insensitive
    assert (out[0].chosen_type, out[0].chosen_q_millis) == ("image/webp", 1000)
    assert (out[1].chosen_type, out[1].chosen_q_millis) == ("image/avif", 500)


def test_kmv_hash_64bit_keys_no_overflow(spark):
    from crawlspark.sketch import KMV_A, KMV_B, _P, kmv_hash

    keys = [0, 1, 2**31 - 1, 2**31, 9_000_000_000, 2**62, -5, -(2**40)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.h for r in df.select("k", kmv_hash(F.col("k")).alias("h")).collect()}
    for k in keys:
        assert got[k] == (KMV_A * k + KMV_B) % _P, k  # exact math, Python bigint


def test_cms_bucket_64bit_keys_no_overflow(spark):
    from crawlspark.sketch import cms_build

    df = spark.createDataFrame(
        [(9_000_000_000,), (2**62,), (7,)], "host_key long"
    )
    cells = cms_build(df, "host_key", depth=3, width=64).collect()
    assert sum(r.cnt for r in cells) == 9
    assert all(0 <= r.bucket < 64 for r in cells)


def test_path_templates_fold_uppercase_ids(spark):
    from crawlspark.canon import mine_path_templates

    urls = [
        "https://ex.test/session/FEDCBA9876543210FF",
        "https://ex.test/session/fedcba9876543210aa",
        "https://ex.test/u/01234567-89AB-CDEF-0123-456789ABCDEF",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): r["n_urls"]
        for r in mine_path_templates(df, min_count=2).collect()
    }
    assert got[("ex.test", "/session/{hex}")] == 2
    assert got[("ex.test", "/u/{uuid}")] == 1


def test_bmp_coreheader_u16_dims(spark):
    from crawlspark.images import sniff_header_dims

    def le(v, nbytes):
        return v.to_bytes(nbytes, "little")

    # OS/2 BITMAPCOREHEADER: 14-byte file header + size=12 DIB, u16 dims
    core = b"BM" + le(100, 4) + le(0, 4) + le(26, 4) + le(12, 4) \
        + le(100, 2) + le(100, 2) + le(1, 2) + le(24, 2)
    # BITMAPINFOHEADER: size=40 DIB, i32 dims, negative height = top-down
    info = b"BM" + le(200, 4) + le(0, 4) + le(54, 4) + le(40, 4) \
        + le(640, 4) + (-480).to_bytes(4, "little", signed=True) + bytes(28)
    df = spark.createDataFrame(
        [("core", bytearray(core), 100, 100),
         ("info", bytearray(info), 640, 480)],
        "image_id string, bytes binary, w long, h long",
    )
    out = {r.image_id: r for r in sniff_header_dims(df).collect()}
    assert (out["core"].sniff_w, out["core"].sniff_h) == (100, 100)
    assert out["core"].bmp_topdown is False and out["core"].dim_lie is False
    assert (out["info"].sniff_w, out["info"].sniff_h) == (640, 480)
    assert out["info"].bmp_topdown is True and out["info"].dim_lie is False


def test_quota_apportionment_all_zero_weights(spark):
    from crawlspark.scheduler import quota_apportionment

    df = spark.createDataFrame([(i, 0) for i in range(3)],
                               "stratum long, weight long")
    out = quota_apportionment(df, total=5)
    rows = {r.stratum: r.quota for r in out.collect()}
    # degrades to rank-ordered +1s instead of ANSI DIVIDE_BY_ZERO
    assert rows == {0: 1, 1: 1, 2: 1}


def test_latency_buckets_negative_clamped(spark):
    from crawlspark.politeness import latency_histogram

    df = spark.createDataFrame(
        [("h", -5), ("h", 3), ("h", 3), ("h", 40)],
        "host string, latency_ms long",
    )
    out = latency_histogram(df, quantile_pct=50).collect()[0]
    # the negative sample lands in [0, 0]; the median is in the 3s bucket
    assert out.n_samples == 4
    assert (out.q_lb_ms, out.q_ub_ms) == (3, 3)


def test_hits_zero_mass_yields_zeros_not_crash(spark):
    from crawlspark.linkgraph import hits

    # a single edge whose mass floors to zero under an enormous scale
    # divisor cannot happen here, so force the degenerate path directly:
    # scale=0 floors every a/h to 0 after one normalization, making the
    # NEXT iteration's total 0 — must degrade to zeros, never
    # ANSI DIVIDE_BY_ZERO
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    out = hits(spark, n=2, iters=2, edges_df=edges, scale=0).collect()
    assert len(out) == 2 and all(r.auth_scaled == 0 for r in out)


def test_resize_plan_zero_dims_no_crash(spark):
    from crawlspark.mmcurate import resize_plan

    df = spark.createDataFrame(
        [("a", 0, 0), ("b", 1024, 512)], "image_id string, w int, h int"
    )
    out = {r.image_id: r for r in resize_plan(df).collect()}
    # corrupt 0x0 metadata completes (short side floored to the grid
    # minimum) instead of dying with DIVIDE_BY_ZERO
    assert out["a"].out_h == 64 and out["a"].mode == "up"
    assert (out["b"].out_w, out["b"].out_h) == (512, 256)
