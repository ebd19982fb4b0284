"""Edge cases for the round-3 quality/planning operators beyond the
constructed gate families."""

from __future__ import annotations

import math

from crawlspark.extract import mixed_content_audit
from crawlspark.images import STD_LUMA_QT, jpeg_dqt_quality
from crawlspark.seen import bloom_partition_plan
from crawlspark.textops.dedup import lsh_band_plan


def _jpeg_with_dqt(tables: list[tuple[int, int, list[int]]]) -> bytes:
    """SOI + one DQT segment holding the given (pq, tq, values) tables."""
    payload = b""
    for pq, tq, vals in tables:
        step = 2 if pq else 1
        payload += bytes([pq << 4 | tq])
        for v in vals:
            payload += v.to_bytes(step, "big")
    seg = b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload
    return b"\xff\xd8" + seg + b"\xff\xd9"


def test_jpeg_dqt_quality_chroma_first_and_16bit(spark):
    # table order must not matter, and a 16-bit (Pq=1) Tq=0 table must
    # NOT be mistaken for the 8-bit luminance table
    chroma = [99] * 64
    luma = list(STD_LUMA_QT)  # scale 100 -> quality 50
    good = _jpeg_with_dqt([(0, 1, chroma), (0, 0, luma)])
    hi_prec = _jpeg_with_dqt([(1, 0, [300] * 64)])
    not_jpeg = b"\x89PNG\r\n"
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(hi_prec)),
         (2, bytearray(not_jpeg))],
        "doc_id long, bytes binary")
    out = {r.doc_id: r for r in jpeg_dqt_quality(df).collect()}
    assert out[0].dqt_tables == 2
    assert out[0].dqt_sum == sum(STD_LUMA_QT)
    assert out[0].jpeg_scale_est == 100
    assert out[0].jpeg_quality_est == 50
    assert out[1].dqt_sum is None and out[1].dqt_tables == 1
    assert out[2].dqt_sum is None and out[2].dqt_tables is None


def test_jpeg_dqt_quality_low_q_branch(spark):
    # scale > 100 exercises the 5000/scale inverse (q < 50)
    scale = 500  # q = 10
    vals = [max(1, min(255, (b * scale + 50) // 100)) for b in STD_LUMA_QT]
    df = spark.createDataFrame(
        [(0, bytearray(_jpeg_with_dqt([(0, 0, vals)])))],
        "doc_id long, bytes binary")
    row = jpeg_dqt_quality(df).collect()[0]
    # clamping at 255 pulls the estimated scale below the planted 500,
    # but the estimator arithmetic must match the table it actually saw
    sc = (100 * sum(vals) + 1844) // 3688
    assert sc > 100
    assert row.jpeg_scale_est == sc
    assert row.jpeg_quality_est == (5000 + sc // 2) // sc


def test_lsh_band_plan_matches_bruteforce(spark):
    ts = spark.createDataFrame([(500,), (850,)], "t_permille long")
    got = {r.t_permille: r for r in lsh_band_plan(ts, 128).collect()}

    def brute(t):
        best = None
        for b in (1, 2, 4, 8, 16, 32, 64, 128):
            r = 128 // b
            lo, hi = max(0.0, (t - 100) / 1e3), min(1.0, (t + 100) / 1e3)
            p = lambda s: 1 - (1 - s ** r) ** b
            score = round(1e6 * (p(lo) + 1 - p(hi)))
            if best is None or (score, b) < best[:2]:
                best = (score, b, r)
        return best

    for t in (500, 850):
        score, b, r = brute(t)
        assert (got[t].bands, got[t].rows_per_band) == (b, r)
        assert got[t].score_micro == score
        assert got[t].thr_est_permille == round(
            1000 * (1 / b) ** (1 / r))


def test_mixed_content_http_page_and_protocol_relative(spark):
    pages = spark.createDataFrame(
        [
            (0, "http://a/p",
             '<script src="http://x/j.js"></script>'),  # not secure: clean
            (1, "https://a/p",
             '<img src="//cdn/pic.jpg"><img src="HTTP://up/1.png">'),
        ],
        "doc_id long, url string, body string")
    out = {r.doc_id: r for r in mixed_content_audit(pages).collect()}
    assert out[0].n_blockable == 0 and out[0].n_upgradable == 0
    # protocol-relative is NOT mixed content; scheme match is
    # case-insensitive per RFC 3986
    assert out[1].n_blockable == 0
    assert out[1].n_upgradable == 1
    assert out[1].upgraded == ["https://up/1.png"]


def test_bloom_partition_plan_formulas(spark):
    counts = spark.createDataFrame([(0, 1000)], "bucket long, n_keys long")
    row = bloom_partition_plan(counts, fpp_micro=10000).collect()[0]
    m = math.ceil(-1000 * math.log(0.01) / math.log(2) ** 2)
    k = max(1, round(m / 1000 * math.log(2)))
    assert row.m_bits == m and row.k_hashes == k
    assert row.m_bytes == (m + 7) // 8
    # achieved fpp should be at or under ~1.05x the 1% target
    assert row.fpp_achieved_micro <= 10500
