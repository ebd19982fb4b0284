"""Tests for Luhn card audit, Unicode hygiene, AI-provenance sniff."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F


def _luhn_py(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 0:
            total += d
        else:
            total += d * 2 - 9 if d * 2 > 9 else d * 2
    return total % 10 == 0


def test_luhn_differential_random_runs(spark):
    from crawlspark.textops.curate import luhn_cc_audit

    rnd = random.Random(4242)
    rows = []
    expect = {}
    for i in range(60):
        n = rnd.randrange(13, 20)
        run = "".join(str(rnd.randrange(10)) for _ in range(n))
        rows.append(Row(doc_id=i, text=f"id {run} end"))
        expect[i] = (1, 1 if _luhn_py(run) else 0,
                     run[-4:] if _luhn_py(run) else None)
    df = spark.createDataFrame(rows)
    got = {r.doc_id: (r.n_candidates, r.n_luhn_valid, r.first_valid_last4)
           for r in luhn_cc_audit(df).collect()}
    assert got == expect


def test_luhn_embedded_and_multiple(spark):
    from crawlspark.textops.curate import luhn_cc_audit

    rows = [
        # 20-digit run: no candidate (too long, lookarounds block subruns)
        Row(doc_id=0, text="x 41111111111111110000 y"),
        # two valid cards -> first one's last4 reported
        Row(doc_id=1,
            text="a 4111111111111111 b 378282246310005 c"),
        # valid card glued to letters still matches
        Row(doc_id=2, text="cc:4111111111111111."),
    ]
    out = {r.doc_id: r for r in
           luhn_cc_audit(spark.createDataFrame(rows)).collect()}
    assert out[0].n_candidates == 0 and out[0].n_luhn_valid == 0
    assert out[1].n_candidates == 2 and out[1].n_luhn_valid == 2
    assert out[1].first_valid_last4 == "1111"
    assert out[2].n_luhn_valid == 1


def test_unicode_hygiene_mixed_doc(spark):
    from crawlspark.textops.curate import unicode_hygiene

    text = "a\u200b\u202e\u00adb\u0301c\ufeff"
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    r = unicode_hygiene(df).collect()[0]
    assert r.n_zero_width == 2      # 200B + FEFF
    assert r.n_bidi == 1
    assert r.n_soft_hyphen == 1
    assert r.n_combining == 1
    assert r.scrubbed == "ab\u0301c"  # combining mark preserved
    assert r.len_raw == 8 and r.len_scrubbed == 4


def test_ai_provenance_matrix(spark):
    from crawlspark.images import ai_provenance_sniff

    png = "\x89PNG\r\n\x1a\n"
    jpg = "\xff\xd8"
    cases = [
        # c2pa needs the right container: bare text with the strings -> no
        ("random jumb c2pa text", False, None),
        # JPEG needs APP11 too, not just the strings
        (jpg + "jumb c2pa no-app11", False, None),
        (jpg + "\xff\xebzz jumb c2pa", True, None),
        (png + "caBX", True, None),
        # tool priority: Stable Diffusion outranks NovelAI when both occur
        (png + "NovelAI and Stable Diffusion", False, "stable-diffusion"),
        (jpg + "made with DALL·E", False, "dall-e"),
        (jpg + "Adobe Firefly output", False, "firefly"),
    ]
    df = spark.createDataFrame(
        [Row(i=i, s=s) for i, (s, *_) in enumerate(cases)],
        "i int, s string",
    ).select("i", F.encode(F.col("s"), "ISO-8859-1").alias("bytes"))
    out = {r.i: r for r in ai_provenance_sniff(df).collect()}
    for i, (s, c2pa, tool) in enumerate(cases):
        assert out[i].has_c2pa == c2pa, (i, s)
        assert out[i].gen_tool == tool, (i, s, out[i].gen_tool)
        assert out[i].ai_flagged == (tool is not None), (i, s)
