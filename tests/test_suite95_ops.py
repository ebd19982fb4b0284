"""Tests for Content-Disposition, CSP audit, dehyphenation edges."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_content_disposition_edges(spark):
    from crawlspark.fetch import content_disposition_info

    cases = [
        # ext-value WINS over plain filename when both present (RFC 6266 §4.3)
        ('attachment; filename="fallback.txt"; '
         "filename*=utf-8''r%C3%A9sum%C3%A9.pdf",
         "attachment", "résumé.pdf", True),
        # language tag in the ext-value
        ("attachment; filename*=UTF-8'en'plan.pdf",
         "attachment", "plan.pdf", True),
        ("form-data; name=x; filename=a.bin", "form-data", "a.bin", False),
        (None, None, None, False),
        # uppercase type normalized
        ('ATTACHMENT; FILENAME="A.TXT"', "attachment", "A.TXT", False),
    ]
    df = spark.createDataFrame(
        [Row(i=i, v=v) for i, (v, *_) in enumerate(cases)],
        "i int, v string")
    out = {r.i: r for r in df.select(
        "i", content_disposition_info(F.col("v")).alias("c")).select(
        "i", "c.*").collect()}
    for i, (v, t, fn, ext) in enumerate(cases):
        assert out[i].disp_type == t, (i, v)
        assert out[i].filename == fn, (i, v, out[i].filename)
        assert out[i].from_ext_value == ext, (i, v)


def test_csp_script_src_overrides_default(spark):
    from crawlspark.fetch import csp_audit

    cases = [
        # unsafe-inline only in default-src, but script-src present ->
        # script-effective policy is script-src: NOT flagged
        ("default-src 'unsafe-inline'; script-src 'self'",
         2, True, False, False, False),
        # no script-src -> default-src governs
        ("default-src 'unsafe-inline'", 1, True, True, False, False),
        # wildcard must be a bare token, not a substring of *.example.com
        ("script-src *.example.com", 1, False, False, False, False),
        ("script-src * ", 1, False, False, False, True),
    ]
    df = spark.createDataFrame(
        [Row(i=i, v=v) for i, (v, *_) in enumerate(cases)],
        "i int, v string")
    out = {r.i: r for r in df.select(
        "i", csp_audit(F.col("v")).alias("c")).select("i", "c.*").collect()}
    for i, (v, n, dflt, inline, ev, wc) in enumerate(cases):
        r = out[i]
        assert (r.n_directives, r.has_default_src, r.unsafe_inline,
                r.unsafe_eval, r.wildcard_script) == (n, dflt, inline,
                                                     ev, wc), (i, v)


def test_dehyphenate_multiline_and_counts(spark):
    from crawlspark.textops.curate import dehyphenate

    text = "frag-\nment one, frag- \n  ment two, end-\n9 digit"
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    r = dehyphenate(df).collect()[0]
    assert r.n_rejoined == 2
    assert "fragment one" in r.text and "fragment two" in r.text
    # digit after newline: untouched
    assert "end-\n9 digit" in r.text
