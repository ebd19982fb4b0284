"""Tests for gibberish signals and noscript share."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_gibberish_differential_python(spark):
    from crawlspark.textops.quality import gibberish_signals

    texts = [
        "perfectly normal sentence with words",
        "qqqqqqqqqqqqqqqqqqqqqq",        # consonant wall, 0 vowels
        "aaaaaaaaaaaaaaaaaaaaaa",        # all vowels -> vp 1000 > 600
        "ASDF GHJKL asdf ghjkl ASDF",    # case-folded home row
        "123 !!! ???",                   # no letters at all
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r.doc_id: r for r in gibberish_signals(df).collect()}
    for i, t in enumerate(texts):
        letters = "".join(c for c in t.lower() if c.isalpha())
        n = len(letters)
        v = sum(1 for c in letters if c in "aeiou")
        h = sum(1 for c in letters if c in "asdfghjkl")
        run = best = 0
        for c in letters:
            run = run + 1 if c not in "aeiou" else 0
            best = max(best, run)
        r = out[i]
        assert r.n_letters == n, (i, t)
        assert r.max_consonant_run == best, (i, t)
        assert r.vowel_permille == ((1000 * v) // n if n else 0)
        assert r.homerow_permille == ((1000 * h) // n if n else 0)
        expect_susp = n >= 20 and (
            best >= 8 or (1000 * v) // n < 250
            or (1000 * v) // n > 600 or (1000 * h) // n >= 700)
        assert r.suspicious == expect_susp, (i, t)
    assert out[1].suspicious is True
    assert out[2].suspicious is True
    assert out[4].suspicious is False


def test_noscript_multi_block_and_case(spark):
    from crawlspark.extract import noscript_share

    html = ("<NOSCRIPT>abc</NOSCRIPT><p>x</p>"
            "<noscript attr='1'>defgh</noscript>")
    df = spark.createDataFrame([Row(i=0, h=html)])
    r = df.select(noscript_share(F.col("h")).alias("n")) \
        .select("n.*").collect()[0]
    assert r.n_noscript == 2
    assert r.noscript_chars == 8
    assert r.share_permille == (8 * 1000) // len(html)
