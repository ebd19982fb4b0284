"""Suffix-array construction: randomized differential vs brute force,
degenerate inputs, tie-break semantics."""

import random

from pyspark.sql import Row


def _brute(toks):
    order = sorted(range(1, len(toks) + 1),
                   key=lambda p: (toks[p - 1:], p))
    return {p: i + 1 for i, p in enumerate(order)}


def test_sa_randomized_differential(spark):
    from crawlspark.textops.sa import suffix_array

    rnd = random.Random(77)
    for n, vocab in [(30, ["a", "b"]), (120, ["a", "ab", "b", "w1", "w10"])]:
        toks = [rnd.choice(vocab) for _ in range(n)]
        df = spark.createDataFrame(
            [Row(pos=i + 1, token=t) for i, t in enumerate(toks)])
        got = {r.pos: r.sa_rank for r in suffix_array(df, n=n).collect()}
        assert got == _brute(toks), toks


def test_sa_all_identical_tokens(spark):
    """'aaaa...': suffix i is a proper prefix of suffix i-1, so SA order
    is reverse position order — the worst case for doubling rounds."""
    from crawlspark.textops.sa import suffix_array

    n = 17
    df = spark.createDataFrame([Row(pos=i + 1, token="a") for i in range(n)])
    got = {r.pos: r.sa_rank for r in suffix_array(df, n=n).collect()}
    assert got == {p: n - p + 1 for p in range(1, n + 1)}


def test_sa_single_token(spark):
    from crawlspark.textops.sa import suffix_array

    df = spark.createDataFrame([Row(pos=1, token="x")])
    assert suffix_array(df, n=1).collect()[0].sa_rank == 1
