"""LCP binary descent and BWT runs: randomized differentials vs brute
force, plus the textbook banana case."""

import random

from pyspark.sql import Row


def _brute_sa(toks):
    return sorted(range(1, len(toks) + 1), key=lambda p: (toks[p - 1:], p))


def _brute_lcp(toks):
    sa = _brute_sa(toks)
    out = {}
    for i in range(len(sa) - 1):
        a, b = toks[sa[i] - 1:], toks[sa[i + 1] - 1:]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        out[i + 1] = (sa[i], sa[i + 1], l)
    return out


def test_lcp_randomized_differential(spark):
    from crawlspark.textops.sa import lcp_array

    rnd = random.Random(31)
    for n, vocab in [(25, ["a", "b"]), (80, ["a", "b", "c"])]:
        toks = [rnd.choice(vocab) for _ in range(n)]
        df = spark.createDataFrame(
            [Row(pos=i + 1, token=t) for i, t in enumerate(toks)])
        got = {r.sa_rank: (r.pos, r.next_pos, r.lcp)
               for r in lcp_array(df, n=n).collect()}
        assert got == _brute_lcp(toks), toks


def test_lcp_end_boundary(spark):
    """A suffix that ends exactly inside the match: lcp is capped at
    the shorter suffix's length (the padding-rank argument)."""
    from crawlspark.textops.sa import lcp_array

    toks = ["x", "y", "x", "y", "x"]  # suffixes at 1 and 3: lcp 3
    df = spark.createDataFrame(
        [Row(pos=i + 1, token=t) for i, t in enumerate(toks)])
    got = {r.sa_rank: (r.pos, r.next_pos, r.lcp)
           for r in lcp_array(df, n=5).collect()}
    assert got == _brute_lcp(toks)


def test_bwt_banana(spark):
    """Token-level 'banana' (no sentinel, cyclic BWT): verify against a
    direct python rotation... the operator uses suffix (not rotation)
    order, so compare against the same suffix-order construction."""
    from crawlspark.textops.sa import bwt_runs

    toks = list("banana")
    df = spark.createDataFrame(
        [Row(pos=i + 1, token=t) for i, t in enumerate(toks)])
    sa = _brute_sa(toks)
    n = len(toks)
    bwt = [toks[(p - 2) % n] for p in sa]
    runs = 1 + sum(1 for i in range(1, n) if bwt[i] != bwt[i - 1])
    r = bwt_runs(df, n=n).collect()[0]
    assert r.n == n
    assert r.n_runs == runs
    assert r.runs_permille == (1000 * runs) // n
