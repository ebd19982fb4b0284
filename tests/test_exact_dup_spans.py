"""Randomized differential for SA-based ExactSubstr spans vs a pure
python brute-force implementation of the same definition."""

import random

from pyspark.sql import Row


def _brute_spans(docs, k):
    """Brute ExactSubstr with the SAME definition: build the sentinel
    stream, sort all suffixes, adjacent lcp >= k -> both intervals,
    merge per doc (touching intervals merge)."""
    stream = []  # (doc, tok_idx or None, token)
    for d, text in docs:
        toks = text.split()
        for i, t in enumerate(toks):
            stream.append((d, i + 1, t))
        stream.append((d, None, f"⟂{d}"))
    n = len(stream)
    toks = [s[2] for s in stream]
    sa = sorted(range(n), key=lambda p: (toks[p:], p))
    ivals = {}
    for i in range(n - 1):
        a, b = sa[i], sa[i + 1]
        l = 0
        while (a + l < n and b + l < n and toks[a + l] == toks[b + l]):
            l += 1
        if l >= k:
            for p in (a, b):
                d, idx, _ = stream[p]
                ivals.setdefault(d, set()).add((idx, idx + l))
    out = set()
    for d, vs in ivals.items():
        cur_s = cur_e = None
        for s, e in sorted(vs):
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s > cur_e:
                out.add((d, cur_s, cur_e, cur_e - cur_s))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_s is not None:
            out.add((d, cur_s, cur_e, cur_e - cur_s))
    return out


def test_exact_dup_spans_randomized(spark):
    from crawlspark.textops.sa import exact_dup_spans

    rnd = random.Random(13)
    vocab = [f"w{j}" for j in range(6)]  # tiny vocab -> organic repeats
    docs = []
    for d in range(12):
        n = rnd.randrange(6, 18)
        docs.append((d, " ".join(rnd.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    got = set(map(tuple, exact_dup_spans(df, k=5).collect()))
    assert got == _brute_spans(docs, 5)


def test_exact_dup_spans_no_cross_doc_bleed(spark):
    """A run split across a doc boundary must NOT match: sentinels cut
    every cross-boundary prefix."""
    from crawlspark.textops.sa import exact_dup_spans

    docs = [
        (0, "a b c d e f g h"),
        (1, "a b c d"),           # only a 4-prefix of doc 0
        (2, "e f g h"),           # only the 4-suffix
    ]
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in docs])
    # k=8 would need the full concatenation of docs 1+2 -> must be empty
    assert exact_dup_spans(df, k=8).count() == 0
    got = set(map(tuple, exact_dup_spans(df, k=4).collect()))
    assert got == _brute_spans(docs, 4)
