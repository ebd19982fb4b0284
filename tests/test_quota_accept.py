"""quota_apportionment exact-total property + accept_negotiation RFC
semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.fetch import accept_negotiation
from crawlspark.scheduler import quota_apportionment


def test_quota_sums_exactly_and_matches_hamilton(spark):
    import random

    rng = random.Random(3)
    for _ in range(4):
        weights = {i: rng.randrange(1, 1000) for i in range(40)}
        total = rng.randrange(50, 50_000)
        df = spark.createDataFrame(
            list(weights.items()), ["stratum", "weight"]
        )
        got = {r["stratum"]: r["quota"]
               for r in quota_apportionment(df, total=total).collect()}
        assert sum(got.values()) == total
        # sequential Hamilton reference
        w = sum(weights.values())
        base = {i: total * v // w for i, v in weights.items()}
        rem = {i: total * v % w for i, v in weights.items()}
        left = total - sum(base.values())
        order = sorted(weights, key=lambda i: (-rem[i], i))
        want = dict(base)
        for i in order[:left]:
            want[i] += 1
        assert got == want


def test_quota_never_off_by_more_than_one_from_proportion(spark):
    df = spark.createDataFrame([(i, 10) for i in range(7)],
                               ["stratum", "weight"])
    got = [r["quota"] for r in quota_apportionment(df, total=100).collect()]
    assert sorted(got) == [14, 14, 14, 14, 14, 15, 15]  # 100/7 apportioned


def _neg(spark, accepts, available):
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(accepts)], ["i", "accept"]
    )
    out = accept_negotiation(df, available)
    return {r["i"]: (r["chosen_type"], r["chosen_q_millis"])
            for r in out.collect()}


def test_accept_negotiation_semantics(spark):
    avail = ["image/avif", "image/webp", "image/jpeg"]
    got = _neg(spark, [
        "image/webp",                         # only webp acceptable
        "*/*",                                # wildcard: server order wins
        "image/jpeg;q=0.5,image/webp;q=0.4",  # q beats server order
        "image/avif;q=0,*/*;q=0.3",           # q=0 excludes avif only
        "text/plain",                         # nothing acceptable
        None,                                 # missing header = */*
        "image/*;q=0.7,image/jpeg;q=0.2",     # exact beats range per variant
    ], avail)
    assert got[0] == ("image/webp", 1000)
    assert got[1] == ("image/avif", 1000)
    assert got[2] == ("image/jpeg", 500)
    assert got[3] == ("image/webp", 300)
    assert got[4] == (None, None)
    assert got[5] == ("image/avif", 1000)
    assert got[6][0] in ("image/avif", "image/webp") and got[6][1] == 700
    assert got[6] == ("image/avif", 700)  # server order among q=700 peers
