"""Tests for Permissions-Policy and Server-Timing edges."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_permissions_policy_edges(spark):
    from crawlspark.fetch import permissions_policy_audit

    cases = [
        # interest-cohort with a non-empty list is NOT an opt-out
        ("interest-cohort=(self)", 1, False),
        # whitespace inside the empty list still counts as blocked
        ("interest-cohort=( )", 1, True),
        (None, 0, False),
    ]
    df = spark.createDataFrame(
        [Row(i=i, v=v) for i, (v, *_) in enumerate(cases)],
        "i int, v string")
    out = {r.i: r for r in df.select(
        "i", permissions_policy_audit(F.col("v")).alias("p")).select(
        "i", "p.*").collect()}
    for i, (v, n, ic) in enumerate(cases):
        assert out[i].n_directives == n, (i, v)
        assert out[i].interest_cohort_blocked == ic, (i, v)


def test_server_timing_duration_parsing(spark):
    from crawlspark.fetch import server_timing_metrics

    cases = [
        # sub-millisecond fraction beyond 3 digits truncated
        ("fine;dur=0.1239", [("fine", 123, None)]),
        # integer micros exactness at scale
        ("big;dur=86400000", [("big", 86_400_000_000, None)]),
        # malformed entry (leading ;) skipped, valid one kept
        (";dur=5, ok;dur=1", [("ok", 1000, None)]),
    ]
    df = spark.createDataFrame(
        [Row(i=i, v=v) for i, (v, _) in enumerate(cases)],
        "i int, v string")
    rows = df.select("i", F.explode_outer(
        server_timing_metrics(F.col("v"))).alias("e")).collect()
    got = {}
    for r in rows:
        got.setdefault(r.i, []).append(
            (r.e.metric, r.e.dur_micros, r.e.descr)
            if r.e is not None else None)
    for i, (v, expect) in enumerate(cases):
        val = [x for x in got[i] if x is not None]
        assert val == expect, (i, v, val)
