"""Tests for date-mention extraction edges."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_date_mentions_edges(spark):
    from crawlspark.extract import date_mentions

    cases = [
        # long-form before ISO in text: ISO still wins first_iso
        ("December 31, 2025 then 2026-01-01", 2, "2026-01-01", False),
        # single-digit day zero-padded
        ("May 7, 2024", 1, "2024-05-07", False),
        # 13/01 is day-first unambiguous; 01/13 is month-first
        # unambiguous; neither flags
        ("13/01/2026 and 01/13/2026", 2, None, False),
        # a decimal number must not read as a slash date
        ("ratio 3/4 was fine", 0, None, False),
        (None, 0, None, False),
    ]
    df = spark.createDataFrame(
        [Row(i=i, t=t) for i, (t, *_) in enumerate(cases)],
        "i int, t string")
    out = {r.i: r for r in df.select(
        "i", date_mentions(F.col("t")).alias("d")).select(
        "i", "d.*").collect()}
    for i, (t, n, iso, amb) in enumerate(cases):
        r = out[i]
        assert (r.n_dates, r.first_iso, r.has_ambiguous_dmy) == (
            n, iso, amb), (i, t, r)
