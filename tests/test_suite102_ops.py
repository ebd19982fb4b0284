"""Tests for quantity extraction and scholarly-id detection."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_quantity_longest_unit_and_boundaries(spark):
    from crawlspark.extract import quantity_mentions

    cases = [
        # 'mm' must win over 'm'; 'ms' over 's/m'
        ("gap 5 mm and 20 ms", [(5, "mm", 5), (20, "ms", 20)]),
        # decimal values skipped entirely (no half-match of '5' in 2.5)
        ("2.5 km away", []),
        # number glued to a word is not a quantity
        ("route66 m", []),
        ("km 5", []),  # unit BEFORE number: no match
    ]
    df = spark.createDataFrame(
        [Row(i=i, t=t) for i, (t, _) in enumerate(cases)],
        "i int, t string")
    rows = df.select("i", F.explode_outer(
        quantity_mentions(F.col("t"))).alias("q")).collect()
    got = {}
    for r in rows:
        got.setdefault(r.i, []).append(
            (r.q.value, r.q.unit, r.q.base_milli)
            if r.q is not None else None)
    for i, (t, expect) in enumerate(cases):
        val = [x for x in got[i] if x is not None]
        assert val == expect, (i, t, val)


def test_scholarly_ids_edges(spark):
    from crawlspark.extract import scholarly_ids

    cases = [
        # DOI inside a URL, trailing punctuation excluded from \\s split
        ("https://doi.org/10.5555/12345678 cited", 1,
         "10.5555/12345678", 0),
        # bare 2403.12345 WITHOUT the arXiv: prefix must not match
        ("version 2403.12345 of the doc", 0, None, 0),
        ("arXiv:2201.00001 and arXiv:2201.00002", 0, None, 2),
    ]
    df = spark.createDataFrame(
        [Row(i=i, t=t) for i, (t, *_) in enumerate(cases)],
        "i int, t string")
    out = {r.i: r for r in df.select(
        "i", scholarly_ids(F.col("t")).alias("s")).select(
        "i", "s.*").collect()}
    for i, (t, nd, fd, na) in enumerate(cases):
        assert out[i].n_dois == nd, (i, t)
        assert out[i].first_doi == fd, (i, t, out[i].first_doi)
        assert out[i].n_arxiv == na, (i, t)
