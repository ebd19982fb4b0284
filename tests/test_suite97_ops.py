"""Tests for the AI-agents robots matrix and CSV type inference."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_ai_agents_partial_paths_and_custom_bots(spark):
    from crawlspark.robots import ai_agents_policy

    robots = spark.createDataFrame([
        # root allowed but a subtree blocked: the ROOT verdict is what
        # the matrix reports -> allowed
        Row(host="a", body="User-agent: GPTBot\nDisallow: /private/"),
        # blanket block for everyone incl. AI bots
        Row(host="b", body="User-agent: *\nDisallow: /"),
        # empty robots -> everything allowed
        Row(host="c", body=""),
    ])
    out = {r.host: r for r in ai_agents_policy(
        robots, bots=["GPTBot", "CCBot"]).collect()}
    assert out["a"].gptbot_allowed is True
    assert out["a"].n_ai_blocked == 0
    assert out["b"].gptbot_allowed is False
    assert out["b"].ccbot_allowed is False
    assert out["b"].n_ai_blocked == 2
    assert out["c"].gptbot_allowed is True and out["c"].n_ai_blocked == 0


def test_csv_type_sniff_edges(spark):
    from crawlspark.steps import csv_type_sniff

    cases = [
        # negative ints, decimal promotion when one value has a dot
        ("a,b\n-1,2\n3,4.5", [("a", "int"), ("b", "decimal")]),
        # all-empty column -> 'empty'; date col
        ("d,e\n2026-01-01,\n2026-12-31,", [("d", "date"), ("e", "empty")]),
        # header only -> zero-value columns
        ("x,y", [("x", "empty"), ("y", "empty")]),
        # whitespace-padded cells trimmed before typing
        ("n\n 7 \n  8", [("n", "int")]),
    ]
    df = spark.createDataFrame(
        [Row(i=i, t=t) for i, (t, _) in enumerate(cases)],
        "i int, t string")
    out = {}
    rows = df.select(
        "i", F.posexplode(csv_type_sniff(F.col("t"))).alias("j", "c")
    ).select("i", "j", "c.*").collect()
    for r in rows:
        out.setdefault(r.i, []).append((r.col_name, r.inferred))
    for i, (t, expect) in enumerate(cases):
        assert out[i] == expect, (i, t, out[i])
