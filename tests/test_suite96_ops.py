"""Tests for content-kind routing and canary scanning."""

from pyspark.sql import Row


def test_content_kind_tie_and_midline(spark):
    from crawlspark.textops.curate import content_kind_signals

    cases = [
        # turn markers must be at LINE START: midline 'Q:' ignored
        (0, "see FAQ: answers inline", 0, 0, 0, "prose"),
        # tie chat==code -> chat wins (contamination severity order)
        (1, "Q: how\n```\n```", 1, 0, 2, "code"),
        (2, "Q: how\nA: so\n```x```", 2, 0, 2, "chat"),
        (3, "<|im_start|>user hi<|im_start|>bot yo", 2, 0, 0, "chat"),
        (4, None, 0, 0, 0, "prose"),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t, *_ in cases],
        "doc_id long, text string")
    out = {r.doc_id: r for r in content_kind_signals(df).collect()}
    for i, t, turns, math, code, kind in cases:
        r = out[i]
        assert (r.n_turns, r.n_math, r.n_code, r.kind) == (
            turns, math, code, kind), (i, t, r)


def test_canary_scan_regex_metachars_safe(spark):
    """Canary strings with regex metacharacters must be matched
    literally (re.escape), not as patterns."""
    from crawlspark.textops.curate import canary_scan

    canaries = ["EVAL(x*)+[7]", "plain-canary"]
    df = spark.createDataFrame([
        Row(doc_id=0, text="has EVAL(x*)+[7] inside"),
        Row(doc_id=1, text="EVALxxxxxxx7 would match the raw regex"),
        Row(doc_id=2, text="plain-canary"),
    ])
    out = {r.doc_id: r for r in canary_scan(df, canaries).collect()}
    assert out[0].n_canary_hits == 1
    assert out[0].first_canary == "EVAL(x*)+[7]"
    assert out[1].n_canary_hits == 0 and out[1].first_canary is None
    assert out[2].first_canary == "plain-canary"
