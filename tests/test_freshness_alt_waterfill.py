"""cache_freshness precedence, alt-text classes, and a randomized
water-filling differential against a sequential reference."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.mmcurate import classify_alt_text
from crawlspark.scheduler import waterfill_budgets
from crawlspark.sinks import cache_freshness


def _fresh_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, cache_control string, expires_ts long, date_ts long, "
        "last_modified_ts long, age_s long, response_ts long",
    )


def test_cache_freshness_precedence(spark):
    now = 2000
    rows = _fresh_rows(spark, [
        # s-maxage=50 beats max-age=500: age 100 >= 50 -> stale
        (1, "s-maxage=50, max-age=500", None, 1900, None, 0, 1900),
        # max-age=500 alone: age 100 < 500 -> fresh
        (2, "max-age=500", None, 1900, None, 0, 1900),
        # no-store wins over everything
        (3, "no-store, max-age=999", None, 1900, None, 0, 1900),
        # no-cache -> must_revalidate
        (4, "no-cache", None, 1900, None, 0, 1900),
        # Expires - Date = 300, age 100 -> fresh
        (5, None, 2200, 1900, None, 0, 1900),
        # heuristic: (date-lm)/10 = 100, age 100 -> heuristic_stale
        (6, None, None, 1900, 900, 0, 1900),
        # heuristic fresh: lifetime 500, age 100
        (7, None, None, 1900, -3100, 0, 1900),
        # nothing -> stale, lifetime 0
        (8, None, None, 1900, None, None, 1900),
        # Age header adds to resident time: 450 + 100 >= 500 -> stale
        (9, "max-age=500", None, 1900, None, 450, 1900),
    ])
    got = {r["doc_id"]: (r["cache_state"], r["freshness_lifetime_s"])
           for r in cache_freshness(rows, now_ts=now).collect()}
    assert got[1] == ("stale", 50)
    assert got[2] == ("fresh", 500)
    assert got[3][0] == "uncacheable"
    assert got[4][0] == "must_revalidate"
    assert got[5] == ("fresh", 300)
    assert got[6] == ("heuristic_stale", 100)
    assert got[7] == ("heuristic_fresh", 500)
    assert got[8] == ("stale", 0)
    assert got[9] == ("stale", 500)


def test_alt_text_edge_cases(spark):
    cases = [
        ("DSC 123", "filename"),
        ("holiday.jpeg", "filename"),
        ("WWW.example.com", "url"),
        ("3,141 59!", "numeric"),
        ("", "too_short"),
        ("  a b ", "too_short"),      # 2 non-space chars
        ("Icon", "placeholder"),
        ("iconography of the middle ages", "ok"),  # not a LONE word
        ("photo of a red barn", "ok"),
        (None, "too_short"),
        # non-Latin scripts are real captions, never 'numeric' junk
        ("北京の写真", "ok"),
        ("Привет мир и солнце", "ok"),
        ("صورة جميلة", "ok"),
        ("१२३४", "numeric"),  # Devanagari digits: still no letters
    ]
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(cases)], ["i", "cap"]
    ).select("i", classify_alt_text(F.col("cap")).alias("cls"))
    got = {r["i"]: r["cls"] for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i], got[i])


def _waterfill_ref(demands: dict[str, int], budget: int) -> dict[str, int]:
    """Sequential max-min fairness with the same integer floor rule."""
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    incl = 0
    k, sk = 0, 0
    run = 0
    for i, (_, d) in enumerate(items, start=1):
        run += d
        if run + (n - i) * d <= budget:
            k, sk = i, run
    if k == n:
        return dict(items)
    level = (budget - sk) // (n - k)
    out = {}
    for i, (h, d) in enumerate(items, start=1):
        out[h] = d if i <= k else min(d, level)
    return out


def test_waterfill_differential(spark):
    import random

    rng = random.Random(7)
    for trial in range(5):
        demands = {f"h{i}": rng.randrange(1, 500) for i in range(30)}
        budget = rng.randrange(100, sum(demands.values()) + 500)
        df = spark.createDataFrame(
            list(demands.items()), ["host", "demand"]
        )
        got = {r["host"]: r["granted"]
               for r in waterfill_budgets(df, total_budget=budget).collect()}
        want = _waterfill_ref(demands, budget)
        assert got == want, (trial, budget)
        assert sum(got.values()) <= budget or sum(demands.values()) <= budget


def test_waterfill_budget_exceeds_demand(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], ["host", "demand"]
    )
    got = {r["host"]: (r["granted"], r["saturated"])
           for r in waterfill_budgets(df, total_budget=1000).collect()}
    assert got == {"a": (10, 0), "b": (20, 0), "c": (30, 0)}


def test_stale_policy_windows(spark):
    from crawlspark.sinks import stale_policy

    def row(i, cc, age):
        return (i, cc, None, 1000, None, age, 1000)

    rows = _fresh_rows(spark, [
        row(1, "max-age=100, stale-while-revalidate=60", 50),    # fresh
        row(2, "max-age=100, stale-while-revalidate=60", 120),   # swr window
        row(3, "max-age=100, stale-while-revalidate=60", 160),   # past swr
        row(4, "max-age=100, stale-if-error=500", 400),          # sie window
        row(5, "max-age=100", 100),                              # expired
        row(6, "no-store, stale-if-error=500", 0),               # uncacheable
    ])
    got = {r["doc_id"]: r["stale_state"]
           for r in stale_policy(rows, now_ts=1000).collect()}
    assert got == {1: "fresh", 2: "stale_serve_revalidate", 3: "expired",
                   4: "stale_if_error_only", 5: "expired",
                   6: "uncacheable"}


def test_png_color_profile_headers(spark):
    import struct

    from crawlspark.images import png_color_profile

    def png(depth, ctype, inter):
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", 32, 24)
                + bytes([depth, ctype, 0, 0, inter]))

    cases = [
        (0, png(8, 3, 0), 8, "palette", 0),
        (1, png(16, 6, 1), 16, "truecolor_alpha", 1),
        (2, png(8, 7, 0), 8, "invalid", 0),   # spec-invalid color type
        (3, b"GIF89a\x20\x00", None, None, None),
        (4, png(8, 0, 0)[:20], None, None, None),  # truncated IHDR
    ]
    df = spark.createDataFrame([(i, b) for i, b, *_ in cases], ["i", "bytes"])
    got = {r["i"]: (r["png_bit_depth"], r["png_color_type"],
                    r["png_interlaced"])
           for r in png_color_profile(df).collect()}
    for i, _, d, c, it in cases:
        assert got[i] == (d, c, it), (i, got[i])
