"""Freshness-adaptive re-crawl scheduling."""

from crawlspark.politeness import recrawl_schedule


def _hist(spark, rows):
    return spark.createDataFrame(
        rows, "url string, fetch_ts long, content_hash long"
    )


def test_recrawl_backoff_and_reset(spark):
    rows = (
        # A: static after first fetch -> streak 2 -> 3600 << 2
        [("A", 1000, 7), ("A", 2000, 7), ("A", 3000, 7)]
        # B: changes every fetch -> streak 0 -> min interval
        + [("B", 1000, 1), ("B", 2000, 2), ("B", 3000, 3)]
        # C: changed at the last fetch -> streak 0
        + [("C", 1000, 1), ("C", 2000, 1), ("C", 3000, 9)]
    )
    out = {r["url"]: r for r in recrawl_schedule(_hist(spark, rows)).collect()}
    a = out["A"]
    assert (a["n_changes"], a["unchanged_streak"]) == (1, 2)
    assert a["next_interval_s"] == 3600 << 2
    assert a["next_fetch_ts"] == 3000 + (3600 << 2)
    b = out["B"]
    assert (b["n_changes"], b["unchanged_streak"]) == (3, 0)
    assert b["next_interval_s"] == 3600
    c = out["C"]
    assert (c["n_changes"], c["unchanged_streak"]) == (2, 0)


def test_recrawl_interval_clamps_at_max(spark):
    rows = [("S", 1000 * k, 42) for k in range(1, 14)]  # 12 unchanged
    r = recrawl_schedule(_hist(spark, rows)).collect()[0]
    assert r["unchanged_streak"] == 12
    assert r["next_interval_s"] == 30 * 86400  # 3600<<12 clamped


def test_recrawl_single_fetch_counts_as_change(spark):
    r = recrawl_schedule(_hist(spark, [("X", 5, 1)])).collect()[0]
    assert (r["n_fetches"], r["n_changes"], r["unchanged_streak"]) == (1, 1, 0)
    assert r["next_fetch_ts"] == 5 + 3600
