"""Capacity planner invariants: integer-exact sizing + skew forecast.

The gate checks value parity with DuckDB; these tests check the
PROPERTIES the planner must keep at any scale: ceils are exact, every
byte lands in exactly one bucket, and sorted round-robin never does
worse than the trivial per-group max bound.
"""

import pyspark.sql.functions as F
import pytest

from crawlspark.capacity import (capacity_summary, partition_sizing,
                                 shuffle_skew_forecast)


@pytest.fixture(scope="module")
def load(spark):
    rows = [
        ("hot", 50_000),
        ("hot", 45_000),
        ("mid", 9_000),
        ("mid", 2_500),
        ("small", 900),
        ("tiny", 50),
    ]
    return spark.createDataFrame(rows, "host string, resp_bytes long")


def test_partition_sizing_classes_and_ceil(load):
    out = {
        r["grp"]: r
        for r in partition_sizing(load, "host", "resp_bytes", 12_000).collect()
    }
    assert out["hot"]["total_bytes"] == 95_000
    assert out["hot"]["parts_needed"] == 8  # ceil(95000/12000)
    assert out["hot"]["size_class"] == "split"
    assert out["mid"]["parts_needed"] == 1
    assert out["mid"]["size_class"] == "ok"
    assert out["small"]["size_class"] == "coalesce"
    assert out["tiny"]["parts_needed"] == 1  # never 0


def test_skew_forecast_conserves_bytes_and_bounds(load):
    p = 2
    fore = shuffle_skew_forecast(load, "host", "resp_bytes", p).collect()
    total = sum(r["bucket_bytes"] for r in fore)
    assert total == 107_450
    assert sum(r["n_groups"] for r in fore) == 4
    # rank order: hot(95000)->b0, mid(11500)->b1, small(900)->b0,
    # tiny(50)->b1 — round-robin wraps, so b0 = 95000 + 900.
    by_bucket = {r["bucket"]: r for r in fore}
    assert by_bucket[0]["heaviest_group_bytes"] == 95_000
    assert by_bucket[0]["bucket_bytes"] == 95_900
    assert by_bucket[1]["bucket_bytes"] == 11_550
    # LPT bound: max bucket <= max(heaviest, ideal + heaviest)
    heaviest = 95_000
    ideal = total / p
    assert max(r["bucket_bytes"] for r in fore) <= max(heaviest, ideal + heaviest)


def test_capacity_summary_one_row(load):
    row = capacity_summary(load, "host", "resp_bytes", 12_000, 2).collect()
    assert len(row) == 1
    r = row[0]
    assert r["total_bytes"] == 107_450
    assert r["n_groups"] == 4
    assert r["recommended_shuffle_partitions"] == 9  # ceil(107450/12000)
    assert r["max_bucket_bytes"] == 95_900
    # 95900*100*2 // 107450 = 178
    assert r["max_load_pct_of_ideal"] == 178


def test_window_is_bounded_to_group_aggregate(load):
    """The only window in the forecast runs over |groups| rows (the
    per-host aggregate), never over the data — assert the plan's
    window input is downstream of the partial agg."""
    plan = shuffle_skew_forecast(
        load, "host", "resp_bytes", 4
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the window must sit above a HashAggregate (per-group totals)
    w_idx = plan.index("Window")
    assert "HashAggregate" in plan[w_idx:]
