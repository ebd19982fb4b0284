"""Edge-case tests for suite76 ops: DPR scaling, stale-allow boundary,
anomaly on constant history, burn on zero errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import srcset_sizes_select
from crawlspark.fetch import slo_burn_alerts
from crawlspark.politeness import host_anomaly_z
from crawlspark.robots import robots_failure_policy


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_srcset_dpr_scaling(spark):
    df = spark.createDataFrame(
        [("/a 320w, /b 640w, /c 1280w", "100vw")],
        "srcset string, sizes string")
    r = df.select(srcset_sizes_select(
        F.col("srcset"), F.col("sizes"),
        viewport_px=400, dpr_centi=200).alias("s")).collect()[0].s
    assert r.need_px == 800 and r.chosen_w == 1280


def test_robots_policy_grace_boundary(spark):
    df = spark.createDataFrame(
        [("a", 503, 0, 30), ("b", 503, 0, 31)],
        "host string, status long, n_redirect_hops long,"
        " days_since_first_error long")
    got = {r.host: r.policy for r in robots_failure_policy(df).collect()}
    assert got["a"] == "disallow_all"       # at the grace boundary
    assert got["b"] == "allow_all_stale"    # past it


def test_anomaly_constant_history_null(spark):
    rows = [("h", d, 100) for d in range(10)] + [("h", 10, 900)]
    df = spark.createDataFrame(rows, "host string, day long, n long")
    r = host_anomaly_z(df).collect()[0]
    assert r.z_milli is None and not r.anomalous  # zero variance


def test_slo_burn_zero_errors(spark):
    df = spark.createDataFrame(
        [("h", "fast", 1000, 0)],
        "host string, window string, n_ok long, n_err long")
    r = slo_burn_alerts(df).collect()[0]
    assert r.burn_milli == 0 and not r.alert
