"""Round-3 part-20 operators: ROI knapsack and calibration bins."""

from pyspark.sql import functions as F


def test_roi_knapsack_greedy_order_and_cut(spark):
    from crawlspark.scheduler import roi_knapsack

    items = spark.createDataFrame(
        [("a", 90, 30), ("b", 50, 50), ("c", 10, 100), ("d", 40, 20)],
        "host string, value long, cost long",
    )
    # ratios: a=3000, d=2000, b=1000, c=100; budget 100 takes a(30),
    # d(50), b(100) and cuts c (prefix 200)
    got = {r["id"]: r for r in
           roi_knapsack(items, budget=100).collect()}
    assert got["a"]["selected"] and got["a"]["prefix_cost"] == 30
    assert got["d"]["selected"] and got["d"]["prefix_cost"] == 50
    assert got["b"]["selected"] and got["b"]["prefix_cost"] == 100
    assert not got["c"]["selected"] and got["c"]["prefix_cost"] == 200


def test_roi_knapsack_ratio_tie_breaks_by_id(spark):
    from crawlspark.scheduler import roi_knapsack

    items = spark.createDataFrame(
        [("x", 10, 10), ("y", 10, 10), ("z", 10, 10)],
        "host string, value long, cost long",
    )
    got = {r["id"]: r["prefix_cost"] for r in
           roi_knapsack(items, budget=20).collect()}
    assert got == {"x": 10, "y": 20, "z": 30}
    sel = {r["id"]: r["selected"] for r in
           roi_knapsack(items, budget=20).collect()}
    assert sel == {"x": True, "y": True, "z": False}


def test_calibration_bins_perfect_and_off(spark):
    from crawlspark.textops.quality import calibration_bins

    rows = []
    # bin 2 (pred 250): perfectly calibrated — 1 positive in 4
    rows += [(250, 1)] + [(250, 0)] * 3
    # bin 9 (pred 950): claims 950 but only half are positive
    rows += [(950, 1), (950, 0)]
    df = spark.createDataFrame(rows, "pred_permille long, label long")
    got = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert got[2]["n"] == 4
    assert got[2]["mean_pred_permille"] == 250
    assert got[2]["emp_permille"] == 250
    assert got[2]["abs_gap_permille"] == 0
    assert got[9]["emp_permille"] == 500
    assert got[9]["abs_gap_permille"] == 450


def test_calibration_bins_clamps_1000(spark):
    from crawlspark.textops.quality import calibration_bins

    # pred exactly 1000 falls into the top bin, not bin 10
    df = spark.createDataFrame(
        [(1000, 1), (0, 0)], "pred_permille long, label long")
    got = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(got) == {0, 9}
    assert got[9]["mean_pred_permille"] == 1000
