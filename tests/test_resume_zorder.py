"""resume_ranges interval semantics + zorder_layout locality property."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.fetch import resume_ranges
from crawlspark.sinks import z_interleave, zorder_layout


def _parts(spark, rows):
    return spark.createDataFrame(
        rows, "url string, start long, end long, total_size long"
    )


def test_resume_ranges_cases(spark):
    rows = [
        # complete via overlaps and duplicates
        ("a", 0, 600, 1000), ("a", 500, 1000, 1000), ("a", 0, 600, 1000),
        # internal gap then tail complete
        ("b", 0, 300, 1000), ("b", 500, 1000, 1000),
        # leading gap
        ("c", 200, 1000, 1000),
        # tail missing only
        ("d", 0, 700, 1000),
        # nested interval swallowed entirely
        ("e", 0, 1000, 1000), ("e", 100, 200, 1000),
        # server ignored the Range header: overshoot is still COMPLETE
        ("f", 0, 10500, 10000),
    ]
    got = {r["url"]: r for r in resume_ranges(_parts(spark, rows)).collect()}
    assert (got["a"]["bytes_have"], got["a"]["complete"],
            got["a"]["next_missing_start"]) == (1000, 1, None)
    assert (got["b"]["bytes_have"], got["b"]["n_gaps"],
            got["b"]["next_missing_start"]) == (800, 1, 300)
    assert (got["c"]["n_gaps"], got["c"]["next_missing_start"]) == (1, 0)
    assert (got["d"]["n_gaps"], got["d"]["next_missing_start"]) == (0, 700)
    assert (got["e"]["bytes_have"], got["e"]["complete"]) == (1000, 1)
    assert (got["f"]["bytes_have"], got["f"]["complete"],
            got["f"]["next_missing_start"]) == (10500, 1, None)


def test_z_interleave_known_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5), (63, 63)],
                               ["x", "y"])
    got = [r["z"] for r in df.select(
        z_interleave(F.col("x"), F.col("y"), bits=6).alias("z")
    ).collect()]

    def ref(x, y):
        z = 0
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(x, y) for x, y in
                   [(0, 0), (1, 0), (0, 1), (3, 5), (63, 63)]]


def test_zorder_boxes_beat_plain_sort(spark):
    # 32x32 grid, 64-row files: under Z-order a point predicate on x
    # prunes to the files whose box contains it; under a y-major sort
    # every file spans the full x range, so NOTHING prunes on x
    n = 32
    pts = spark.range(n * n).select(
        (F.col("id") % n).alias("xb"),
        (F.col("id") / n).cast("long").alias("yb"),
    )
    boxes = zorder_layout(pts, "xb", "yb", rows_per_file=64, bits=5).collect()
    # every z file is a tight 8x8 tile on this power-of-two grid
    assert all(r["bbox_area"] == 64 for r in boxes)
    assert all(r["n_rows"] == 64 for r in boxes)
    touched_x5 = sum(1 for r in boxes if r["x_min"] <= 5 <= r["x_max"])
    touched_y5 = sum(1 for r in boxes if r["y_min"] <= 5 <= r["y_max"])
    plain_touched = len(boxes)  # y-major sort: all 16 files span x=5
    assert touched_x5 == 4 < plain_touched
    assert touched_y5 == 4  # prunes in BOTH dimensions at once
