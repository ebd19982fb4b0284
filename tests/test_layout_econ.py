"""Round-3 part-19 operators: zone-map pruning and CoW/MoR planning."""

from pyspark.sql import functions as F


def _grid(spark, n=16):
    # full n x n grid of points
    return (
        spark.range(n * n)
        .select((F.col("id") % n).alias("xb"),
                (F.col("id") / n).cast("long").alias("yb"))
    )


def test_zone_prune_zorder_beats_xsort_on_y_slabs(spark):
    from crawlspark.sinks import xsort_layout, zone_map_prune, zorder_layout

    pts = _grid(spark, 16)
    probes = spark.createDataFrame(
        [(0, 0, 15, 0, 3), (1, 0, 15, 4, 7),
         (2, 0, 15, 8, 11), (3, 0, 15, 12, 15)],
        "probe_id long, x_lo long, x_hi long, y_lo long, y_hi long",
    )
    xs = zone_map_prune(
        xsort_layout(pts, "xb", "yb", 32), probes, "xsort").collect()[0]
    zo = zone_map_prune(
        zorder_layout(pts, "xb", "yb", 32, bits=4), probes,
        "zorder").collect()[0]
    # y-slab probes: x-sorted files each span the full y range -> every
    # file scanned for every probe
    assert xs["scan_permille"] == 1000
    assert zo["scan_permille"] < 1000
    assert zo["file_scans"] < xs["file_scans"]


def test_zone_prune_point_probe_exact(spark):
    from crawlspark.sinks import xsort_layout, zone_map_prune

    pts = _grid(spark, 8)
    stats = xsort_layout(pts, "xb", "yb", 8)  # 8 files, one per x value
    probe = spark.createDataFrame(
        [(0, 3, 3, 0, 7)],
        "probe_id long, x_lo long, x_hi long, y_lo long, y_hi long",
    )
    r = zone_map_prune(stats, probe, "xsort").collect()[0]
    assert r["n_files"] == 8 and r["file_scans"] == 1


def test_cow_mor_sparse_scattered_updates(spark):
    from crawlspark.sinks import cow_mor_plan, xsort_layout

    table = spark.range(1000).select(
        F.col("id").alias("x"), F.lit(0).alias("y"))
    stats = xsort_layout(table, "x", "y", 100)  # 10 files of 100 rows
    # one update in every file -> CoW rewrites ALL 1000 rows for 10
    updates = spark.range(10).select((F.col("id") * 100).alias("key"))
    r = cow_mor_plan(stats, updates).collect()[0]
    assert r["n_files"] == 10 and r["files_touched"] == 10
    assert r["cow_rewrite_rows"] == 1000
    assert r["n_updates"] == 10 and r["mor_delete_rows"] == 10
    assert r["mor_read_amp_permille"] == 1000


def test_cow_mor_clustered_updates(spark):
    from crawlspark.sinks import cow_mor_plan, xsort_layout

    table = spark.range(1000).select(
        F.col("id").alias("x"), F.lit(0).alias("y"))
    stats = xsort_layout(table, "x", "y", 100)
    # 10 updates all inside file 0 -> one file rewritten
    updates = spark.range(10).select(F.col("id").alias("key"))
    r = cow_mor_plan(stats, updates).collect()[0]
    assert r["files_touched"] == 1
    assert r["cow_rewrite_rows"] == 100
    assert r["mor_read_amp_permille"] == 100


def test_cow_mor_no_updates(spark):
    from crawlspark.sinks import cow_mor_plan, xsort_layout

    table = spark.range(100).select(
        F.col("id").alias("x"), F.lit(0).alias("y"))
    stats = xsort_layout(table, "x", "y", 50)
    updates = spark.range(0).select(F.col("id").alias("key"))
    r = cow_mor_plan(stats, updates).collect()[0]
    assert r["files_touched"] == 0 and r["cow_rewrite_rows"] == 0
    assert r["mor_read_amp_permille"] == 0
