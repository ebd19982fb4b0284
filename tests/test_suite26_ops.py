"""Round-3 part-6 operators: license signals, host mirrors, resize plan."""

from pyspark.sql import functions as F


def test_license_precedence_and_classes(spark):
    from crawlspark.extract import classify_license, license_signals

    rows = [
        # rel beats itemprop beats jsonld
        ("all3",
         '<a rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">x</a>'
         '<meta itemprop="license" content="http://a">'
         '"license":"http://b"'),
        ("href-first", '<a href="http://c" rel="license">x</a>'),
        ("jsonld-only", '{"name":"n","license":"https://creativecommons.org/publicdomain/mark/1.0/"}'),
        ("none", "<p>nothing</p>"),
    ]
    df = spark.createDataFrame(rows, "k string, body string")
    sig = license_signals(F.col("body"))
    got = {
        r["k"]: (r["u"], r["s"], r["c"])
        for r in df.select(
            "k", sig["license_url"].alias("u"), sig["source"].alias("s"),
            classify_license(sig["license_url"]).alias("c"),
        ).collect()
    }
    assert got["all3"] == (
        "https://creativecommons.org/licenses/by-sa/4.0/", "rel", "cc-by-sa")
    assert got["href-first"] == ("http://c", "rel", "other")
    assert got["jsonld-only"][1:] == ("jsonld", "pdm")
    assert got["none"] == (None, "none", "none")


def test_host_mirrors_supernode_and_containment(spark):
    from crawlspark.linkgraph import host_mirrors

    rows = []
    # hA: fps 0..9; hB: fps 0..9 (full mirror); hC: fps 0..4 (small full
    # mirror of hA); hD: fps 100..109 (disjoint); boilerplate fp 777 on all
    for f in range(10):
        rows += [("hA", f), ("hB", f)]
    rows += [("hC", f) for f in range(5)]
    rows += [("hD", 100 + f) for f in range(10)]
    rows += [(h, 777) for h in ("hA", "hB", "hC", "hD")]
    df = spark.createDataFrame(rows, "host string, content_fp long")
    out = {
        (r["host_a"], r["host_b"]): r
        for r in host_mirrors(df, max_hosts_per_fp=3, mirror_permille=800,
                              min_shared=5).collect()
    }
    ab = out[("hA", "hB")]
    assert (ab["n_shared"], ab["containment_permille"], ab["is_mirror"]) == (
        10, 1000, True)
    ac = out[("hA", "hC")]
    # containment uses the SMALLER corpus: 5/5 = full
    assert (ac["n_shared"], ac["containment_permille"], ac["is_mirror"]) == (
        5, 1000, True)
    # the 4-host boilerplate fp is dropped (cap 3): no pair with hD exists
    assert not any("hD" in k for k in out)
    # and it did not inflate AB beyond the real 10
    assert ab["n_a"] == 10 and ab["n_b"] == 10


def test_resize_plan_modes_and_floor(spark):
    from crawlspark.mmcurate import resize_plan

    rows = [
        ("down", 1024, 768),    # -> 512 x (768*512/1024=384 -> 384)
        ("up", 100, 50),        # long 100 < 512 -> up; short snaps to floor
        ("keep", 512, 512),
        ("extreme", 5120, 64),  # short' = 64*512/5120 = 6 -> floor 64
    ]
    df = spark.createDataFrame(rows, "image_id string, w long, h long")
    got = {r["image_id"]: r for r in resize_plan(df).collect()}
    assert (got["down"]["out_w"], got["down"]["out_h"],
            got["down"]["mode"]) == (512, 384, "down")
    assert got["up"]["mode"] == "up" and got["up"]["out_w"] == 512
    assert (got["keep"]["out_w"], got["keep"]["out_h"],
            got["keep"]["mode"]) == (512, 512, "keep")
    assert (got["extreme"]["out_w"], got["extreme"]["out_h"]) == (512, 64)
    assert got["down"]["scale_permille"] == 500
