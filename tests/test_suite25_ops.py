"""Round-3 part-5 operators: image robots policy, Vary cache identity,
EXIF-GPS scrub planning."""

from pyspark.sql import functions as F


def test_image_robots_specific_overrides(spark):
    from crawlspark.robots import image_indexing_policy

    rows = [
        # bot-specific tag wins entirely: generic's preview is NOT merged
        ("override",
         '<meta name="crawlspark" content="noimageindex">'
         '<meta name="robots" content="max-image-preview:large">', None),
        # header is additive with the winning meta tag
        ("additive",
         '<meta name="robots" content="noimageindex">',
         "max-image-preview:standard"),
        # invalid preview value -> unset
        ("badval", '<meta name="robots" content="max-image-preview:huge">',
         None),
        ("empty", "<html></html>", None),
    ]
    df = spark.createDataFrame(rows, "k string, body string, xrt string")
    pol = image_indexing_policy(F.col("body"), F.col("xrt"))
    got = {
        r["k"]: (r["p"]["noimageindex"], r["p"]["max_image_preview"])
        for r in df.select("k", pol.alias("p")).collect()
    }
    assert got["override"] == (True, "unset")
    assert got["additive"] == (True, "standard")
    assert got["badval"] == (False, "unset")
    assert got["empty"] == (False, "unset")


def test_vary_identity_folding(spark):
    from crawlspark.sinks import vary_cache_identity

    rows = [
        ("messy", " ACCEPT-encoding ,accept-language , Accept-Encoding",
         {"accept-language": "fr", "accept-encoding": "br"}),
        ("absent-header", "X-Custom", {"accept-language": "fr"}),
        ("star", "accept-language, *", {"accept-language": "fr"}),
    ]
    df = spark.createDataFrame(
        rows, "k string, vary string, req_headers map<string,string>"
    )
    got = {
        r["k"]: (r["vary_key"], r["uncacheable"])
        for r in vary_cache_identity(df).collect()
    }
    # case-folded, deduped, sorted
    assert got["messy"] == ("accept-encoding=br&accept-language=fr", False)
    # absent request header -> empty value is its own match class
    assert got["absent-header"] == ("x-custom=", False)
    # '*' anywhere in the list -> uncacheable, no key
    assert got["star"] == (None, True)


def test_exif_gps_scrub_counts(spark):
    from crawlspark.mmcurate import exif_gps_scrub_plan

    rows = [
        ("gps", {"Make": "M", "GPSLatitude": "1", "GPSLongitude": "2"}),
        ("clean", {"Make": "M", "Model": "Z"}),
        ("nullmap", None),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, exif map<string,string>"
    )
    got = {r["image_id"]: r for r in exif_gps_scrub_plan(df).collect()}
    assert (got["gps"]["n_gps_keys"], got["gps"]["action"]) == (2, "strip_gps")
    assert (got["clean"]["n_gps_keys"], got["clean"]["action"]) == (0, "none")
    assert (got["nullmap"]["n_gps_keys"], got["nullmap"]["has_gps"]) == (0, False)
