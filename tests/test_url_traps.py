"""URL template mining + spider-trap flagging."""

from pyspark.sql import functions as F

from crawlspark.scheduler import detect_url_traps, url_template


def test_url_template_collapse(spark):
    df = spark.createDataFrame(
        [
            ("https://a.com/p/123?id=abc123def456abcd&page=7",),
            ("https://a.com/cal?y=2026&m=11&d=3#frag",),
            ("https://a.com/s/deadbeefcafe1234/x",),
        ],
        "url string",
    )
    got = [r["t"] for r in df.select(url_template(F.col("url")).alias("t")).collect()]
    assert got == [
        "https://a.com/p/N?id=V&page=V",
        "https://a.com/cal?y=V&m=V&d=V#frag",
        "https://a.com/s/H/x",
    ]


def test_trap_flags_share_and_min_host(spark):
    rows = []
    # host big: 90 of 116 URLs share one template (776 permille > 500)
    rows += [("big", f"https://big/cal?d={i}") for i in range(90)]
    rows += [("big", f"https://big/{c}/p") for c in "abcdefghijklmnopqrstuvwxyz"[:26]]
    # host tiny: 100%-share template but under min_host_urls
    rows += [("tiny", f"https://tiny/x?p={i}") for i in range(5)]
    df = spark.createDataFrame(rows, "host string, url string")
    out = detect_url_traps(df, min_host_urls=50, max_share_permille=500)
    flagged = {(r["host"], r["template"]) for r in out.filter("trap").collect()}
    assert flagged == {("big", "https://big/cal?d=V")}
    big_cal = out.filter(
        (F.col("host") == "big") & F.col("template").contains("cal")
    ).collect()[0]
    assert (big_cal["n_urls"], big_cal["host_urls"]) == (90, 116)


def test_trap_absolute_cap(spark):
    rows = [("h", f"https://h/a?i={i}") for i in range(60)]
    rows += [("h", f"https://h/{c}/b?j={i}") for i in range(60)
             for c in "xyz"]  # 3 templates x 60
    df = spark.createDataFrame(rows, "host string, url string")
    out = detect_url_traps(
        df, min_host_urls=50, max_per_template=59, max_share_permille=1000
    )
    flagged = {r["template"] for r in out.filter("trap").collect()}
    # every template has 60 URLs > 59; share rule (1000) never fires alone
    assert flagged == {
        "https://h/a?i=V", "https://h/x/b?j=V",
        "https://h/y/b?j=V", "https://h/z/b?j=V",
    }
