"""Round-2 part-17 operators: hreflang reciprocity (property test)."""

from pyspark.sql import functions as F


def test_hreflang_reciprocity_join(spark):
    from crawlspark.extract import extract_hreflang
    # A <-> B reciprocal; A -> C one-way; C declares nothing back
    pages = spark.createDataFrame(
        [("http://x/a",
          '<link rel="alternate" hreflang="de" href="http://x/b">'
          '<link rel="alternate" hreflang="xx" href="http://x/c">'),
         ("http://x/b",
          '<link rel="alternate" hreflang="en" href="http://x/a">'),
         ("http://x/c", "<html></html>")],
        "page_url STRING, body STRING")
    decls = pages.select(
        "page_url",
        F.explode(F.transform(extract_hreflang(F.col("body")),
                              lambda a: a["url"])).alias("alt_url"),
    )
    back = decls.select(F.col("page_url").alias("bp"),
                        F.col("alt_url").alias("ba")).distinct()
    out = decls.join(
        back, (decls["alt_url"] == back["bp"])
        & (decls["page_url"] == back["ba"]), "left"
    ).select("page_url", "alt_url", F.col("bp").isNotNull().alias("r"))
    got = {(r.page_url, r.alt_url): r.r for r in out.collect()}
    assert got[("http://x/a", "http://x/b")] is True
    assert got[("http://x/b", "http://x/a")] is True
    assert got[("http://x/a", "http://x/c")] is False
