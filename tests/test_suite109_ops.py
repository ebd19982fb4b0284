"""Tests for schema type census extraction."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_schema_types_dedup_and_syntaxes(spark):
    from crawlspark.extract import schema_types

    cases = [
        # both syntaxes, same type -> one entry
        ('{"@type":"Product"}<div itemtype="https://schema.org/Product">',
         ["Product"]),
        # JSON-LD with whitespace + http itemtype
        ('{ "@type" : "Event" }<x itemtype="http://schema.org/Recipe">',
         ["Event", "Recipe"]),
        # nested @type values all collected
        ('{"@type":"Product","offers":{"@type":"Offer"}}',
         ["Offer", "Product"]),
        ("plain", []),
        (None, []),
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, _) in enumerate(cases)],
        "i int, h string")
    out = {r.i: r.t for r in df.select(
        "i", schema_types(F.col("h")).alias("t")).collect()}
    for i, (h, expect) in enumerate(cases):
        assert out[i] == expect, (i, h, out[i])
