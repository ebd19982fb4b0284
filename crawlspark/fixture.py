"""Replica of the reference's 6-page integration-test site.

Pages transcribed from reference: tests/_Integration/_Server/Crawling.php
(1-159); golden expectations from tests/_Integration/Http/CrawlingTest.php.
Bodies are real HTML so crawls exercise the vectorized extractors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

HOST = "www.example.com"
B = f"http://{HOST}"

MAIN_BODY_TMPL = """<!doctype html>
<html lang="en">
<body>
    {redirect_link}

    <a href="/crawling/sub1">Subpage 1</a> <br>
    <a href="/crawling/sub2">Subpage 2</a> <br>
    <a href="/crawling/sub2#fragment1">Subpage 2 - Fragment 1</a> <br>
    <a href="/crawling/sub2#fragment2">Subpage 2 - Fragment 2</a> <br>

    <a href="https://www.crwlr.software/packages/crawler">External link</a>

    <a href="mailto:somebody@example.com">mailto link</a>
    <a href="javascript:alert('hello');">javascript link</a>
    <a href="tel:+499123456789">phone link</a>

    <a href="//">broken link</a>
</body>
</html>"""

SUB1_BODY = """<!doctype html>
<html lang="en">
<head>
    <title>foo</title>
    <base href="/crawling/">
    <link rel="canonical" href="/crawling/sub1/sub1" />
</head>
<body>
    <a href="sub1/sub1">Subpage 1 of Subpage 1</a> <br>
    <a href="https://www.foo.com">External link</a>
    <a href="http://foo.example.com/crawling/main-on-subdomain">Link to subdomain</a>
</body>
</html>"""

SUB1_SUB1_BODY = """<!doctype html>
<html lang="en">
<body>
    <h1>Final level of sub1</h1>
    <h2>Subpage 1 of Subpage 1</h2>
    <a href="/crawling/main">Back to main</a>
</body>
</html>"""

SUB2_BODY = """<!doctype html>
<html lang="en">
<body>
    <a href="/crawling/sub2/sub1">Subpage 1 of Subpage 2</a>
</body>
</html>"""

SUB2_SUB1_BODY = """<!doctype html>
<html lang="en">
<head>
    <title>foo</title>
    <link rel="canonical" href="/crawling/sub1/sub1" />
</head>
<body>
    <a href="/crawling/sub2/sub1/sub1">Subpage 1 of Subpage 1 of Subpage 2</a>
</body>
</html>"""

SUB2_SUB1_SUB1_BODY = """<!doctype html>
<html lang="en">
<body>
    <h1>Final level of sub2</h1>
    <h2>Subpage 1 of Subpage 1 of Subpage 2</h2>
    <a href="/crawling/sub2">Back to Subpage 2</a>
</body>
</html>"""

SUBDOMAIN_BODY = """<!doctype html>
<html lang="en"><body><h1>Main page on subdomain</h1></body></html>"""

SITEMAP_BODY = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://www.example.com/crawling/main</loc></url>
<url><loc>http://www.example.com/crawling/sub1</loc></url>
<url><loc>http://www.example.com/crawling/sub1/sub1</loc></url>
<url><loc>http://www.example.com/crawling/sub2</loc></url>
<url><loc>http://www.example.com/crawling/sub2/sub1</loc></url>
<url><loc>http://www.example.com/crawling/sub2/sub1/sub1</loc></url>
</urlset>"""

SITEMAP2_BODY = """<?xml version="1.0" encoding="UTF-8"?><?xml-stylesheet type="text/xsl" href="/typo3/sysext/seo/Resources/Public/CSS/Sitemap.xsl"?>
<urlset xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance" xmlns:image="http://www.google.com/schemas/sitemap-image/1.1" xsi:schemaLocation="http://www.sitemaps.org/schemas/sitemap/0.9 http://www.sitemaps.org/schemas/sitemap/0.9/sitemap.xsd" xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://www.example.com/crawling/main</loc></url>
<url><loc>http://www.example.com/crawling/sub1</loc></url>
<url><loc>http://www.example.com/crawling/sub1/sub1</loc></url>
<url><loc>http://www.example.com/crawling/sub2</loc></url>
<url><loc>http://www.example.com/crawling/sub2/sub1</loc></url>
<url><loc>http://www.example.com/crawling/sub2/sub1/sub1</loc></url>
</urlset>"""


def pages_df(spark: SparkSession) -> DataFrame:
    rows = [
        # (url, status, redirect_to, content_type, body)
        (f"{B}/crawling", 301, f"{B}/crawling/main?redirect=1", "text/html", ""),
        (f"{B}/crawling/redirect", 301, f"{B}/crawling/main?redirect=1", "text/html", ""),
        (f"{B}/crawling/main", 200, None, "text/html",
         MAIN_BODY_TMPL.format(redirect_link="")),
        (f"{B}/crawling/main?redirect=1", 200, None, "text/html",
         MAIN_BODY_TMPL.format(redirect_link='<a href="/crawling">link</a>')),
        (f"{B}/crawling/sub1", 200, None, "text/html", SUB1_BODY),
        (f"{B}/crawling/sub1/sub1", 200, None, "text/html", SUB1_SUB1_BODY),
        (f"{B}/crawling/sub2", 200, None, "text/html", SUB2_BODY),
        (f"{B}/crawling/sub2/sub1", 200, None, "text/html", SUB2_SUB1_BODY),
        (f"{B}/crawling/sub2/sub1/sub1", 200, None, "text/html", SUB2_SUB1_SUB1_BODY),
        ("http://foo.example.com/crawling/main-on-subdomain", 200, None, "text/html",
         SUBDOMAIN_BODY),
        (f"{B}/crawling/sitemap.xml", 200, None, "application/xml", SITEMAP_BODY),
        (f"{B}/crawling/sitemap2.xml", 200, None, "application/xml", SITEMAP2_BODY),
        (f"{B}/not-allowed", 200, None, "text/html", "<html><body>secret</body></html>"),
    ]
    return spark.createDataFrame(
        rows, "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING"
    )


def robots_df(spark: SparkSession) -> DataFrame:
    """The TestLoader denies path /not-allowed (CrawlingTest.php:57-72)."""
    return spark.createDataFrame(
        [(HOST, "*", ["/not-allowed"], [], [])],
        "host STRING, user_agent STRING, disallow_prefixes ARRAY<STRING>, "
        "allow_prefixes ARRAY<STRING>, sitemaps ARRAY<STRING>",
    )
