"""Edge-case tests for suite82 ops: modal currency ties, unsorted
breadcrumb positions, printable fourcc gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import form_audit, ld_breadcrumbs, price_extract
from crawlspark.images import dds_sniff


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_price_modal_currency_tie(spark):
    # one $ and one €: tie resolves deterministically (sorted struct)
    df = spark.createDataFrame([("pay $5.00 or €4.00",)], "body string")
    r = df.select(price_extract(F.col("body")).alias("p")).collect()[0].p
    assert r.n_prices == 2
    assert r.currency in ("$", "€")  # deterministic but order-defined
    assert r.min_micros == 4_000_000 and r.max_micros == 5_000_000
    r2 = df.select(price_extract(F.col("body")).alias("p")).collect()[0].p
    assert r2.currency == r.currency


def test_breadcrumb_positions_sorted(spark):
    body = ('<script type="application/ld+json">{"@type": '
            '"BreadcrumbList", "itemListElement": ['
            '{"position": 3, "name": "C"}, {"position": 1, "name": "A"},'
            '{"position": 2, "name": "B"}]}</script>')
    df = spark.createDataFrame([(body,)], "body string")
    r = df.select(ld_breadcrumbs(F.col("body")).alias("b")).collect()[0].b
    assert r.trail == "A > B > C" and r.leaf_name == "C"


def test_form_audit_password_implies_not_capture(spark):
    body = ('<form><input type="email"><input type="password"></form>')
    df = spark.createDataFrame([(body,)], "body string")
    r = df.select(form_audit(F.col("body")).alias("f")).collect()[0].f
    assert r.has_login and not r.has_email_capture


def test_dds_nonprintable_fourcc_null(spark):
    import struct
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    hdr[12:16] = struct.pack("<I", 4)
    hdr[16:20] = struct.pack("<I", 4)
    hdr[84:88] = bytes([0, 1, 2, 3])
    df = spark.createDataFrame([(1, bytes(hdr))], "id long, bytes binary")
    r = dds_sniff(df).collect()[0]
    assert r.dds_height == 4 and r.dds_fourcc is None
