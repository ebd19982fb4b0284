"""Pre-run chain validation (src/Crawler.php:312-333, BaseStep.php:266-314):
invalid chains fail with a clear PreRunValidationError BEFORE any Spark job,
mirroring CrawlerTest.php's 'pre-run validation' case (error names the step
number; no step executes)."""

import pytest

from crawlspark import fixture
from crawlspark.crawler import (
    Crawler, Csv, GetLinks, HttpGet, Keep, PreRunValidationError, Title,
)

B = fixture.B


def test_scalar_into_response_step_rejected(spark):
    # GetLinks needs a response struct; feeding it the raw seed string must
    # fail pre-run with the step number (CrawlerTest.php:295-325 shape)
    c = Crawler(spark).input(f"{B}/crawling/main").add_step(GetLinks())
    with pytest.raises(PreRunValidationError, match="step number 1"):
        c.run()


def test_response_into_scalar_step_rejected(spark):
    pages = fixture.pages_df(spark)
    c = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(Csv({0: "a"}))  # Csv parses a scalar csv string
    )
    with pytest.raises(PreRunValidationError, match="step number 2"):
        c.run()


def test_bare_keep_of_scalar_output_rejected(spark):
    pages = fixture.pages_df(spark)
    c = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(Title())
        .add_step(Keep())  # keep() without key on a scalar output
    )
    with pytest.raises(PreRunValidationError, match="requires a key"):
        c.run()


def test_bare_keep_of_record_output_spreads_fields(spark):
    pages = fixture.pages_df(spark)
    from crawlspark.crawler import MetaData

    out = (
        Crawler(spark)
        .input(f"{B}/crawling/sub1")
        .add_step(HttpGet(pages))
        .add_step(MetaData())
        .add_step(Keep())
        .run()
        .collect()
    )
    # record fields land in the Result under their own keys (keep(),
    # BaseStep.php:124-161)
    assert out[0].title == "foo"


def test_validation_runs_before_any_spark_job(spark):
    # the page join would fail on this nonsense corpus if any job ran;
    # validation must trip first, lazily-built plan or not
    bad_pages = spark.createDataFrame([("x",)], "not_a_corpus STRING")
    c = Crawler(spark).input("seed").add_step(GetLinks())
    with pytest.raises(PreRunValidationError):
        c.run()


def test_valid_chain_still_runs(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(Keep("seed"))
        .add_step(HttpGet(pages))
        .add_step(GetLinks())
        .run()
    )
    assert out.count() > 0
