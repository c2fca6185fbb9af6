import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("sps-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.default.parallelism", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus():
    from scrapy_playwright_scrapegraphai_spark.sources.synth import generate_corpus

    return generate_corpus(n_hosts=8, pages_per_host=12, mega_host_factor=6, seed=42)


@pytest.fixture(scope="session")
def corpus_spark(spark, corpus):
    from scrapy_playwright_scrapegraphai_spark.sources.synth import corpus_to_spark

    return corpus_to_spark(spark, corpus)
