"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship operator (W2 per-host politeness admission —
the reference's CONCURRENT_REQUESTS_PER_DOMAIN=1 + DOWNLOAD_DELAY
discipline, /root/reference/src/crawler/settings.py:34-35,77-78 — as a
two-phase salted window rank) on the sf0.001 testdata. ``queries`` /
``oracle_sql`` cover the operator inventory of SURVEY.md §2 plus the
training-data ops (dedup suite, similarity search, text analytics);
implementations live in
``scrapy_playwright_scrapegraphai_spark/entry_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scrapy_playwright_scrapegraphai_spark import entry_queries as EQ


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    EQ.ensure_worker_imports(spark)
    return EQ.q_politeness_topk(spark, "/root/testdata/sf0.001")


def _with_pyfiles(fn: Callable) -> Callable:
    # the harness creates the SparkSession and may run from any cwd; ship
    # the package to Python workers before the first UDF executes
    def wrapped(spark: SparkSession, sf: str) -> DataFrame:
        EQ.ensure_worker_imports(spark)
        return fn(spark, sf)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: _with_pyfiles(fn) for k, fn in EQ.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query. EVERY queries() entry
    has one — including the MinHash/SimHash/LSH/IVF sketches, whose
    md5-derived hash families and embedded plane literals the oracle
    recomputes exactly (see entry_queries.py)."""
    return dict(EQ.ORACLE_SQL)
