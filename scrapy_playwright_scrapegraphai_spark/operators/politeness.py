"""Per-host politeness admission — the flagship window operator (W2).

The reference throttles implicitly: CONCURRENT_REQUESTS_PER_DOMAIN=1 +
DOWNLOAD_DELAY=2 s (randomized 0.5–1.5×) serialize every host to ≤1
request / ~2 s (/root/reference/src/crawler/settings.py:34-35,77-78).
A batch superstep models a wall-clock window of ``superstep_seconds``;
each host therefore admits ``floor(superstep_seconds / crawl_delay)``
fetches (min 1) per superstep, oldest-first by ``discovery_seq`` (the
FIFO discipline of queries.sql:58-63 ORDER BY insert_date).

Skew: one mega-host with 10^8 pending URLs would hot-spot a single
window partition. Two-phase exact top-k defuses it (north rule "salted
repartitioning"): rank within (host, salt) where salt = pmod(xxhash64(url),
S) and keep ≤budget per salt — the global per-host top-budget is a subset
of the union of per-salt top-budgets — then re-rank the ≤ S×budget
survivors per host. Phase 1 spreads the mega-host over S partitions;
phase 2 touches only budget×S rows per host.

Robots (J5, north-rule addition; reference sets ROBOTSTXT_OBEY=False,
settings.py:49): broadcast-join ``robots_rules`` on main_domain; denied
URLs → 'skipped' (state exists in the reference enum, schema.sql:24).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import robots_allows_udf

DEFAULT_CRAWL_DELAY_S = 2.0  # settings.py:77 DOWNLOAD_DELAY = 2


@dataclass
class AdmissionResult:
    admitted: DataFrame
    deferred: DataFrame  # politeness-deferred; stay pending for next superstep
    denied: DataFrame    # robots-denied → url_state 'skipped'


def with_robots(work: DataFrame, robots: DataFrame) -> DataFrame:
    """Broadcast-join politeness rules onto work rows (small dim table)."""
    rules = robots.select(
        "main_domain", "allow_patterns", "deny_patterns", "crawl_delay_s"
    )
    joined = work.join(F.broadcast(rules), on="main_domain", how="left")
    return joined.withColumn(
        "_robots_ok",
        F.when(F.col("deny_patterns").isNull(), F.lit(True)).otherwise(
            robots_allows_udf(
                F.col("url"), F.col("allow_patterns"), F.col("deny_patterns")
            )
        ),
    )


def admit(
    work: DataFrame,
    robots: DataFrame,
    superstep_seconds: float,
    salt_shards: int = 8,
    order_cols: tuple[str, ...] = ("discovery_seq",),
) -> AdmissionResult:
    """Split pending work into (admitted, deferred, denied)."""
    w = with_robots(work, robots)
    denied = w.filter(~F.col("_robots_ok"))
    eligible = w.filter(F.col("_robots_ok")).withColumn(
        "_budget",
        F.greatest(
            F.lit(1),
            F.floor(
                F.lit(float(superstep_seconds))
                / F.coalesce(F.col("crawl_delay_s"), F.lit(DEFAULT_CRAWL_DELAY_S))
            ).cast("int"),
        ),
    )

    order = [F.col(c) for c in order_cols]
    # phase 1: per-(host, salt) top-budget — mega-host spread over S shards
    salted = eligible.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_shards))
    )
    w1 = Window.partitionBy("main_domain", "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("_budget"))
        .drop("_r1", "_salt")
    )
    # phase 2: exact per-host top-budget over the ≤ S×budget survivors
    w2 = Window.partitionBy("main_domain").orderBy(*order)
    ranked = survivors.withColumn("_r2", F.row_number().over(w2))
    admitted = ranked.filter(F.col("_r2") <= F.col("_budget"))

    # deferred = eligible minus admitted (by unique discovery_seq)
    deferred = eligible.join(
        admitted.select("discovery_seq"), on="discovery_seq", how="left_anti"
    )

    drop_aux = ["_robots_ok", "_budget", "_r1", "_r2", "_salt",
                "allow_patterns", "deny_patterns", "crawl_delay_s"]
    return AdmissionResult(  # .drop ignores absent columns
        admitted=admitted.drop(*drop_aux),
        deferred=deferred.drop(*drop_aux),
        denied=denied.drop(*drop_aux),
    )
