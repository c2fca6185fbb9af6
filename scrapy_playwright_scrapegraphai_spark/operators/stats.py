"""Statistics aggregates over the frontier / run-log tables (A1–A3).

All are single hash-aggregate jobs (partial+final map-side combine comes
free from Catalyst; verify HashAggregate spans in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_page_counts(children: DataFrame) -> DataFrame:
    """A1 — per parsed page: target vs seed counts
    (frontier_spider.py:166-169,238-243; crawl_manager_utils.py:33,42-48)."""
    return children.groupBy("parent_url").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("target_count"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("seed_count"),
        F.count("*").alias("total_count"),
    )


def frontier_statistics(frontier: DataFrame) -> DataFrame:
    """A2 — per-category frontier statistics (frontier_crud.py:142-184,
    FrontierStatistics model frontier_model.py:112-135).

    Implements the *intended* semantics against ``url_state`` (the
    reference has a latent bug filtering a nonexistent ``status`` column,
    frontier_crud.py:149-151 vs schema.sql:18). Excludes root-audit rows
    (the reference keeps those in config_url_log, not frontier_url).
    ``success_rate`` = processed/(processed+failed)*100, null when no
    terminal rows. Exact countDistinct for correctness tests;
    approx_count_distinct is the documented 10^10-scale metrics variant.
    """
    f = frontier.filter(~F.col("is_root"))
    processed = F.sum(F.when(F.col("url_state") == "processed", 1).otherwise(0))
    failed = F.sum(F.when(F.col("url_state") == "failed", 1).otherwise(0))
    return (
        f.groupBy("category")
        .agg(
            F.count("*").alias("total_urls"),
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("target_urls"),
            F.sum(F.when(F.col("url_state") == "pending", 1).otherwise(0)).alias(
                "pending_urls"
            ),
            processed.alias("processed_urls"),
            failed.alias("failed_urls"),
            F.sum(F.when(F.col("url_state") == "skipped", 1).otherwise(0)).alias(
                "skipped_urls"
            ),
            F.countDistinct("main_domain").alias("distinct_domains"),
            F.max("depth").alias("max_reached_depth"),
            F.min("superstep").alias("first_superstep"),
            F.max("superstep").alias("last_superstep"),
        )
        .withColumn(
            "success_rate",
            F.when(
                (F.col("processed_urls") + F.col("failed_urls")) > 0,
                F.col("processed_urls")
                * 100.0
                / (F.col("processed_urls") + F.col("failed_urls")),
            ),
        )
    )


def run_log_rollup(children: DataFrame, superstep: int) -> DataFrame:
    """A4 — per-root-seed counter rollup for the run-audit table
    (config_url_log counters, schema.sql:62-65; increment query
    queries.sql:106-117). Pure-batch recompute per superstep; the
    cross-superstep accumulation is the union of these deltas."""
    return children.groupBy("root_seed_id", "category").agg(
        F.lit(superstep).alias("superstep"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("target_urls_found"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("seed_urls_found"),
        F.count("*").alias("total_urls_found"),
    )


def processing_stats(run_log: DataFrame) -> DataFrame:
    """A3 — global processing stats (config_url_log_crud.py:172-195)."""
    return run_log.agg(
        F.count("*").alias("total_rows"),
        F.sum("target_urls_found").alias("total_targets"),
        F.sum("seed_urls_found").alias("total_seeds"),
        F.sum("total_urls_found").alias("total_found"),
        F.avg("total_urls_found").alias("avg_found_per_root"),
        F.max("total_urls_found").alias("max_found_per_root"),
    )
