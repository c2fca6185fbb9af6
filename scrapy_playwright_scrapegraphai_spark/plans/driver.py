"""Batch-iterative superstep crawl driver.

One superstep = one declarative DataFrame program (Catalyst-optimized),
mirroring the reference's event loop semantics (SURVEY.md §3):

    pending work ──politeness rank (W2)──► admitted
    admitted ──fetch join vs pages (J3)──► ok / failed(retry)
    ok ──expand_pages: extract+classify Arrow UDF (K1,P2-P6)──► children
    children ──first-writer dedup (J2)──► batch
    batch ──bloom prefilter + exact anti-join seen (J1/K5)──► new URLs
    new ──dense discovery_seq──► frontier append (S4)
    + per-superstep metrics & per-partition lineage (S6/A4)
    + atomic snapshot commit (checkpoint/resume)

The reference's recursion (frontier_spider.py:246-260 re-yields Requests
for seeds below max_depth) becomes the driver-side ``while`` loop; its
termination condition (Scrapy scheduler drained) becomes "no pending
fetchable rows".

Scale notes (10^10-URL design point):
- every join in the loop is either broadcast (admitted batch, robots) or
  hash-partitioned on url; the frontier is the only big state and is
  touched via anti-join (bloom-prefiltered) + unionByName append.
- snapshot writes are full-table here (parquet sandbox fallback); under
  Iceberg the same commit is a MERGE + append touching only changed files.
- no collect() of row data ever; only tiny aggregates (counts, shard
  blobs, partition offsets) reach the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import expand_pages, main_domain_udf
from ..operators import politeness
from ..operators.frontier import (
    FRONTIER_COLUMNS,
    anti_join_seen,
    assign_global_seq,
    finalize_new_rows,
    first_writer_dedup,
)
from ..operators.seenset import BloomShards
from ..operators.stats import run_log_rollup
from .store import SnapshotStore

METRICS_DDL = (
    "superstep int, n_work long, n_admitted long, n_denied long, "
    "n_deferred long, n_fetched_ok long, n_fetch_failed long, n_new long, "
    "wall_time_s double"
)

LINEAGE_DDL = (
    "superstep int, partition_id int, root_seed_id int, category string, "
    "target_urls_found long, seed_urls_found long, total_urls_found long"
)


@dataclass
class CrawlConfig:
    superstep_seconds: float = 10.0  # wall-clock window a superstep models
    retry_times: int = 1             # settings.py:38 RETRY_TIMES = 1
    salt_shards: int = 8             # politeness two-phase salt fan-out
    seq_mode: str = "ranged"         # discovery_seq assignment strategy
    use_bloom: bool = True
    bloom_shards: int = 16
    expected_urls: int = 200_000     # bloom sizing hint
    max_supersteps: int = 1000
    profile: bool = False            # print per-phase wall times to stderr


@dataclass
class CrawlResult:
    frontier: DataFrame
    metrics: DataFrame
    lineage: DataFrame
    supersteps_run: int = 0
    resumed_from: int | None = None
    extra: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        seeds: DataFrame,
        robots: DataFrame,
        checkpoint_dir: str,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.seeds = seeds
        self.robots = robots
        self.cfg = config or CrawlConfig()
        self.store = SnapshotStore(checkpoint_dir)

    # -- initial state ---------------------------------------------------------

    def _initial_frontier(self) -> DataFrame:
        """Root-seed audit rows (config_url_log analogue, schema.sql:39-80).

        Roots live in the frontier table flagged ``is_root=True``; they are
        fetch *work* but are excluded from the URL-seen set and statistics
        (the reference keeps roots in config_url_log, not frontier_url).
        ``discovery_seq`` = config order (frontier_spider.py:48-100 emits
        seeds in config-file order).
        """
        return (
            self.seeds.withColumn(
                "discovery_seq", F.col("url_seed_root_id").cast("long")
            )
            .withColumn("url_hash", F.xxhash64(F.col("url")))
            .withColumn("depth", F.lit(0))
            .withColumn("main_domain", main_domain_udf(F.col("url")))
            .withColumn("is_target", F.lit(False))
            .withColumn("parent_url", F.lit(None).cast("string"))
            .withColumn("root_seed_id", F.col("url_seed_root_id"))
            .withColumn("is_root", F.lit(True))
            .withColumn("url_state", F.lit("pending"))
            .withColumn("error_message", F.lit(None).cast("string"))
            .withColumn("attempt", F.lit(0))
            .withColumn("superstep", F.lit(0))
            .select(*FRONTIER_COLUMNS)
        )

    def _build_bloom(self, frontier: DataFrame) -> BloomShards | None:
        if not self.cfg.use_bloom:
            return None
        bloom = BloomShards.sized_for(self.cfg.expected_urls, self.cfg.bloom_shards)
        seen = frontier.filter(~F.col("is_root")).select("url")
        bloom.add_df(seen)
        return bloom

    # -- main loop ---------------------------------------------------------------

    def run(self, resume: bool = True, max_supersteps: int | None = None) -> CrawlResult:
        spark, cfg = self.spark, self.cfg
        max_steps = max_supersteps or cfg.max_supersteps
        empty_metrics = spark.createDataFrame([], METRICS_DDL)
        empty_lineage = spark.createDataFrame([], LINEAGE_DDL)

        latest = self.store.latest_step() if resume else None
        if latest is None:
            frontier = self._initial_frontier()
            metrics, lineage = empty_metrics, empty_lineage
            next_seq = (frontier.agg(F.max("discovery_seq")).collect()[0][0] or -1) + 1
            step = 0
            self.store.write_step(
                0,
                {"frontier": frontier, "metrics": metrics, "lineage": lineage},
                {"next_seq": next_seq, "done": False},
            )
            frontier = self.store.read_table(spark, 0, "frontier")
        else:
            step = latest
            manifest = self.store.read_manifest(step)
            frontier = self.store.read_table(spark, step, "frontier")
            metrics = self.store.read_table(spark, step, "metrics")
            lineage = self.store.read_table(spark, step, "lineage")
            next_seq = manifest["meta"]["next_seq"]
            if manifest["meta"].get("done"):
                return CrawlResult(frontier, metrics, lineage, 0, resumed_from=step)

        bloom = self._build_bloom(frontier)
        steps_run = 0

        import sys

        def _mkphase():
            state = {"last": time.monotonic(), "acc": {}}

            def mark(name):
                now = time.monotonic()
                state["acc"][name] = state["acc"].get(name, 0.0) + now - state["last"]
                state["last"] = now

            return state, mark

        while steps_run < max_steps:
            t0 = time.monotonic()
            _pstate, _mark = _mkphase()
            work = frontier.filter(
                (F.col("url_state") == "pending")
                & (F.col("is_root") | ~F.col("is_target"))
            )
            if work.isEmpty():
                self.store.update_meta(step, {"next_seq": next_seq, "done": True})
                break
            step += 1
            steps_run += 1
            _mark("work_check")

            # W2 + J5: politeness admission & robots
            res = politeness.admit(
                work, self.robots, cfg.superstep_seconds, cfg.salt_shards
            )
            admitted = res.admitted.cache()
            denied = res.denied.cache()
            n_admitted, n_denied = admitted.count(), denied.count()
            n_work = work.count()
            _mark("politeness")

            # J3: fetch join — admitted batch is politeness-bounded → broadcast
            page_content = self.pages.select("url", "html")
            ok = F.broadcast(admitted).join(page_content, on="url", how="inner")
            failed = admitted.join(page_content, on="url", how="left_anti").cache()
            n_failed = failed.count()
            _mark("fetch_join")

            # K1 + P2–P6: extract + classify in one Arrow pass
            children = expand_pages(ok).withColumn(
                "partition_id", F.spark_partition_id()
            ).cache()

            # J2 within-batch first-writer dedup (url-global, insertion order)
            batch = first_writer_dedup(
                children, order_cols=["parent_seq", "item_seq"], key_cols=["url"]
            )

            # J1 (+K5): seen check — bloom prefilter, exact anti-join confirm
            seen = frontier.filter(~F.col("is_root"))
            if bloom is not None:
                maybe, definitely_new = bloom.prefilter_maybe_seen(batch)
                new = definitely_new.unionByName(anti_join_seen(maybe, seen))
            else:
                new = anti_join_seen(batch, seen)

            new = new.drop("partition_id", "found_count")
            new = assign_global_seq(
                new, ["parent_seq", "item_seq"], start=next_seq, mode=cfg.seq_mode
            )
            new_rows = finalize_new_rows(new, step).cache()
            n_new = new_rows.count()
            next_seq += n_new
            _mark("expand_dedup_seq")
            if bloom is not None and n_new:
                bloom.add_df(new_rows.select("url"))
            _mark("bloom_add")

            # state transitions (F9 CASE semantics, queries.sql:66-74):
            # fetched → processed; missing page → retry then failed
            # (errback_playwright, frontier_spider.py:310-338); robots-denied
            # → skipped. Parquet fallback for MERGE: join on unique
            # discovery_seq + coalesce; under Iceberg this is MERGE INTO.
            updates = (
                ok.select(
                    "discovery_seq",
                    F.lit("processed").alias("_new_state"),
                    F.lit(None).cast("string").alias("_new_error"),
                    F.lit(0).alias("_attempt_inc"),
                )
                .unionByName(
                    failed.select(
                        "discovery_seq",
                        F.when(
                            F.col("attempt") + 1 <= cfg.retry_times, "pending"
                        )
                        .otherwise("failed")
                        .alias("_new_state"),
                        F.when(
                            F.col("attempt") + 1 <= cfg.retry_times,
                            F.lit(None).cast("string"),
                        )
                        .otherwise(F.lit("fetch_failed: url not in corpus"))
                        .alias("_new_error"),
                        F.lit(1).alias("_attempt_inc"),
                    )
                )
                .unionByName(
                    denied.select(
                        "discovery_seq",
                        F.lit("skipped").alias("_new_state"),
                        F.lit("robots_denied").alias("_new_error"),
                        F.lit(0).alias("_attempt_inc"),
                    )
                )
            )
            frontier = (
                frontier.join(F.broadcast(updates), on="discovery_seq", how="left")
                .withColumn(
                    "url_state", F.coalesce(F.col("_new_state"), F.col("url_state"))
                )
                .withColumn(
                    "error_message",
                    F.when(F.col("_new_state").isNotNull(), F.col("_new_error"))
                    .otherwise(F.col("error_message")),
                )
                .withColumn(
                    "attempt", F.col("attempt") + F.coalesce("_attempt_inc", F.lit(0))
                )
                .drop("_new_state", "_new_error", "_attempt_inc")
                .unionByName(new_rows)
            )

            # S6/A4: per-partition lineage + per-superstep metrics
            step_lineage = (
                children.groupBy("partition_id", "root_seed_id", "category")
                .agg(
                    F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias(
                        "target_urls_found"
                    ),
                    F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias(
                        "seed_urls_found"
                    ),
                    F.count("*").alias("total_urls_found"),
                )
                .withColumn("superstep", F.lit(step))
                .select(
                    "superstep", "partition_id", "root_seed_id", "category",
                    "target_urls_found", "seed_urls_found", "total_urls_found",
                )
            )
            lineage = lineage.unionByName(step_lineage)
            n_ok = n_admitted - n_failed
            wall = time.monotonic() - t0
            step_metrics = self.spark.createDataFrame(
                [
                    (
                        step, n_work, n_admitted, n_denied,
                        n_work - n_admitted - n_denied, n_ok, n_failed, n_new,
                        wall,
                    )
                ],
                METRICS_DDL,
            )
            metrics = metrics.unionByName(step_metrics)
            _mark("metrics_lineage")

            # atomic snapshot commit; re-read to truncate lineage
            self.store.write_step(
                step,
                {"frontier": frontier, "metrics": metrics, "lineage": lineage},
                {"next_seq": next_seq, "done": False},
            )
            frontier = self.store.read_table(spark, step, "frontier")
            metrics = self.store.read_table(spark, step, "metrics")
            lineage = self.store.read_table(spark, step, "lineage")
            for df in (admitted, denied, failed, children, new_rows):
                df.unpersist()
            _mark("snapshot_write")
            if cfg.profile:
                phases = " ".join(
                    f"{k}={v:.1f}s" for k, v in _pstate["acc"].items()
                )
                print(f"[profile] step {step}: {phases}", file=sys.stderr)

        return CrawlResult(frontier, metrics, lineage, steps_run,
                           resumed_from=latest)


def run_log(result: CrawlResult) -> DataFrame:
    """Accumulated per-root-seed audit counters (config_url_log analogue)."""
    return (
        result.lineage.groupBy("root_seed_id", "category")
        .agg(
            F.sum("target_urls_found").alias("target_urls_found"),
            F.sum("seed_urls_found").alias("seed_urls_found"),
            F.sum("total_urls_found").alias("total_urls_found"),
        )
    )
