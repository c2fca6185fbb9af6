"""Top-level crawl entry point — the reference's ``run_spider.py`` analogue.

Reference lifecycle (/root/reference/src/run_spider.py:21-60): parse
``--url_seed_root_id``, load the YAML config, initialize storage, start the
spider. Here the same surface is a single function + CLI over the batch
engine: load + validate the YAML seeds (S1), optionally filter to one root
seed (P1, frontier_spider.py:58-59), and run the superstep driver against
a pages table, checkpointed for exact resume.

Robots default: the reference crawls with ``ROBOTSTXT_OBEY = False``
(settings.py:49) — an empty robots table reproduces that (no deny rules ⇒
everything admitted under the default crawl delay).

Cluster launch (north rule): ``spark-submit --py-files sps_pkg.zip
run_crawl_main.py --pages ... --config ...`` where the tiny wrapper
script just calls :func:`main` (spark-submit takes a script path, not a
module flag); locally, ``python -m scrapy_playwright_scrapegraphai_spark.run``
works directly and the package zip ships via ``ensure_worker_imports``.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.driver import CrawlConfig, CrawlEngine, CrawlResult
from .sources.config import seeds_df_from_yaml
from .sources.synth import ROBOTS_DDL


def empty_robots(spark: SparkSession) -> DataFrame:
    """ROBOTSTXT_OBEY=False equivalent: no rules, default crawl delay."""
    return spark.createDataFrame([], ROBOTS_DDL)


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    config_path: str,
    checkpoint_dir: str,
    url_seed_root_id: int | None = None,
    robots: DataFrame | None = None,
    config: CrawlConfig | None = None,
    resume: bool = True,
) -> CrawlResult:
    """YAML config → validated seeds → full checkpointed crawl.

    ``url_seed_root_id`` filters the seed list exactly like the
    reference's CLI flag (frontier_spider.py:58-59: only matching
    url_configs are emitted).
    """
    from .entry_queries import ensure_worker_imports

    ensure_worker_imports(spark)
    seeds = seeds_df_from_yaml(spark, config_path)
    if url_seed_root_id is not None:
        seeds = seeds.filter(
            F.col("url_seed_root_id") == F.lit(int(url_seed_root_id))
        )
    engine = CrawlEngine(
        spark,
        pages,
        seeds,
        robots if robots is not None else empty_robots(spark),
        checkpoint_dir,
        config,
    )
    return engine.run(resume=resume)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="path of the pages table (parquet/Iceberg)")
    ap.add_argument("--config", required=True, help="crawler_config.yaml path")
    ap.add_argument("--checkpoint", required=True,
                    help="snapshot/checkpoint directory")
    ap.add_argument("--url_seed_root_id", type=int, default=None,
                    help="crawl only this root seed (reference CLI parity)")
    ap.add_argument("--robots", default=None,
                    help="optional robots_rules table path (parquet)")
    ap.add_argument("--superstep-seconds", type=float, default=10.0)
    ap.add_argument("--max-supersteps", type=int, default=1000)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.getOrCreate()
    pages = spark.read.parquet(args.pages)
    robots = spark.read.parquet(args.robots) if args.robots else None
    cfg = CrawlConfig(
        superstep_seconds=args.superstep_seconds,
        max_supersteps=args.max_supersteps,
    )
    result = run_crawl(
        spark, pages, args.config, args.checkpoint,
        url_seed_root_id=args.url_seed_root_id, robots=robots, config=cfg,
        resume=not args.no_resume,
    )
    from .operators.stats import config_url_log

    print(f"supersteps run: {result.supersteps_run}")
    result.metrics.orderBy("superstep").show(truncate=False)
    config_url_log(result.frontier, result.lineage).orderBy(
        "root_seed_id"
    ).show(truncate=False)


if __name__ == "__main__":
    main()
