"""Checkpoint/resume exactness (SURVEY.md §5.4, north-rule requirement):
a run killed after superstep k and resumed must produce a final state
identical to an uninterrupted run."""

from pyspark.sql import functions as F

from scrapy_playwright_scrapegraphai_spark.plans.driver import CrawlConfig, CrawlEngine
from scrapy_playwright_scrapegraphai_spark.plans.store import SnapshotStore

SS = 12.0


def _key(frontier):
    return sorted(
        (
            r["url"], r["category"], r["depth"], r["is_target"], r["parent_url"],
            r["url_state"], r["discovery_seq"], r["superstep"], r["is_root"],
            r["attempt"],
        )
        for r in frontier.collect()
    )


def _engine(spark, corpus_spark, ckpt):
    pages, seeds, robots = corpus_spark
    return CrawlEngine(
        spark, pages, seeds, robots, ckpt,
        CrawlConfig(superstep_seconds=SS, expected_urls=20_000),
    )


def test_resume_equals_uninterrupted(spark, corpus_spark, tmp_path):
    full = _engine(spark, corpus_spark, str(tmp_path / "full")).run()
    assert full.supersteps_run >= 3

    # "kill" after 2 supersteps, then resume to completion
    part_dir = str(tmp_path / "part")
    partial = _engine(spark, corpus_spark, part_dir).run(max_supersteps=2)
    assert partial.supersteps_run == 2
    resumed = _engine(spark, corpus_spark, part_dir).run()
    assert resumed.resumed_from == 2
    assert resumed.supersteps_run == full.supersteps_run - 2
    assert _key(resumed.frontier) == _key(full.frontier)

    # metrics history is complete and identical
    cols = ["superstep", "n_work", "n_admitted", "n_new"]
    a = [tuple(r[c] for c in cols) for r in resumed.metrics.orderBy("superstep").collect()]
    b = [tuple(r[c] for c in cols) for r in full.metrics.orderBy("superstep").collect()]
    assert a == b


def test_resume_ignores_partial_step_without_manifest(spark, corpus_spark, tmp_path):
    """A step directory without its manifest (kill mid-write) must be
    invisible: resume restarts from the last committed manifest."""
    ckpt = str(tmp_path / "ck")
    _engine(spark, corpus_spark, ckpt).run(max_supersteps=2)
    store = SnapshotStore(ckpt)
    assert store.latest_step() == 2
    # simulate a kill mid-step-3 write: directory exists, manifest absent
    import os

    os.makedirs(os.path.join(ckpt, "step=3", "frontier"), exist_ok=True)
    with open(os.path.join(ckpt, "step=3", "frontier", "junk.parquet"), "w") as fh:
        fh.write("partial garbage")
    assert store.latest_step() == 2  # manifest-last protocol hides step 3

    resumed = _engine(spark, corpus_spark, ckpt).run()
    assert resumed.resumed_from == 2
    # completes without error and reaches the done mark
    assert store.read_manifest(store.latest_step())["meta"]["done"] is True


def test_completed_run_resume_is_noop(spark, corpus_spark, tmp_path):
    ckpt = str(tmp_path / "ck2")
    full = _engine(spark, corpus_spark, ckpt).run()
    again = _engine(spark, corpus_spark, ckpt).run()
    assert again.supersteps_run == 0
    assert _key(again.frontier) == _key(full.frontier)


def test_all_fetches_fail_superstep_empty_batch(spark, corpus_spark, tmp_path):
    """Regression: a superstep where every admitted fetch fails produces an
    empty new-URL batch; assign_global_seq must handle empty offsets."""
    pages, _, robots = corpus_spark
    ghost = spark.createDataFrame(
        [(0, "Ghost", "https://nowhere.example.test/x", 2, [".pdf"], "/page/", 1)],
        "url_seed_root_id int, category string, url string, url_type int, "
        "target_patterns array<string>, seed_pattern string, max_depth int",
    )
    r = CrawlEngine(
        spark, pages, ghost, robots, str(tmp_path / "g"),
        CrawlConfig(superstep_seconds=SS),
    ).run()
    row = r.frontier.collect()[0]
    # RETRY_TIMES=1 semantics: two attempts then failed
    assert row["url_state"] == "failed" and row["attempt"] == 2


def test_store_reset_truncates_all_state(spark, corpus_spark, tmp_path):
    """S7 (clean_db.py:22-51): reset reports before-counts, wipes every
    step + manifest, and a subsequent run() bootstraps from scratch."""
    ckpt = str(tmp_path / "reset")
    eng = _engine(spark, corpus_spark, ckpt)
    first = eng.run()
    n_rows = first.frontier.count()
    store = SnapshotStore(ckpt)
    counts = store.reset(spark)
    assert counts["steps_before"] == first.supersteps_run + 1  # + step 0
    assert counts["frontier_rows_before"] == n_rows
    assert store.latest_step() is None
    rerun = _engine(spark, corpus_spark, ckpt).run()
    assert rerun.supersteps_run == first.supersteps_run
    assert _key(rerun.frontier) == _key(first.frontier)
    store.reset(spark)  # wipe the rerun's state
    # idempotent on empty state
    assert store.reset(spark) == {
        "steps_before": 0, "frontier_rows_before": 0
    }


def test_bloom_persisted_and_loaded_on_resume(spark, corpus_spark, tmp_path):
    """Resume loads the persisted bloom shards (O(shards) driver IO)
    instead of rebuilding from the frontier, with identical results; a
    missing/corrupt file falls back to the exact rebuild."""
    import os

    full = _engine(spark, corpus_spark, str(tmp_path / "bloomfull")).run()

    ckpt = str(tmp_path / "bloomres")
    eng = _engine(spark, corpus_spark, ckpt)
    eng.run(max_supersteps=2)  # incomplete run
    assert eng._bloom_source == "fresh"
    assert os.path.exists(eng._bloom_path())  # saved by the merge thread

    # corrupt file → resume must fall back to the exact rebuild, with
    # identical final state (the bloom is a prefilter only)
    with open(eng._bloom_path(), "wb") as fh:
        fh.write(b"garbage")
    eng2 = _engine(spark, corpus_spark, ckpt)
    r2 = eng2.run()
    assert eng2._bloom_source == "rebuilt"
    assert _key(r2.frontier) == _key(full.frontier)


def test_bloom_gap_merge_on_mid_run_resume(spark, corpus_spark, tmp_path):
    """Kill after superstep 1 (bloom saved at step 1), resume to
    completion: the loaded shards are topped up with later steps' deltas
    and the final state equals an uninterrupted run."""
    ckpt_a = str(tmp_path / "full")
    full = _engine(spark, corpus_spark, ckpt_a).run()

    ckpt_b = str(tmp_path / "killed")
    eng1 = _engine(spark, corpus_spark, ckpt_b)
    eng1.run(max_supersteps=1)  # "killed" after step 1; bloom file at step 1
    eng2 = _engine(spark, corpus_spark, ckpt_b)
    resumed = eng2.run()
    assert eng2._bloom_source == "checkpoint"
    assert _key(resumed.frontier) == _key(full.frontier)


def test_fresh_start_wipes_stale_higher_steps(spark, corpus_spark, tmp_path):
    """run(resume=False) into a populated checkpoint truncates ALL prior
    state; a later resume must see only the new run (never fold deltas
    from two different runs)."""
    ckpt = str(tmp_path / "stale")
    old = _engine(spark, corpus_spark, ckpt).run()  # e.g. 4-5 supersteps
    assert old.supersteps_run >= 3
    store = SnapshotStore(ckpt)
    old_latest = store.latest_step()

    # fresh run, DIFFERENT workload (single root seed), fewer supersteps
    pages, seeds, robots = corpus_spark
    one_seed = seeds.filter(F.col("url_seed_root_id") == 1)
    eng = CrawlEngine(
        spark, pages, one_seed, robots, ckpt,
        CrawlConfig(superstep_seconds=SS, expected_urls=20_000),
    )
    fresh = eng.run(resume=False)
    assert store.latest_step() < old_latest  # stale manifests are gone
    resumed = CrawlEngine(
        spark, pages, one_seed, robots, ckpt,
        CrawlConfig(superstep_seconds=SS, expected_urls=20_000),
    ).run()
    assert resumed.supersteps_run == 0  # fresh run had completed
    assert _key(resumed.frontier) == _key(fresh.frontier)
