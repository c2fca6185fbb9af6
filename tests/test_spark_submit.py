"""North-rule launch-path smoke: one end-to-end crawl through REAL
``spark-submit --py-files`` (scripts/run_crawl_main.py), with the driver
cwd OUTSIDE the repo and PYTHONPATH stripped of it — so driver- and
worker-side package imports must resolve from the zip alone, exactly as
on a multi-executor cluster with no repo checkout on any node."""

import os
import shutil
import subprocess

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    return cand if os.path.exists(cand) else None


def _yaml_from_seeds(seeds: list[dict]) -> dict:
    """corpus.seeds rows → the reference crawler_config.yaml shape.

    The synth corpus stretches beyond the reference's cross-field rules
    (a type-2 seed at max_depth 2, a pattern-less type-0 direct target)
    to exercise engine paths; the YAML surface enforces the reference's
    validation (frontier_model.py:60-95), so conform the rows here —
    this smoke test asserts the LAUNCH path, not corpus semantics."""
    cats: dict[str, list[dict]] = {}
    for s in seeds:
        cats.setdefault(s["category"], []).append(
            {
                "url_seed_root_id": s["url_seed_root_id"],
                "url": s["url"],
                "type": s["url_type"],
                "target_patterns": list(s["target_patterns"]) or [".pdf"],
                "seed_pattern": s["seed_pattern"],
                "max_depth": 1 if s["url_type"] == 2 else s["max_depth"],
            }
        )
    return {
        "categories": [
            {"name": name, "description": name, "urls": urls}
            for name, urls in cats.items()
        ]
    }


def test_spark_submit_py_files_e2e(spark, tmp_path):
    exe = _spark_submit()
    assert exe, "spark-submit not found (shipped with pyspark)"
    from scrapy_playwright_scrapegraphai_spark.entry_queries import (
        build_pkg_zip,
    )
    from scrapy_playwright_scrapegraphai_spark.sources.synth import (
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(n_hosts=4, pages_per_host=6, seed=7)
    pages, _seeds, robots = corpus_to_spark(spark, corpus)
    pages_path = str(tmp_path / "pages.parquet")
    robots_path = str(tmp_path / "robots.parquet")
    pages.write.parquet(pages_path)
    robots.write.parquet(robots_path)
    cfg_path = tmp_path / "crawler_config.yaml"
    cfg_path.write_text(yaml.safe_dump(_yaml_from_seeds(corpus.seeds)))

    zpath = build_pkg_zip(str(tmp_path / "sps_pkg.zip"))
    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # imports must come from --py-files, not the repo
    cmd = [
        exe,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zpath,
        os.path.join(REPO, "scripts", "run_crawl_main.py"),
        "--pages", pages_path,
        "--config", str(cfg_path),
        "--checkpoint", str(ckpt),
        "--robots", robots_path,
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "supersteps run:" in proc.stdout, proc.stdout[-2000:]
    # the crawl actually ran and committed snapshots: a step-0 base plus
    # at least one delta step with a manifest
    steps = sorted(p.name for p in ckpt.iterdir() if p.name.startswith("step="))
    manifests = sorted(
        p.name for p in ckpt.iterdir() if p.name.startswith("manifest_")
    )
    assert len(steps) >= 2 and len(manifests) >= 2, (steps, manifests)
    # metrics table printed per-superstep rows (driver-side package code ran)
    assert "n_admitted" in proc.stdout
