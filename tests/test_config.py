"""S1: YAML crawl-config ingestion + cross-field seed validation
(reference: config_utils.py:8-26, crawler_config.yaml, frontier_model.py:60-95)."""

import textwrap

import pytest
from pyspark.sql import functions as F

from scrapy_playwright_scrapegraphai_spark.sources import config as C

REFERENCE_SHAPE_YAML = textwrap.dedent(
    """
    categories:
      - name: "Torino"
        description: "Borse di studio"
        urls:
          - url_seed_root_id: 0
            url: "https://pubblicazioni.example.test/visualizza?tipo=25"
            type: 1
            target_patterns:
              - ".*\\\\.pdf$"
              - ".*download.*pdf.*"
            seed_pattern: null
            max_depth: 0
      - name: "Bologna"
        description: "Premi di laurea"
        urls:
          - url_seed_root_id: 1
            url: "https://bandi.example.test/borse?b_start:int=0"
            type: 2
            target_patterns:
              - ".pdf"
            seed_pattern: "/s/abis1/"
            max_depth: 1
          - url_seed_root_id: 2
            url: "https://bandi.example.test/premi-laurea"
            type: 2
            target_patterns:
              - ".pdf"
            seed_pattern: "/s/abis1/"
            max_depth: 1
    """
)


def _write(tmp_path, text):
    p = tmp_path / "crawler_config.yaml"
    p.write_text(text)
    return str(p)


def test_load_reference_shape(tmp_path):
    rows = C.seeds_from_config(
        C.load_crawler_config(_write(tmp_path, REFERENCE_SHAPE_YAML))
    )
    assert [r["url_seed_root_id"] for r in rows] == [0, 1, 2]  # config order
    assert rows[0]["category"] == "Torino"
    assert rows[0]["url_type"] == 1 and rows[0]["max_depth"] == 0
    assert rows[1]["seed_pattern"] == "/s/abis1/"
    assert rows[0]["target_patterns"] == [".*\\.pdf$", ".*download.*pdf.*"]


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        C.load_crawler_config("/nonexistent/crawler_config.yaml")


@pytest.mark.parametrize(
    "row,fragment",
    [
        # frontier_model.py:63-75 type/depth rules
        ({"url": "https://a.test/x", "category": "c", "url_type": 0,
          "target_patterns": ["x"], "max_depth": 1}, "max_depth = 0"),
        ({"url": "https://a.test/x", "category": "c", "url_type": 1,
          "max_depth": 2}, "max_depth = 0"),
        ({"url": "https://a.test/x", "category": "c", "url_type": 2,
          "seed_pattern": "/s/", "max_depth": 0}, "max_depth = 1"),
        ({"url": "https://a.test/x", "category": "c", "url_type": 3,
          "seed_pattern": "/s/", "max_depth": 1}, "max_depth = 2"),
        ({"url": "https://a.test/x", "category": "c", "url_type": 4,
          "max_depth": 1}, "max_depth >= 2"),
        # frontier_model.py:77-84 type 0 needs target patterns
        ({"url": "https://a.test/x", "category": "c", "url_type": 0,
          "target_patterns": [], "max_depth": 0}, "target patterns"),
        # frontier_model.py:86-93 types 2/3 need a seed pattern
        ({"url": "https://a.test/x", "category": "c", "url_type": 2,
          "max_depth": 1}, "seed pattern"),
        ({"url": "https://a.test/x", "category": "c", "url_type": 3,
          "seed_pattern": None, "max_depth": 2}, "seed pattern"),
        # HttpUrl semantics (frontier_model.py:34)
        ({"url": "notaurl", "category": "c", "url_type": 1, "max_depth": 0},
         "invalid url"),
        ({"url": "ftp://a.test/x", "category": "c", "url_type": 1,
          "max_depth": 0}, "invalid url"),
        # category length (frontier_model.py:35)
        ({"url": "https://a.test/x", "category": "", "url_type": 1,
          "max_depth": 0}, "category"),
        ({"url": "https://a.test/x", "category": "c" * 256, "url_type": 1,
          "max_depth": 0}, "category"),
        # unknown type
        ({"url": "https://a.test/x", "category": "c", "url_type": 9,
          "max_depth": 0}, "url_type"),
    ],
)
def test_validation_rules(row, fragment):
    errs = C.validate_seed_row(row)
    assert errs, f"expected a violation for {row}"
    assert any(fragment in e for e in errs), f"{fragment!r} not in {errs}"


def test_valid_rows_pass():
    for row in (
        {"url": "https://a.test/x.pdf", "category": "c", "url_type": 0,
         "target_patterns": [".pdf"], "max_depth": 0},
        {"url": "https://a.test/x", "category": "c", "url_type": 1,
         "max_depth": 0},
        {"url": "http://a.test/x", "category": "c", "url_type": 2,
         "seed_pattern": "/p/", "max_depth": 1},
        {"url": "https://a.test/x", "category": "c", "url_type": 4,
         "max_depth": 5},
    ):
        assert C.validate_seed_row(row) == []


def test_bad_config_reports_every_violation(tmp_path):
    bad = textwrap.dedent(
        """
        categories:
          - name: "X"
            urls:
              - url_seed_root_id: 0
                url: "https://a.test/x"
                type: 2
                max_depth: 0
              - url_seed_root_id: 0
                url: "nope"
                type: 1
                max_depth: 0
        """
    )
    with pytest.raises(ValueError) as ei:
        C.seeds_from_config(C.load_crawler_config(_write(tmp_path, bad)))
    msg = str(ei.value)
    assert "max_depth = 1" in msg and "seed pattern" in msg
    assert "invalid url" in msg and "unique" in msg


def test_yaml_driven_crawl_e2e(spark, tmp_path):
    """An end-to-end crawl whose seeds come from a YAML config must equal
    the same crawl with programmatically built seeds."""
    import tempfile

    from scrapy_playwright_scrapegraphai_spark.plans.driver import (
        CrawlConfig,
        CrawlEngine,
    )
    from scrapy_playwright_scrapegraphai_spark.sources.synth import (
        SEEDS_DDL,
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(n_hosts=6, pages_per_host=10, seed=7)
    pages, _, robots = corpus_to_spark(spark, corpus)
    host1, host2 = "host0.example.test", "host1.example.test"
    yaml_text = textwrap.dedent(
        f"""
        categories:
          - name: "CatA"
            urls:
              - url_seed_root_id: 0
                url: "https://{host1}/page/0"
                type: 2
                target_patterns:
                  - ".pdf"
                seed_pattern: "/page/"
                max_depth: 1
          - name: "CatB"
            urls:
              - url_seed_root_id: 1
                url: "https://{host2}/page/0"
                type: 1
                target_patterns:
                  - ".pdf"
                  - "/download/"
                seed_pattern: null
                max_depth: 0
        """
    )
    seeds_yaml = C.seeds_df_from_yaml(spark, _write(tmp_path, yaml_text))
    rows = [
        (0, "CatA", f"https://{host1}/page/0", 2, [".pdf"], "/page/", 1),
        (1, "CatB", f"https://{host2}/page/0", 1, [".pdf", "/download/"], None, 0),
    ]
    seeds_prog = spark.createDataFrame(rows, SEEDS_DDL)

    def run(seeds):
        eng = CrawlEngine(
            spark, pages, seeds, robots, tempfile.mkdtemp(),
            CrawlConfig(superstep_seconds=8.0),
        )
        r = eng.run()
        return sorted(
            (x["discovery_seq"], x["url"], x["url_state"], x["depth"])
            for x in r.frontier.collect()
        )

    got, want = run(seeds_yaml), run(seeds_prog)
    assert got == want
    assert len(got) > 2  # the crawl actually expanded


def test_run_crawl_cli_surface(spark, tmp_path):
    """run.py: YAML-driven run_crawl with the --url_seed_root_id filter
    (run_spider.py:21-60 + frontier_spider.py:58-59 parity)."""
    import textwrap as tw

    from scrapy_playwright_scrapegraphai_spark.run import run_crawl
    from scrapy_playwright_scrapegraphai_spark.sources.synth import (
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(n_hosts=4, pages_per_host=8, seed=3)
    pages, _, robots = corpus_to_spark(spark, corpus)
    yaml_path = tmp_path / "cfg.yaml"
    yaml_path.write_text(tw.dedent(
        """
        categories:
          - name: "A"
            urls:
              - url_seed_root_id: 0
                url: "https://host0.example.test/page/0"
                type: 2
                target_patterns: [".pdf"]
                seed_pattern: "/page/"
                max_depth: 1
              - url_seed_root_id: 1
                url: "https://host1.example.test/page/0"
                type: 1
                target_patterns: [".pdf"]
                seed_pattern: null
                max_depth: 0
        """
    ))
    # full run: both roots crawled, robots=None → ROBOTSTXT_OBEY=False
    r_all = run_crawl(spark, pages, str(yaml_path), str(tmp_path / "ck_all"))
    roots_all = {
        r["root_seed_id"]
        for r in r_all.frontier.filter("is_root").collect()
    }
    assert roots_all == {0, 1}
    assert r_all.frontier.filter("url_state = 'skipped'").count() == 0

    # filtered run: only root 1
    r_one = run_crawl(
        spark, pages, str(yaml_path), str(tmp_path / "ck_one"),
        url_seed_root_id=1,
    )
    roots_one = {
        r["root_seed_id"]
        for r in r_one.frontier.filter("is_root").collect()
    }
    assert roots_one == {1}
    assert r_one.frontier.count() < r_all.frontier.count()


def test_empty_yaml_config_rejected(tmp_path):
    for text in ("", "# just a comment\n", "- a\n- b\n"):
        with pytest.raises(ValueError, match="invalid crawler config"):
            C.seeds_from_config(C.load_crawler_config(_write(tmp_path, text)))
