"""One profiled 8-core crawl leg: generates the bench corpus if absent,
then runs bench.crawl_run(8) with SPARK_GRAFT_PROFILE=1 so the per-phase
seed-superstep breakdown (the round-5 ≤5 s target, VERDICT r4 task #2)
prints to stderr. Not part of the bench artifact — a developer loop tool.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_PROFILE", "1")
os.environ.setdefault("SPARK_GRAFT_WARM_REST", "10")

import bench  # noqa: E402
from scrapy_playwright_scrapegraphai_spark.sources.bench_corpus import (  # noqa: E402
    generate_bench_corpus,
)

facts = generate_bench_corpus(
    bench.CORPUS_PATH,
    n_hosts=bench.N_HOSTS,
    pages_per_host=bench.PAGES_PER_HOST,
    links_per_page=bench.LINKS_PER_PAGE,
    words_per_page=bench.WORDS_PER_PAGE,
)
print(f"# corpus: {facts}", file=sys.stderr)

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
proc = subprocess.run(
    [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-run", str(cores)],
    env=os.environ.copy(),
)
sys.exit(proc.returncode)
