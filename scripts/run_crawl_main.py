#!/usr/bin/env python
"""Cluster launch wrapper — the script file ``spark-submit`` needs.

North-rule launch path (BASELINE.md): the whole pipeline runs via

    spark-submit --master <cluster> \
        --py-files sps_pkg.zip \
        scripts/run_crawl_main.py \
        --pages <pages table> --config crawler_config.yaml \
        --checkpoint <snapshot dir> [--robots <robots table>] ...

where ``sps_pkg.zip`` comes from
``scrapy_playwright_scrapegraphai_spark.entry_queries.build_pkg_zip``
(or any zip of the package directory). spark-submit takes a script
path, not a module flag, so this file exists only to dispatch into the
package — which must be importable from ``--py-files`` alone: no repo
checkout is required on the driver or any executor, and this script
deliberately contains no logic that could mask a broken zip.
Smoke-tested end-to-end (driver cwd outside the repo, PYTHONPATH
stripped) in tests/test_spark_submit.py.
"""

from scrapy_playwright_scrapegraphai_spark.run import main

if __name__ == "__main__":
    main()
