"""Large deterministic pages corpus for throughput benchmarking.

Streams parquet via pyarrow (no driver-side createDataFrame of the whole
corpus). Same page/link semantics as synth.py but sized for measuring the
fetch-join → extract → classify → dedup pipeline throughput: many hosts,
heavier pages (more anchors, more text), one mega-host for skew.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

_WORDS = (
    "the of and to in is it for on with page document archive report city "
    "council public notice meeting budget plan street light data value"
).split()


def generate_bench_corpus(
    path: str,
    n_hosts: int = 64,
    pages_per_host: int = 256,
    links_per_page: int = 40,
    mega_host_factor: int = 8,
    seed: int = 42,
    chunk_rows: int = 400,  # one row group per chunk → enough input splits
    words_per_page: int = 120,
) -> dict:
    """Write pages parquet to ``path``; return corpus facts (row counts).

    Deterministic; idempotent (skips regeneration if the manifest row
    count matches).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rng = random.Random(seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    host_pages = {
        h: pages_per_host * (mega_host_factor if h == 0 else 1)
        for h in range(n_hosts)
    }
    total = sum(host_pages.values())
    # warm-up corpus: a SMALL synthetic hub (page 0) + pages 1-3 per host
    # (pages 1-3 byte-identical to the main corpus rows). A micro-crawl
    # over it in the same JVM compiles every superstep plan shape
    # (wholestage codegen, window/join exec classes, Python worker pool)
    # that the timed crawl executes: the warm hub links to just enough
    # pages that the step-2 pending count clears the engine's
    # lookup_pushdown_threshold (4096), so the warm step 2 takes the SAME
    # salted-two-phase politeness + streaming-scan fetch path as the
    # timed step 2, while the warm step 1 takes the same In-pushdown
    # point-lookup path (48 seeds). Compiled classes depend on plan
    # SHAPE, not data values, so the hub html itself need not match the
    # main hub — reusing the real hub (2k+ links/host) made the untimed
    # warm-up process a full 56k-row frontier, burning ~100 s of host
    # CPU budget inside every measured leg for zero extra plan coverage.
    warm_hub_links = max(4, (4300 + n_hosts - 1) // n_hosts)
    warm_path = warm_corpus_path(path)
    warm_total = n_hosts * 4
    if os.path.exists(path) and os.path.exists(warm_path):
        try:
            if (
                pq.read_metadata(path).num_rows == total
                and pq.read_metadata(warm_path).num_rows == warm_total
            ):
                return {"rows": total, "path": path, "regenerated": False}
        except Exception:
            pass

    import datetime as dt

    epoch = dt.datetime(2024, 11, 15)
    # page indexes (parquet ColumnIndex/OffsetIndex): the data is written
    # clustered by host with tight per-page url min/max, so a pushed-down
    # In(url, [...]) predicate from the engine's small-batch lookup path
    # skips whole data pages — a point fetch decodes ~none of the html of
    # non-matching rows instead of the full corpus
    writer = pq.ParquetWriter(path, schema, write_page_index=True)
    warm_writer = pq.ParquetWriter(warm_path, schema, write_page_index=True)
    buf = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    warm_buf = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    ts = 0

    def flush():
        if not buf["url"]:
            return
        writer.write_table(pa.table(buf, schema=schema))
        for v in buf.values():
            v.clear()

    for h in range(n_hosts):
        count = host_pages[h]
        host = f"bench{h}.example.test"
        for j in range(count):
            parts = [f"<html><head><title>p{j} {host}</title></head><body>"]
            wl = rng.choices(_WORDS, k=words_per_page)
            words = " ".join(wl)
            # spread the text over paragraphs so extract_text sees many nodes
            for w0 in range(0, words_per_page, 60):
                parts.append(f"<p>{' '.join(wl[w0:w0 + 60])}</p>")
            if j == 0:
                # page 0 is the hub: links to every page of the host, so a
                # max_depth=1 crawl reaches the full host in ONE superstep
                # (big parallel batch instead of many small BFS waves); the
                # mega-host hub is also the politeness-skew stressor
                for k in range(1, count):
                    parts.append(f'<a href="/page/{k}">s{k}</a>')
            for _ in range(links_per_page):
                k = rng.randrange(count)
                parts.append(f'<a href="/page/{k}">s{k}</a>')
            for _ in range(4):
                d = rng.randrange(10000)
                parts.append(f'<a href="/files/doc{d}.pdf">t{d}</a>')
            parts.append("</body></html>")
            html = "".join(parts).encode()
            buf["url"].append(f"https://{host}/page/{j}")
            buf["warc_ts"].append(epoch + dt.timedelta(seconds=ts))
            buf["html"].append(html)
            buf["text"].append(words)  # bench corpus: text not parity-checked
            buf["lang"].append("en")
            if j == 0:
                # warm hub: same url, small fan-out (see warm_hub_links)
                wparts = [
                    f"<html><head><title>p0 {host}</title></head><body>",
                    f"<p>{' '.join(wl[:60])}</p>",
                ]
                for k in range(1, warm_hub_links + 1):
                    wparts.append(f'<a href="/page/{k}">s{k}</a>')
                for d in range(4):
                    wparts.append(f'<a href="/files/doc{d}.pdf">t{d}</a>')
                wparts.append("</body></html>")
                warm_buf["url"].append(buf["url"][-1])
                warm_buf["warc_ts"].append(buf["warc_ts"][-1])
                warm_buf["html"].append("".join(wparts).encode())
                warm_buf["text"].append(buf["text"][-1])
                warm_buf["lang"].append("en")
            elif j < 4:
                for k in warm_buf:
                    warm_buf[k].append(buf[k][-1])
            ts += 1
            if len(buf["url"]) >= chunk_rows:
                flush()
    flush()
    writer.close()
    warm_writer.write_table(pa.table(warm_buf, schema=schema))
    warm_writer.close()
    return {"rows": total, "path": path, "regenerated": True}


def warm_corpus_path(path: str) -> str:
    """Path of the warm-up micro-corpus generated alongside ``path``.

    The ``_warm2`` suffix versions the warm-corpus FORMAT (small
    synthetic hubs) — the idempotency check above only compares row
    counts, which the format change kept identical, so a new filename is
    what forces stale warm files from the old format to regenerate.
    """
    return (
        path[: -len(".parquet")] + "_warm2.parquet"
        if path.endswith(".parquet")
        else path + "_warm2"
    )


def bench_seeds_and_robots(n_hosts: int = 64):
    seeds = [
        {
            "url_seed_root_id": h,
            "category": f"bench{h}",
            "url": f"https://bench{h}.example.test/page/0",
            "url_type": 2,
            "target_patterns": [".pdf"],
            "seed_pattern": "/page/",
            "max_depth": 1,  # hub roots reach the whole host at depth 1
        }
        for h in range(n_hosts)
    ]
    robots = [
        {
            "main_domain": f"bench{h}.example.test",
            "allow_patterns": [],
            "deny_patterns": ["/private/"],
            "crawl_delay_s": 1.0,
        }
        for h in range(n_hosts)
    ]
    return seeds, robots
