"""Single-process pure-Python oracle crawler (SURVEY.md §5.2).

Implements the exact engine contract — politeness budgets, robots rules,
retry, url-global first-writer dedup, dense discovery sequencing — as a
sequential loop over plain dicts/lists, importing the SAME kernels the
Spark engine runs inside its Arrow UDFs. The e2e tests assert the
distributed engine's frontier/seen-set/ordering/metrics are identical to
this oracle's golden outputs.

Ordering contract (SURVEY.md §3): total order (root_seed_idx, then dense
insertion order (parent_seq, item_seq)) — coincides with the reference's
visit semantics at its shipped max_depth ≤ 1 configs and is the
documented engine contract beyond that.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.kernels import (
    classify_links,
    extract_links,
    host_budget,
    main_domain,
    robots_allows,
)


@dataclass
class OracleRow:
    discovery_seq: int
    url: str
    category: str
    url_type: int
    depth: int
    max_depth: int
    main_domain: str
    target_patterns: list
    seed_pattern: str | None
    is_target: bool
    parent_url: str | None
    root_seed_id: int
    is_root: bool
    url_state: str = "pending"
    error_message: str | None = None
    attempt: int = 0
    superstep: int = 0


@dataclass
class OracleResult:
    frontier: list[OracleRow] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    supersteps: int = 0

    def seen_rows(self):
        return [r for r in self.frontier if not r.is_root]


def crawl(
    pages: dict[str, bytes],
    seeds: list[dict],
    robots: list[dict],
    superstep_seconds: float = 10.0,
    retry_times: int = 1,
    max_supersteps: int = 1000,
) -> OracleResult:
    robots_by_host = {r["main_domain"]: r for r in robots}
    res = OracleResult()

    for s in sorted(seeds, key=lambda s: s["url_seed_root_id"]):
        res.frontier.append(
            OracleRow(
                discovery_seq=s["url_seed_root_id"],
                url=s["url"],
                category=s["category"],
                url_type=s["url_type"],
                depth=0,
                max_depth=s["max_depth"],
                main_domain=main_domain(s["url"]),
                target_patterns=list(s["target_patterns"] or []),
                seed_pattern=s["seed_pattern"],
                is_target=False,
                parent_url=None,
                root_seed_id=s["url_seed_root_id"],
                is_root=True,
            )
        )
    next_seq = max((r.discovery_seq for r in res.frontier), default=-1) + 1
    step = 0

    while step < max_supersteps:
        work = sorted(
            (
                r
                for r in res.frontier
                if r.url_state == "pending" and (r.is_root or not r.is_target)
            ),
            key=lambda r: r.discovery_seq,
        )
        if not work:
            break
        step += 1

        # politeness + robots (same contract as operators/politeness.py)
        admitted, denied = [], []
        host_counts: dict[str, int] = {}
        for r in work:
            rule = robots_by_host.get(r.main_domain)
            if rule is not None and not robots_allows(
                r.url, rule["allow_patterns"], rule["deny_patterns"]
            ):
                denied.append(r)
                continue
            delay = rule["crawl_delay_s"] if rule else None
            budget = host_budget(delay, superstep_seconds)
            if host_counts.get(r.main_domain, 0) < budget:
                host_counts[r.main_domain] = host_counts.get(r.main_domain, 0) + 1
                admitted.append(r)
            # else: deferred, stays pending

        for r in denied:
            r.url_state = "skipped"
            r.error_message = "robots_denied"

        n_failed = n_ok = 0
        children: list[tuple[OracleRow, object]] = []
        for r in admitted:
            html = pages.get(r.url)
            if html is None:
                r.attempt += 1
                if r.attempt <= retry_times:
                    r.url_state = "pending"
                else:
                    r.url_state = "failed"
                    r.error_message = "fetch_failed: url not in corpus"
                n_failed += 1
                continue
            r.url_state = "processed"
            n_ok += 1
            found = extract_links(html, r.url)
            for item in classify_links(
                r.url,
                found,
                r.url_type,
                r.target_patterns,
                r.seed_pattern,
                r.depth,
                r.max_depth,
            ):
                children.append((r, item))

        # url-global first-writer dedup + seen anti-join, insertion order
        seen = {r.url for r in res.frontier if not r.is_root}
        n_new = 0
        for parent, item in children:  # already in (parent_seq, item_seq) order
            if item.url in seen:
                continue
            seen.add(item.url)
            res.frontier.append(
                OracleRow(
                    discovery_seq=next_seq,
                    url=item.url,
                    category=parent.category,
                    url_type=parent.url_type,
                    depth=item.depth,
                    max_depth=parent.max_depth,
                    main_domain=main_domain(item.url),
                    target_patterns=parent.target_patterns,
                    seed_pattern=parent.seed_pattern,
                    is_target=item.is_target,
                    parent_url=parent.url,
                    root_seed_id=parent.root_seed_id,
                    is_root=False,
                    superstep=step,
                )
            )
            next_seq += 1
            n_new += 1

        res.metrics.append(
            {
                "superstep": step,
                "n_work": len(work),
                "n_admitted": len(admitted),
                "n_denied": len(denied),
                "n_deferred": len(work) - len(admitted) - len(denied),
                "n_fetched_ok": n_ok,
                "n_fetch_failed": n_failed,
                "n_new": n_new,
            }
        )

    res.supersteps = step
    return res
