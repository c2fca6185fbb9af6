"""Intentionally minimal: the reference is NOT a streaming system.

SURVEY.md §2.8: the reference is an event-driven single-process crawl
loop with no watermarks/windows/late-data handling; its stateful
constructs (URL-seen set, frontier queue, counters, retry state) are
materialized in this engine as batch-iterative superstep state with
snapshot checkpoints (plans/driver.py + plans/store.py), per the
north-rule "pure batch-iterative DataFrame jobs" directive — not
Structured Streaming state stores.

A ``readStream``-based continuous variant would layer on top of the same
operators (politeness ranking and dedup are stateless per-microbatch
given the frontier table), but is out of contract for this graft.
"""
