#!/usr/bin/env python
"""Critical-path analysis of a Spark event log (diagnostics only).

Usage: python scripts/analyze_eventlog.py <eventlog file>

Prints the job timeline (submit -> complete, with concurrency), the idle
gaps where NO job was running (driver-side serial time: plan analysis,
py4j round-trips, collect processing), and per-stage task-count /
task-time summaries — the data needed to decide whether fixed cost at a
given core count is scheduler dispatch, Catalyst, or genuine compute.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str) -> None:
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    app_start = app_end = None
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:60],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "tasks": si["Number of Tasks"],
                    "name": si["Stage Name"][:50],
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                }

    done = [j for j in jobs.values() if "end" in j]
    if not done:
        print("no completed jobs")
        return
    t0 = min(j["start"] for j in done)
    print(f"jobs: {len(done)}   stages: {len(stages)}   "
          f"total stage tasks: {sum(s['tasks'] for s in stages.values())}")

    # idle gaps: intervals where no job is running
    evs = []
    for j in done:
        evs.append((j["start"], 1))
        evs.append((j["end"], -1))
    evs.sort()
    running, last, idle, gaps = 0, None, 0.0, []
    for t, d in evs:
        if running == 0 and last is not None and t > last:
            idle += t - last
            if t - last > 200:
                gaps.append((last - t0, t - t0, t - last))
        running += d
        if running == 0:
            last = t
        elif running > 0 and d == 1 and last is None:
            last = None
    span = max(j["end"] for j in done) - t0
    print(f"jobbed span: {span/1000:.1f}s   no-job idle inside span: "
          f"{idle/1000:.1f}s")
    print("gaps >0.2s (start_s, end_s, len_s):")
    for a, b, g in gaps[:40]:
        print(f"  {a/1000:8.2f} -> {b/1000:8.2f}  {g/1000:6.2f}s")

    print("\nlongest jobs:")
    for jid, j in sorted(
        jobs.items(), key=lambda kv: -(kv[1].get("end", 0) - kv[1]["start"])
    )[:25]:
        if "end" not in j:
            continue
        ntasks = sum(stages[s]["tasks"] for s in j["stages"] if s in stages)
        print(
            f"  job {jid:4d}  {(j['start']-t0)/1000:8.2f}s  "
            f"+{(j['end']-j['start'])/1000:7.2f}s  tasks={ntasks:5d}  "
            f"{j['desc']}"
        )

    # histogram of job durations
    buckets = defaultdict(int)
    for j in done:
        d = j["end"] - j["start"]
        b = ("<50ms" if d < 50 else "<200ms" if d < 200 else "<1s"
             if d < 1000 else "<5s" if d < 5000 else ">=5s")
        buckets[b] += 1
    print("\njob duration histogram:", dict(buckets))


if __name__ == "__main__":
    main(sys.argv[1])
