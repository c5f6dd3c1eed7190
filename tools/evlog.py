#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall-clock and description, plus
per-stage task-time totals — the optimization round's profiling view.

Usage: python3 tools/evlog.py <eventlog-file> [--stages]
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    show_stages = "--stages" in sys.argv
    jobs = {}
    stage_names = {}
    stage_task_ms = defaultdict(float)
    stage_tasks = defaultdict(int)
    stage_job = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", "")
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": desc,
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
                for s in ev["Stage Infos"]:
                    stage_names[s["Stage ID"]] = s["Stage Name"]
                    stage_job[s["Stage ID"]] = jid
            elif kind == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                stage_task_ms[sid] += m.get("Executor Run Time", 0)
                stage_tasks[sid] += 1

    total = 0.0
    print(f"{'job':>4} {'wall_s':>8} {'task_s':>8}  description / top stage")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        wall = (j["end"] - j["start"]) / 1000.0
        total += wall
        tsum = sum(stage_task_ms[s] for s in j["stages"]) / 1000.0
        top = max(j["stages"], key=lambda s: stage_task_ms[s], default=None)
        label = j["desc"] or (stage_names.get(top, "")[:90] if top is not None else "")
        print(f"{jid:>4} {wall:8.2f} {tsum:8.1f}  {label[:100]}")
        if show_stages:
            for s in sorted(j["stages"]):
                if stage_tasks[s]:
                    print(f"       stage {s}: {stage_task_ms[s]/1000:8.1f} task-s "
                          f"{stage_tasks[s]:>4} tasks  {stage_names.get(s,'')[:80]}")
    print(f"sum of job wall-clock: {total:.2f} s over {len(jobs)} jobs")


if __name__ == "__main__":
    main()
