"""Byte attribution for a quad-probe child's event log: per-stage shuffle
read/write, input, spill, and Python/Arrow exchange proxies — the evidence
base for the round-6 DRAM-share reduction (BENCH/PIPELINE_QUAD.json's
process-scaling headline is bandwidth-bound per the hw bracket, so the fix
is fewer bytes, and this names which stage owns them).

Usage: python scripts/probe_bytes.py <event_dir_or_file>
Prints one JSON line: totals + top stages by (shuffle write + read).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict


def main() -> None:
    target = sys.argv[1]
    files = []
    if os.path.isdir(target):
        for d in sorted(glob.glob(os.path.join(target, "*"))):
            files.extend(
                sorted(glob.glob(os.path.join(d, "events_*")))
                if os.path.isdir(d) else [d]
            )
    else:
        files = [target]
    per_stage: dict = defaultdict(lambda: defaultdict(float))
    stage_names: dict = {}
    tot: dict = defaultdict(float)
    for path in files:
        with open(path) as f:
            for line in f:
                if '"SparkListenerStageCompleted"' in line:
                    ev = json.loads(line)
                    si = ev.get("Stage Info", {})
                    stage_names[si.get("Stage ID")] = si.get("Stage Name", "")[:80]
                    continue
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                sid = ev.get("Stage ID")
                tm = ev.get("Task Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                im = tm.get("Input Metrics") or {}
                m = per_stage[sid]
                m["shuffle_read"] += (
                    sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                )
                m["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
                m["input"] += im.get("Bytes Read", 0)
                m["spill_disk"] += tm.get("Disk Bytes Spilled", 0)
                m["spill_mem"] += tm.get("Memory Bytes Spilled", 0)
                m["run_sec"] += tm.get("Executor Run Time", 0) / 1e3
                m["cpu_sec"] += tm.get("Executor CPU Time", 0) / 1e9
    for sid, m in per_stage.items():
        for k, v in m.items():
            tot[k] += v
    mb = lambda v: round(v / 1e6, 1)
    stages = sorted(
        per_stage.items(),
        key=lambda kv: -(kv[1]["shuffle_read"] + kv[1]["shuffle_write"]),
    )[:12]
    print(json.dumps({
        "totals_mb": {k: mb(v) for k, v in tot.items() if k.endswith(("read", "write", "input", "disk", "mem"))},
        "total_run_sec": round(tot["run_sec"], 1),
        "total_cpu_sec": round(tot["cpu_sec"], 1),
        "top_stages": [
            {
                "stage": sid,
                "name": stage_names.get(sid, ""),
                "sw_mb": mb(m["shuffle_write"]),
                "sr_mb": mb(m["shuffle_read"]),
                "in_mb": mb(m["input"]),
                "run_sec": round(m["run_sec"], 1),
            }
            for sid, m in stages
        ],
    }, indent=1))


if __name__ == "__main__":
    main()
