"""Summarize a Spark event log: per-stage task counts and durations.

Usage: python scripts/analyze_evlog.py /tmp/evlog_dir [min_stage_ms]
Groups repeated stage shapes (same name) and prints count, tasks, and
duration stats — enough to see which superstep stage loses parallelism or
time under a config variant.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def main():
    d = sys.argv[1]
    min_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cands = []
    for root, _dirs, fs in os.walk(d):
        for f in fs:
            if f.startswith("events"):
                cands.append(os.path.join(root, f))
            elif os.path.isfile(os.path.join(root, f)) and f.startswith("eventlog"):
                cands.append(os.path.join(root, f))
    if not cands:
        print("no event logs in", d)
        return
    path = max(cands, key=os.path.getmtime)

    if path.endswith(".zstd"):
        import io
        import subprocess

        raw = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=False
        )
        if raw.returncode != 0:
            try:
                import zstandard

                data = zstandard.ZstdDecompressor().decompress(
                    open(path, "rb").read(), max_output_size=1 << 31
                )
            except ImportError:
                print("no zstd available to read", path)
                return
        else:
            data = raw.stdout
        fh = io.StringIO(data.decode(errors="ignore"))
    else:
        fh = open(path, errors="ignore")
    by_name = defaultdict(list)
    for line in fh:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerStageCompleted":
            continue
        si = ev["Stage Info"]
        sub = si.get("Submission Time")
        comp = si.get("Completion Time")
        if sub is None or comp is None:
            continue
        dur = comp - sub
        name = si.get("Stage Name", "?").split("\n")[0]
        by_name[name].append((dur, si.get("Number of Tasks", 0)))
    rows = []
    for name, xs in by_name.items():
        durs = sorted(x[0] for x in xs)
        total = sum(durs)
        if total < min_ms:
            continue
        tasks = sorted({x[1] for x in xs})
        rows.append((total, name, len(xs), tasks, durs[len(durs) // 2], durs[-1]))
    rows.sort(reverse=True)
    print(f"{'total_ms':>9} {'n':>4} {'med_ms':>7} {'max_ms':>7} tasks  stage")
    for total, name, n, tasks, med, mx in rows[:20]:
        print(f"{total:>9} {n:>4} {med:>7} {mx:>7} {str(tasks):<12} {name[:70]}")


if __name__ == "__main__":
    main()
