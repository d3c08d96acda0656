"""Join a captured trace (trace.json.gz) with the dumped HLO text: attribute
device time per op to the HLO op's source file:line metadata.

Usage: python scripts/attr_trace.py [--trace /tmp/dbw_trace] [--hlo /tmp/step_hlo.txt]
"""

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", default="/tmp/dbw_trace")
    p.add_argument("--hlo", default="/tmp/step_hlo.txt")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=50)
    args = p.parse_args()

    # op name -> source attribution from HLO metadata
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?metadata=\{[^}]*?source_file=\"([^\"]+)\""
        r"[^}]*?source_line=(\d+)"
    )
    oppat = re.compile(r"%([\w.\-]+) = ")
    with open(args.hlo) as f:
        for line in f:
            m = oppat.search(line)
            if not m:
                continue
            name = m.group(1)
            mm = pat.search(line)
            if mm:
                meta[name] = f"{os.path.basename(mm.group(2))}:{mm.group(3)}"
            else:
                meta.setdefault(name, "")

    paths = glob.glob(os.path.join(args.trace, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    proc, tids = {}, {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc[ev["pid"]] = ev["args"]["name"]
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev["tid"])] = ev["args"]["name"]

    by_src = defaultdict(float)
    by_src_ops = defaultdict(set)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if "TPU" not in proc.get(ev.get("pid"), ""):
            continue
        if "XLA Ops" not in tids.get((ev.get("pid"), ev.get("tid")), ""):
            continue
        name = ev.get("name", "?")
        src = meta.get(name)
        if src is None:
            src = "[not in hlo]"
        elif not src:
            src = "[no metadata] " + re.sub(r"[.\d]+$", "", name)
        dur = ev.get("dur", 0) / 1e3
        by_src[src] += dur
        by_src_ops[src].add(name)
        total += dur

    rows = sorted(by_src.items(), key=lambda kv: -kv[1])
    print(f"total {total / args.steps:.1f} ms/step\n")
    print(f"{'ms/step':>9}  {'#ops':>5}  source")
    for src, ms in rows[: args.top]:
        print(f"{ms / args.steps:9.2f}  {len(by_src_ops[src]):5d}  {src}")
    rest = sum(ms for _, ms in rows[args.top:])
    print(f"{rest / args.steps:9.2f}  {'':>5}  [{len(rows) - args.top} more]")


if __name__ == "__main__":
    main()
