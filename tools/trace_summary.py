"""Summarize a jax.profiler trace dir: per-op device time (ms)."""

import collections
import glob
import gzip
import json
import sys


def summarize(root, top=15):
    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print(f"{root}: no trace found")
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" in pids.get(e.get("pid"), ""):
                agg[e.get("name", "")] += e["dur"]
    print(f"== {root}")
    for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {d/1e3:9.3f} ms  {n[:80]}")


if __name__ == "__main__":
    for root in (sys.argv[1:] or sorted(glob.glob("/tmp/sdsp_trace*"))):
        summarize(root)
