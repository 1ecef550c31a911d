"""Summarize a jax.profiler chrome-trace: top device ops by time.

Usage: python tools/trace_summary.py artifacts/trace_800x1344_b2 [N]

Reads the newest vm.trace.json.gz under the given trace dir, keeps only
TPU-device complete events, drops the enclosing jit_* region events (they
span the whole program and double-count every op), and prints the top-N op
groups. Grouping folds XLA's numeric suffixes (fusion.105 → fusion) while
keeping named-module prefixes (GeneralizedRCNN.roi_transform.2 stays its
own row) so the output maps to model code.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in ev if e.get("ph") == "M"
            and e.get("name") == "process_name"}
    dev = [e for e in ev if e.get("ph") == "X" and "dur" in e
           and "TPU" in pids.get(e["pid"], "")]
    return dev


def group(name: str) -> str:
    if name.startswith("jit_") or name.startswith("jit__"):
        return "__program__"
    # Bare XLA op names fold their uniquifier tail (fusion.105 → fusion,
    # pad.233.clone → pad); named module scopes keep their full identity
    # (GeneralizedRCNN.roi_transform.2 stays its own row — per-call-site
    # attribution is the point of the named scopes).
    parts = name.split(".")
    if all(seg.isdigit() or seg == "clone" for seg in parts[1:]):
        return parts[0]
    return name


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    dev = load_events(trace_dir)
    by = collections.Counter()
    for e in dev:
        by[group(e["name"])] += e["dur"]
    prog = by.pop("__program__", 0)
    total = sum(by.values())
    print(f"program span: {prog/1e3:.1f}ms   op total: {total/1e3:.1f}ms "
          f"(gap/overhead: {(prog-total)/1e3:.1f}ms"
          f" = {(prog-total)/max(prog,1)*100:.1f}%)")
    for n, d in by.most_common(top_n):
        print(f"{d/total*100:5.1f}%  {d/1e3:8.2f}ms  {n}")


if __name__ == "__main__":
    main()
