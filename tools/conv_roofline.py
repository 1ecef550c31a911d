"""Per-layer roofline table from a jax.profiler trace (VERDICT r4 #1).

Usage: python tools/conv_roofline.py TRACE_DIR [--min-us-per-iter 1000]
                                     [--top N] [--csv out.csv]

For every device op instance group (per HLO instruction name, NOT folded —
fusion.105 and fusion.106 are different layers) at or above the time
threshold, prints:

  us/iter, % of op total, model GFLOP/iter, achieved TFLOP/s,
  % of MXU roofline (197 bf16 TFLOP/s), GB/iter moved, achieved GB/s,
  % of HBM roofline (819 GB/s), bound = which roofline is tighter,
  eff = (tighter-roofline time) / measured time, category, source line.

`eff` is the honest per-op verdict: 1.0 means the op runs at the speed of
light of its binding resource; 0.5 means half of it is schedulable loss.
All flops/bytes come from XLA's own per-op cost analysis embedded in the
trace (`model_flops`, `raw_bytes_accessed` event args) — no re-derivation.

Iteration count is inferred from the number of top-level jit_* program
events in the trace (capture_trace.py records 3).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re

# v5e bf16 MXU peak is 197 TFLOP/s (394 is the INT8 TOPS figure; verified
# on-chip r5: dense 8192^3 bf16 matmul sustains 172 TF/s, model conv
# fusions 185 TF/s). f32-typed dots lower to bf16 multiplies under jax's
# default matmul precision, so they share the same practical roofline.
PEAK_FLOPS = {"bf16": 197e12, "f32": 197e12}
PEAK_HBM = 819e9

# v5e MXU peak assumes bf16 inputs; ops whose long_name shows f32 operands
# into the dot/conv run at the f32 peak instead.
_F32_IN = re.compile(r"(convolution|dot)\(.*?f32\[")


def load_events(trace_dir):
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
    return [e for e in ev if e.get("ph") == "X" and "dur" in e
            and "TPU" in pids.get(e["pid"], "")]


def build_rows(dev, n_iters=None):
    groups = collections.defaultdict(
        lambda: {"us": 0.0, "n": 0, "args": None})
    prog_count = 0
    for e in dev:
        name = e["name"]
        if name.startswith("jit_") or name.startswith("jit__"):
            prog_count += 1
            continue
        g = groups[name]
        g["us"] += e["dur"]
        g["n"] += 1
        if g["args"] is None:
            g["args"] = e.get("args", {})
    iters = n_iters or max(prog_count, 1)
    rows = []
    for name, g in groups.items():
        a = g["args"] or {}
        flops = float(a.get("model_flops", 0) or 0)
        rbytes = float(a.get("raw_bytes_accessed",
                             a.get("bytes_accessed", 0)) or 0)
        us_it = g["us"] / iters
        n_it = g["n"] / iters          # instances per iteration
        sec_it = us_it / 1e6
        fl_it = flops * n_it
        by_it = rbytes * n_it
        long_name = a.get("long_name", "")
        peak_fl = (PEAK_FLOPS["f32"] if _F32_IN.search(long_name)
                   else PEAK_FLOPS["bf16"])
        tflops = fl_it / sec_it / 1e12 if sec_it else 0.0
        gbs = by_it / sec_it / 1e9 if sec_it else 0.0
        t_mxu = fl_it / peak_fl
        t_hbm = by_it / PEAK_HBM
        t_bound = max(t_mxu, t_hbm)
        rows.append({
            "name": name,
            "us_per_iter": us_it,
            "inst_per_iter": n_it,
            "gflop_per_iter": fl_it / 1e9,
            "tflops": tflops,
            "pct_mxu": tflops * 1e12 / peak_fl * 100,
            "gb_per_iter": by_it / 1e9,
            "gbs": gbs,
            "pct_hbm": gbs * 1e9 / PEAK_HBM * 100,
            "bound": "mxu" if t_mxu >= t_hbm else "hbm",
            "eff": (t_bound / sec_it) if sec_it else 0.0,
            "category": a.get("hlo_category", ""),
            "source": (a.get("source", "") or "").replace(
                "/root/repo/", ""),
            "tf_op": a.get("tf_op", ""),
        })
    rows.sort(key=lambda r: -r["us_per_iter"])
    return rows, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--min-us-per-iter", type=float, default=1000.0)
    ap.add_argument("--top", type=int, default=0,
                    help="cap row count after threshold (0 = no cap)")
    ap.add_argument("--iters", type=int, default=0,
                    help="override inferred iteration count")
    ap.add_argument("--csv", default="")
    args = ap.parse_args()

    dev = load_events(args.trace_dir)
    rows, iters = build_rows(dev, args.iters or None)
    total_us = sum(r["us_per_iter"] for r in rows)
    total_fl = sum(r["gflop_per_iter"] for r in rows)
    total_gb = sum(r["gb_per_iter"] for r in rows)
    bound_us = sum(r["us_per_iter"] * r["eff"] for r in rows)
    print(f"iters={iters}  op-total {total_us/1e3:.2f} ms/iter, "
          f"{total_fl/1e3:.2f} TFLOP/iter, {total_gb:.2f} GB/iter")
    print(f"sum-of-op rooflines: {bound_us/1e3:.2f} ms/iter "
          f"-> whole-program eff {bound_us/total_us*100:.1f}% "
          f"(per-op speed-of-light vs measured)")
    shown = [r for r in rows if r["us_per_iter"] >= args.min_us_per_iter]
    if args.top:
        shown = shown[:args.top]
    hdr = (f"{'us/it':>9} {'%tot':>5} {'GFLOP':>8} {'TF/s':>6} "
           f"{'%MXU':>5} {'GB':>7} {'GB/s':>6} {'%HBM':>5} "
           f"{'bnd':>3} {'eff':>5}  name | category | source")
    print(hdr)
    for r in shown:
        print(f"{r['us_per_iter']:9.0f} {r['us_per_iter']/total_us*100:5.1f}"
              f" {r['gflop_per_iter']:8.1f} {r['tflops']:6.1f}"
              f" {r['pct_mxu']:5.1f} {r['gb_per_iter']:7.3f} {r['gbs']:6.0f}"
              f" {r['pct_hbm']:5.1f} {r['bound']:>3} {r['eff']:5.2f}"
              f"  {r['name']} | {r['category']} | {r['source']}")
    below = [r for r in rows if r["us_per_iter"] < args.min_us_per_iter]
    if below:
        bus = sum(r["us_per_iter"] for r in below)
        print(f"(+{len(below)} ops below threshold totalling "
              f"{bus/1e3:.2f} ms/iter = {bus/total_us*100:.1f}%)")
    if args.csv:
        import csv
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print("csv ->", args.csv)


if __name__ == "__main__":
    main()
