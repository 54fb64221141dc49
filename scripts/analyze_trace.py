#!/usr/bin/env python
"""Per-op device-time breakdown of a jax.profiler trace (VERDICT r4 #7).

Parses the perfetto trace.json.gz that `jax.profiler.trace` writes (e.g.
from `scripts/profile_sampler.py --trace-dir DIR`) and aggregates TPU op
time by hlo_category with achieved FLOP rates — the evidence behind the
RESULTS.md U-Net ceiling note: at B=4096 the guided DDPM-25 query's conv
fusions run at ~116 TFLOP/s (59% of the v5e bf16 peak) and take ~69% of
op time, so ~40% chain MFU is structural and the perfect-fusion ceiling
(convs only, at the measured conv rate) is ~55%.

Usage: python scripts/analyze_trace.py TRACE_DIR [--json OUT]
"""

import argparse
import collections
import glob
import gzip
import json
import os


def analyze(trace_dir):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/[!_]*trace.json.gz")
    ))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = [p for p, n in pids.items() if "TPU" in n or "device" in n]
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    mods = [
        e for e in ev
        if e.get("ph") == "X" and e.get("pid") in dev_pids
        and tids.get((e["pid"], e["tid"])) == "XLA Modules"
    ]
    ops = [
        e for e in ev
        if e.get("ph") == "X" and e.get("pid") in dev_pids
        and tids.get((e["pid"], e["tid"])) == "XLA Ops"
        and not e["name"].startswith("while")
    ]
    cat = collections.defaultdict(lambda: dict(ms=0.0, n=0, gflop=0.0))
    for e in ops:
        a = e.get("args", {})
        c = a.get("hlo_category", "?")
        cat[c]["ms"] += e["dur"] / 1e3
        cat[c]["n"] += 1
        cat[c]["gflop"] += int(a.get("model_flops", 0) or 0) / 1e9
    out = {
        "modules": collections.Counter(),
        "categories": {},
    }
    for e in mods:
        out["modules"][e["name"].split("(")[0]] += round(e["dur"] / 1e3, 1)
    for c, d in sorted(cat.items(), key=lambda kv: -kv[1]["ms"]):
        # 1 GFLOP/ms == 1 TFLOP/s
        eff = d["gflop"] / d["ms"] if d["ms"] else 0.0
        out["categories"][c] = {
            "ms": round(d["ms"], 2),
            "count": d["n"],
            "gflop": round(d["gflop"], 1),
            "tflops_per_sec": round(eff, 1),
        }
    out["modules"] = dict(out["modules"])
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir")
    p.add_argument("--json", default=None)
    args = p.parse_args()
    out = analyze(args.trace_dir)
    text = json.dumps(out, indent=1)
    print(text)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
