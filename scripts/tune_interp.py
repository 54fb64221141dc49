#!/usr/bin/env python
"""Guide interpolation-count sweep (VERDICT r4 #3): the one untried
work-reduction lever on the guide-dominated Panda lanes.

The reference's effective count is 128 — a preserved call-site bug whose
INTENDED value is ceil(1.5*64) = 96 (ref inference.py:233-236 passing a
kwarg the guide class doesn't take, guides.py:152-156). The guide's SDF
work is linear in the count, so 96/64 cut 25/50% of the SDF pairs on
lanes that are ~75% guide time. This script measures pipelined throughput
of the production chains at num_interp in {64, 96, 128} on the real TPU;
the quality gates run separately via scripts/evaluate.py --num-interp
(results committed in RESULTS.md).

Usage: python scripts/tune_interp.py [--b2d 4096] [--bpanda 1024]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b2d", type=int, default=4096)
    p.add_argument("--bpanda", type=int, default=1024)
    p.add_argument("--counts", default="128,96,64")
    p.add_argument("--k", type=int, default=8, help="pipelined depth")
    args = p.parse_args()

    from mpd_tpu.core import setup_runtime

    setup_runtime()
    import jax
    import jax.random as jrandom

    from bench import build_query

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    counts = [int(c) for c in args.counts.split(",")]
    K = args.k
    keys = jrandom.split(jrandom.PRNGKey(7), K)

    def time_pipelined(q):
        jax.block_until_ready([q(k) for k in keys[:3]])  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready([q(k) for k in keys])
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    lanes = {
        "2d_ddpm25_gs5": dict(B=args.b2d),
        "2d_respaced10_gs10_bf16": dict(
            B=args.b2d, respaced=True, bf16=True, n_guide_steps=10,
            w_coll=3e-2,
        ),
        "panda_ddpm25_gs15": dict(
            B=args.bpanda, env_id="EnvSpheres3D", robot_id="RobotPanda",
            n_guide_steps=15, w_coll=5e-2,
        ),
        "panda_respaced_dh15_gs15": dict(
            B=args.bpanda, env_id="EnvSpheres3D", robot_id="RobotPanda",
            n_guide_steps=15, w_coll=5e-2, respaced=True,
            respaced_times=(0, 3, 6, 9, 12, 15, 16, 17, 18,
                            19, 20, 21, 22, 23, 24),
        ),
    }

    out = {}
    for lane, kw in lanes.items():
        B = kw.pop("B")
        for n in counts:
            q = build_query(B, num_interp=n, **kw)
            t = time_pipelined(q)
            out[f"{lane}_interp{n}"] = {
                "ms_per_query": round(t * 1e3, 2),
                "trajs_per_sec": round(B / t, 1),
            }
            print(f"{lane} interp={n}: {t*1e3:.1f} ms/query -> "
                  f"{B/t:.0f} trajs/s", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
