#!/usr/bin/env python
"""Tune the Panda guide megakernel's batch blocking (block_b) on the chip.

Times make_panda_collision_grad (EnvSpheres3D, 128 interp points) for a
sweep of block_b values at a given batch size, pipelined dispatch. The
kernel default is block_b=8 (tuned at the B=100 headline); the round-3
large-batch lane (B=1024, bench.py panda_trajs_per_sec_large_batch) may
prefer larger blocks — same methodology as scripts/tune_pointmass_block.py.

Usage: python scripts/tune_panda_block.py [B] [block_b ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mpd_tpu.core import setup_runtime

    setup_runtime()
    import jax

    from mpd_tpu.kernels.panda_guide import make_panda_collision_grad
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvSpheres3D")
    robot = get_robot("RobotPanda")

    args = [int(a) for a in sys.argv[1:]]
    B = args[0] if args else 1024
    blocks = args[1:] or [8, 16, 32, 64]
    H, K = 64, 24
    q = jax.random.uniform(jax.random.PRNGKey(0), (B, H, 7),
                           minval=robot.q_min, maxval=robot.q_max)
    qs = [jax.device_put(q + 0.001 * i) for i in range(K)]

    print(f"backend: {jax.default_backend()}, B={B}", file=sys.stderr, flush=True)
    results = {}
    for bb in blocks:
        fn = make_panda_collision_grad(
            robot, env.objects, margin=0.05, sigma=1.0, num_interp=128,
            block_b=bb,
        )
        g = jax.jit(fn)
        jax.block_until_ready(g(qs[0]))
        jax.block_until_ready([g(v) for v in qs[:6]])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready([g(v) for v in qs])
            best = min(best, (time.perf_counter() - t0) / K)
        results[bb] = best
        print(json.dumps({"block_b": bb, "us_per_call": round(best * 1e6, 1),
                          "grid": -(-B // bb)}), flush=True)

    win = min(results, key=results.get)
    print(json.dumps({"best_block_b": win,
                      "us_per_call": round(results[win] * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
