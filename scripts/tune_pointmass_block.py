#!/usr/bin/env python
"""Tune the 2D guide megakernel's batch blocking (block_b) on the chip.

Times make_pointmass_collision_grad at the bench operating point
(EnvDense2D+extra, B=4096, 128 interp points) for a sweep of block_b
values, pipelined dispatch (amortizes the tunneled host<->device latency;
single-dispatch walls carry 20-35 ms jitter). Prints one JSON line per
block size; use the winner as the kernel's large-batch default
(kernels/pointmass_guide.py apply()).
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
    import jax.numpy as jnp

    from mpd_tpu.kernels.pointmass_guide import make_pointmass_collision_grad
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")

    B, H = 4096, 64
    K = 24  # calls in flight per timing round
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, 2)) * 0.5
    xs = [x + 0.001 * i for i in range(K)]
    xs = [jax.device_put(v) for v in xs]

    print(f"backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    results = {}
    for bb in (int(a) for a in (sys.argv[1:] or ["32", "64", "128", "256", "512"])):
        fn = make_pointmass_collision_grad(
            robot, env.objects, margin=0.05, sigma=1.0, num_interp=128,
            block_b=bb,
        )
        g = jax.jit(fn)
        jax.block_until_ready(g(xs[0]))  # compile
        jax.block_until_ready([g(v) for v in xs[:6]])  # warm pipeline
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready([g(v) for v in xs])
            best = min(best, (time.perf_counter() - t0) / K)
        results[bb] = best
        print(json.dumps({"block_b": bb, "us_per_call": round(best * 1e6, 1),
                          "grid": B // bb}), flush=True)

    win = min(results, key=results.get)
    print(json.dumps({"winner_block_b": win,
                      "us_per_call": round(results[win] * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
