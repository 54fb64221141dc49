#!/usr/bin/env python
"""Small-batch (reference-shaped B=50) 2D guide kernel vs autodiff A/B.

VERDICT r2 weak #8: the 2D guide megakernel's measured crossover gate is
B=128, so the reference-shaped 50-sample query runs the jax.grad guide in
auto mode. This script times BOTH paths at small B for a block_b sweep,
pipelined dispatch (the tunneled host<->device wall jitter at ~20-35 ms
otherwise swamps the ~100 us kernel), to either find a winning small-batch
block configuration or confirm the crossover is fundamental (per-program
overhead + layout transposes) and keep the documented gate.

Usage: python scripts/tune_smallbatch_guide.py [B] [block_b ...]
Prints one JSON line per configuration incl. an `autodiff` baseline row.
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

    from mpd_tpu.costs.cost_functions import CostCollision
    from mpd_tpu.kernels.pointmass_guide import make_pointmass_collision_grad
    from mpd_tpu.world import get_env, get_robot
    from mpd_tpu.world.task import interpolate_points

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")

    args = [int(a) for a in sys.argv[1:]]
    B = args[0] if args else 50
    blocks = args[1:] or [8, 16, 32, 64]
    H = 64
    K = 24
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, 2)) * 0.5
    xs = [jax.device_put(x + 0.001 * i) for i in range(K)]

    print(f"backend: {jax.default_backend()}, B={B}", file=sys.stderr, flush=True)

    def timed(g):
        jax.block_until_ready(g(xs[0]))
        jax.block_until_ready([g(v) for v in xs[:6]])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready([g(v) for v in xs])
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    # autodiff baseline: the exact path the guide takes below the gate
    cost = CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                         cutoff_margin=0.05)

    def auto_grad(q):
        x_full = jnp.concatenate([q, jnp.zeros_like(q)], -1)
        return jax.grad(
            lambda xx: jnp.sum(cost(xx, interpolate_points(xx, 128)))
        )(x_full)[..., :2]

    t_auto = timed(jax.jit(auto_grad))
    print(json.dumps({"path": "autodiff", "us_per_call": round(t_auto * 1e6, 1)}),
          flush=True)

    results = {}
    for bb in blocks:
        fn = make_pointmass_collision_grad(
            robot, env.objects, margin=0.05, sigma=1.0, num_interp=128,
            block_b=bb,
        )
        t = timed(jax.jit(fn))
        results[bb] = t
        print(json.dumps({
            "path": "kernel", "block_b": bb,
            "us_per_call": round(t * 1e6, 1),
            "grid": -(-B // bb),
            "vs_autodiff": round(t_auto / t, 3),
        }), flush=True)

    win = min(results, key=results.get)
    print(json.dumps({
        "winner": ("kernel" if results[win] < t_auto else "autodiff"),
        "best_block_b": win,
        "kernel_us": round(results[win] * 1e6, 1),
        "autodiff_us": round(t_auto * 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
