#!/usr/bin/env python
"""Sweep the 2D guide megakernel's batch blocking (block_b) on the chip.

The kernel (kernels/pointmass_guide.py) defaults to block_b=32 at B>=256
(grid 128 at the bench's B=4096 operating point) — ROADMAP notes this is
untuned. Measures the kernel in isolation, pipelined (amortized dispatch,
the only trustworthy wall timing through the tunneled backend).

Usage: python scripts/tune_pointmass_block.py [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpd_tpu.core import setup_runtime


def main():
    setup_runtime()
    import jax
    import jax.numpy as jnp

    from mpd_tpu.kernels.pointmass_guide import make_pointmass_collision_grad
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")

    batches = [int(a) for a in sys.argv[1:]] or [4096]
    H = 64
    K = 50  # dispatches per timing round

    for B in batches:
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, 2)) * 0.8
        print(f"B={B}", flush=True)
        for bb in (16, 32, 64, 128, 256, 512):
            if bb > B:
                continue
            fn = make_pointmass_collision_grad(
                robot, env.objects, margin=0.05, sigma=1.0, block_b=bb
            )
            f = jax.jit(fn)
            out = jax.block_until_ready(f(q))  # compile
            # checksum so all variants are verified identical
            s = float(jnp.sum(jnp.abs(out)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready([f(q) for _ in range(K)])
                best = min(best, (time.perf_counter() - t0) / K)
            print(f"  block_b={bb:4d} grid={B // bb:4d}: {best * 1e6:8.1f} us/call"
                  f"  (checksum {s:.4f})", flush=True)


if __name__ == "__main__":
    main()
