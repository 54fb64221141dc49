"""Sweep the 2D guide megakernel's batch blocking (block_b) on the chip.

Standalone kernel timing (not the full query): builds the EnvDense2D
ExtraObjects guide-gradient kernel at B=4096 for each block size and
reports the pipelined per-call time. The [bb, H] @ [H, N] interpolation
matmuls underfill the 128x128 MXU tile below bb=128, so larger blocks
should amortize both the MXU tile and the per-program overhead.

Usage: python scripts/tune_pointmass_block.py [--batch 4096]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--blocks", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mpd_tpu.kernels.pointmass_guide import make_pointmass_collision_grad
    from mpd_tpu.world import get_env, get_robot

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    field = env.objects

    key = jax.random.PRNGKey(0)
    q = jax.random.uniform(
        key, (args.batch, args.horizon, 2), minval=-1.0, maxval=1.0
    )
    q = jax.device_put(q)

    results = {}
    for bb in args.blocks:
        fn = make_pointmass_collision_grad(
            robot, field, margin=0.03, sigma=1.0, block_b=bb
        )
        f = jax.jit(fn)
        g = f(q)
        g.block_until_ready()  # compile
        # pipelined: enqueue reps calls, block once (amortizes dispatch)
        t0 = time.perf_counter()
        outs = [f(q) for _ in range(args.reps)]
        outs[-1].block_until_ready()
        dt = (time.perf_counter() - t0) / args.reps
        results[bb] = dt
        print(f"block_b={bb:4d}: {dt*1e6:8.1f} us/call "
              f"({args.batch/dt/1e6:.1f}M traj-grads/s)")

    best = min(results, key=results.get)
    print(f"best: block_b={best} at {results[best]*1e6:.1f} us/call")


if __name__ == "__main__":
    main()
