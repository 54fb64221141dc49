#!/usr/bin/env python
"""Microbench the Panda collision-guide megakernel vs the autodiff path.

Times the fused Pallas kernel (kernels/panda_guide.py) at several batch
blockings against the jax.grad reference for the same computation, at the
production shape (B=100 candidates, H=64 support points, 128 interpolated
collision points). Used to pick `block_b` and to keep an eye on the
kernel's standalone cost (the guide-step A/B lives in
scripts/profile_panda_guide.py --fused on|off).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=30):
    import jax

    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=100)
    p.add_argument("--n-interp", type=int, default=128)
    p.add_argument("--blocks", default="8,16,32,64")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mpd_tpu.costs.cost_functions import CostCollision
    from mpd_tpu.world import get_env, get_robot
    from mpd_tpu.world.task import interpolate_points

    B, H, N = args.batch, 64, args.n_interp
    print(f"backend={jax.default_backend()} B={B} n_interp={N}", file=sys.stderr)

    env = get_env("EnvSpheres3D", use_extra_objects=True)
    robot = get_robot("RobotPanda")
    cost = CostCollision(robot, H, field=env.objects, cutoff_margin=0.05)

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.uniform(
            np.asarray(robot.q_min), np.asarray(robot.q_max), size=(B, H, 7)
        ).astype(np.float32)
    )
    x = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)

    @jax.jit
    def autodiff_grad(xx):
        return jax.grad(
            lambda z: jnp.sum(cost(z, interpolate_points(z, N)))
        )(xx)

    t_ref = timeit(lambda: autodiff_grad(x))
    print(f"autodiff grad (interp+FK+SDF): {t_ref*1e3:8.3f} ms")

    for bb in (int(b) for b in args.blocks.split(",")):
        fn = cost.make_fused_interp_gradient(N, block_b=bb)
        if fn is None:
            print("kernel unsupported here", file=sys.stderr)
            return
        jfn = jax.jit(fn)
        t = timeit(lambda: jfn(x))
        print(f"fused kernel block_b={bb:3d}:     {t*1e3:8.3f} ms  ({t_ref/t:.2f}x)")


if __name__ == "__main__":
    main()
