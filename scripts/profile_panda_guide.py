#!/usr/bin/env python
"""Panda guide-cost breakdown on the current backend.

The Panda guide (FK -> sphere SDF -> gradients, 60 evaluations per query)
dominates a Panda planning query; this times its components at a given
batch size so kernel/fusion work can be verified in isolation:
- 60 guide steps (the per-query guidance workload)
- FK sphere-positions forward alone
- FK forward+backward (the custom-VJP analytic-Jacobian path)
- collision-cost gradient (FK + SDF + hinge, via jax.grad)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=20):
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
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fused", default="auto",
                   choices=["auto", "on", "off", "interpret"],
                   help="fused_collision mode for the guide (A/B the Pallas megakernel)")
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace of the 60-guide-step block")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from mpd_tpu.costs.cost_functions import CostCollision, CostComposite, CostGPTrajectory
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.world import get_env, get_robot

    B, H, N = args.batch, 64, args.n_interp
    print(f"backend={jax.default_backend()} B={B} n_interp={N}", file=sys.stderr)

    env = get_env("EnvSpheres3D", use_extra_objects=True)
    robot = get_robot("RobotPanda")
    D = robot.state_dim

    qmin = np.asarray(robot.q_min)
    qmax = np.asarray(robot.q_max)
    rng = np.random.default_rng(0)
    q_interp = jnp.asarray(
        rng.uniform(qmin, qmax, size=(B, N, 7)).astype(np.float32)
    )

    # FK forward alone
    fk = jax.jit(robot.collision_sphere_positions)
    t_fk = timeit(lambda: fk(q_interp))
    print(f"FK fwd [B,{N}] spheres:      {t_fk*1e3:8.3f} ms")

    # FK forward+backward
    @jax.jit
    def fk_grad(q):
        return jax.grad(lambda qq: jnp.sum(jnp.sin(robot.collision_sphere_positions(qq))))(q)

    t_fkb = timeit(lambda: fk_grad(q_interp))
    print(f"FK fwd+bwd:                  {t_fkb*1e3:8.3f} ms")

    # collision cost gradient (FK + SDF + hinge) on full states
    coll = CostCollision(robot, H, field=env.objects, cutoff_margin=0.05)
    x_interp = jnp.concatenate([q_interp, jnp.zeros_like(q_interp)], axis=-1)

    @jax.jit
    def coll_grad(x):
        return jax.grad(lambda xx: jnp.sum(coll(xx, xx)))(x)

    t_cg = timeit(lambda: coll_grad(x_interp))
    print(f"collision cost grad:         {t_cg*1e3:8.3f} ms")

    # the full per-query guidance workload: 60 guide evals on [B, H, 14]
    mins = jnp.asarray(np.concatenate([qmin, -2.5 * np.ones(7)]).astype(np.float32))
    maxs = jnp.asarray(np.concatenate([qmax, 2.5 * np.ones(7)]).astype(np.float32))
    norm = LimitsNormalizer(mins=mins, maxs=maxs)
    cost = CostComposite(robot, H, [
        CostCollision(robot, H, field=env.objects, cutoff_margin=0.05),
        CostGPTrajectory(robot, H, 5.0 / H),
    ], weights_cost_l=[5e-2, 1e-7])
    guide = GuideTrajectoriesWithVelocity(
        unnormalize_fn=norm.unnormalize, cost=cost, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=N,
        fused_collision=args.fused)
    print(f"fused collision kernel: {sorted(guide._fused_grads)}", file=sys.stderr)

    @jax.jit
    def guide60(x):
        def body(x, _):
            return x + guide(x), None
        x, _ = jax.lax.scan(body, x, None, length=60)
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, D))
    t_g = timeit(lambda: guide60(x0))
    print(f"60 guide steps:              {t_g*1e3:8.3f} ms  ({t_g/60*1e3:.3f} ms/step)")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.block_until_ready(guide60(x0))
        print(f"trace written to {args.trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
