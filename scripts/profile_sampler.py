#!/usr/bin/env python
"""Sampler performance breakdown on the current backend.

Times the guided query's components at a given batch size:
- full guided query (25 noisy + 5 noiseless steps, 5 guide steps when t<7)
- prior-only chain (no guidance) -> U-Net forward cost
- a single guide step x n -> cost-gradient kernel cost
- U-Net forward alone, f32 vs bf16 compute
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=10):
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
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace of the full guided query")
    p.add_argument("--fused", default="auto",
                   choices=["auto", "on", "off", "interpret"],
                   help="fused_collision mode (A/B the guide megakernels)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from bench import build_query
    from mpd_tpu.costs.cost_functions import CostCollision, CostComposite, CostGPTrajectory
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.diffusion import SamplerConfig, make_schedule, run_sampling
    from mpd_tpu.nets.temporal_unet import TemporalUnet
    from mpd_tpu.world import get_env, get_robot

    B, H, D = args.batch, 64, 4
    print(f"backend={jax.default_backend()} B={B}", file=sys.stderr)

    # full guided query (reuses bench's builder)
    q_full = build_query(B, fused=args.fused)
    t_full = timeit(lambda: q_full(jax.random.PRNGKey(0)))
    print(f"full guided query:      {t_full*1e3:8.2f} ms  ({B/t_full:,.0f} trajs/s)")

    # pipelined: submit K queries async, block once. Per-call amortized time
    # approximates pure device compute (host dispatch overlaps execution);
    # single-call minus amortized is the per-dispatch overhead — on the
    # tunneled axon backend this is ~15-25 ms and dominates small-B p50.
    K = 20
    keys = [jax.random.PRNGKey(100 + i) for i in range(K)]
    t0 = time.perf_counter()
    outs = [q_full(k) for k in keys]
    jax.block_until_ready(outs)
    t_pipe = (time.perf_counter() - t0) / K
    print(f"pipelined (K={K}):       {t_pipe*1e3:8.2f} ms/query  "
          f"(dispatch overhead ~{(t_full-t_pipe)*1e3:.1f} ms)")
    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.block_until_ready(q_full(jax.random.PRNGKey(2)))
            jax.block_until_ready(q_full(jax.random.PRNGKey(3)))
        print(f"trace written to {args.trace_dir}", file=sys.stderr)

    # prior-only
    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=32, dim_mults=(1, 2, 4, 8))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)), jnp.zeros((2,), jnp.int32))
    sched = make_schedule("exponential", 25)
    conds = {0: jnp.zeros((B, D)), H - 1: jnp.ones((B, D))}

    @jax.jit
    def q_prior(key):
        return run_sampling(sched, lambda x, t: net.apply(params, x, t), key,
                            (B, H, D), conds, SamplerConfig(n_extra_steps=5, t_start_guide=-(10**9)))

    t_prior = timeit(lambda: q_prior(jax.random.PRNGKey(0)))
    print(f"prior-only (30 steps):  {t_prior*1e3:8.2f} ms")

    # guide steps alone (60 = 12 guided chain steps x 5)
    norm = LimitsNormalizer(mins=jnp.asarray([-1.0, -1.0, -2.5, -2.5]),
                            maxs=jnp.asarray([1.0, 1.0, 2.5, 2.5]))
    cost = CostComposite(robot, H, [
        CostCollision(robot, H, field=env.objects, cutoff_margin=0.05),
        CostGPTrajectory(robot, H, 5.0 / H),
    ], weights_cost_l=[1e-2, 1e-7])
    guide = GuideTrajectoriesWithVelocity(
        unnormalize_fn=norm.unnormalize, cost=cost, clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=128)

    @jax.jit
    def q_guide60(x):
        def body(x, _):
            return x + guide(x), None
        x, _ = jax.lax.scan(body, x, None, length=60)
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, D))
    t_guide = timeit(lambda: q_guide60(x0))
    print(f"60 guide steps:         {t_guide*1e3:8.2f} ms")

    # U-Net forward alone (x30 to match chain length), f32 vs bf16
    t_arr = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def unet30_f32(x):
        def body(x, _):
            return net.apply(params, x, t_arr), None
        x, _ = jax.lax.scan(body, x, None, length=30)
        return x

    net_bf16 = net.clone(dtype=jnp.bfloat16)

    @jax.jit
    def unet30_bf16(x):
        def body(x, _):
            return net_bf16.apply(params, x, t_arr), None
        x, _ = jax.lax.scan(body, x, None, length=30)
        return x

    t_f32 = timeit(lambda: unet30_f32(x0))
    t_bf16 = timeit(lambda: unet30_bf16(x0))
    print(f"30 U-Net fwd f32:       {t_f32*1e3:8.2f} ms")
    print(f"30 U-Net fwd bf16:      {t_bf16*1e3:8.2f} ms  (speedup {t_f32/t_bf16:.2f}x)")


if __name__ == "__main__":
    main()
