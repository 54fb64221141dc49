#!/usr/bin/env python
"""Benchmark: guided-MPD sampler throughput on one chip.

Measures the full planning workload (the reference's hot path,
scripts/inference/inference.py:248-257): B candidate trajectories through
25 noisy + 5 noiseless reverse-DDPM steps with the temporal U-Net
eps-model, hard conditioning every step, and 5 cost-gradient guide steps
(SDF collision at 128 interpolated points + GP smoothness) for every step
with t < 7 — as one compiled XLA program.

Prints ONE JSON line:
  metric: guided trajs/sec/chip at the large-batch operating point
  latency_p50_s: p50 wall-clock of a reference-shaped 50-sample query
  vs_baseline: ratio vs the reference operating point of 50 trajs / query
               inside the BASELINE.md <1 s budget (= 50 trajs/s)
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_query(B, H=64, schedule_steps=25, mesh=None):
    """One compiled guided query over B candidates; with `mesh`, the
    candidate axis is sharded across it (bench_multichip.py scaling lane).
    Weights are randomly initialized — the workload is compute-identical to
    a trained checkpoint (same program, same shapes); quality-bearing evals
    live in scripts/evaluate.py."""
    import jax
    import jax.numpy as jnp

    from mpd_tpu.costs.cost_functions import (
        CostCollision,
        CostComposite,
        CostGPTrajectory,
    )
    from mpd_tpu.costs.guide import GuideTrajectoriesWithVelocity
    from mpd_tpu.data.normalization import LimitsNormalizer
    from mpd_tpu.diffusion import SamplerConfig, make_schedule, run_sampling
    from mpd_tpu.nets.temporal_unet import TemporalUnet
    from mpd_tpu.world import PlanningTask, get_env, get_robot

    env = get_env("EnvDense2D", use_extra_objects=True)
    robot = get_robot("RobotPointMass")
    task = PlanningTask(env=env, robot=robot, obstacle_cutoff_margin=0.05)
    D = robot.state_dim
    dt = 5.0 / H

    net = TemporalUnet(state_dim=D, n_support_points=H, unet_input_dim=32,
                       dim_mults=(1, 2, 4, 8))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, H, D)),
                      jnp.zeros((2,), jnp.int32))
    eps_fn = lambda x, t: net.apply(params, x, t)

    norm = LimitsNormalizer(
        mins=jnp.asarray([-1.0, -1.0, -2.5, -2.5]),
        maxs=jnp.asarray([1.0, 1.0, 2.5, 2.5]),
    )
    cost = CostComposite(
        robot, H,
        [
            CostCollision(robot, H, field=env.objects, sigma_coll=1.0,
                          cutoff_margin=0.05),
            CostGPTrajectory(robot, H, dt, sigma_gp=1.0),
        ],
        weights_cost_l=[1e-2, 1e-7],
    )
    guide = GuideTrajectoriesWithVelocity(
        unnormalize_fn=norm.unnormalize,
        cost=cost,
        clip_grad=True,
        interpolate_trajectories_for_collision=True,
        num_interpolated_points_for_collision=128,
    )
    schedule = make_schedule("exponential", schedule_steps)
    cfg = SamplerConfig(n_guide_steps=5, t_start_guide=7, n_extra_steps=5,
                        noise_std_extra=0.5)

    start = jnp.asarray([-0.85, -0.85, 0.0, 0.0])
    goal = jnp.asarray([0.85, 0.85, 0.0, 0.0])
    hard_conds = {
        0: jnp.broadcast_to(norm.normalize(start), (B, D)),
        H - 1: jnp.broadcast_to(norm.normalize(goal), (B, D)),
    }
    if mesh is not None:
        from mpd_tpu.parallel import replicate, shard_batch

        hard_conds = shard_batch(mesh, hard_conds)
        params = replicate(mesh, params)

    @jax.jit
    def query(key):
        return run_sampling(schedule, eps_fn, key, (B, H, D), hard_conds,
                            cfg, guide_fn=guide)

    return query


def time_query(query, n_iters=10):
    import jax

    key = jax.random.PRNGKey(0)
    # warmup/compile
    jax.block_until_ready(query(key))
    times = []
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        jax.block_until_ready(query(sub))
        times.append(time.perf_counter() - t0)
    return np.asarray(times)


def main():
    from mpd_tpu.core import setup_runtime

    setup_runtime()  # persistent compile cache: repeat runs skip the
    # ~20 min remote cold compile of the guided query

    import jax

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    # batch-size scan on v5e-1 (scripts/profile_sampler.py + ad-hoc probe):
    # 2048 -> 22.6k, 4096 -> 25.0k, 8192 -> 21.0k trajs/s; 4096 is the knee
    B_big = 4096
    log(f"compiling large-batch query (B={B_big})...")
    q_big = build_query(B_big)
    t_big = time_query(q_big, n_iters=10)
    thpt = B_big / float(np.median(t_big))
    log(f"large-batch: median {np.median(t_big)*1e3:.1f} ms -> {thpt:.0f} trajs/s")

    log("compiling reference-shaped query (B=50)...")
    q_ref = build_query(50)
    t_ref = time_query(q_ref, n_iters=10)
    p50 = float(np.median(t_ref))
    log(f"50-sample query p50: {p50*1e3:.1f} ms")

    baseline_trajs_per_s = 50.0  # reference operating point: 50 trajs / <1 s budget
    print(json.dumps({
        "metric": "guided_mpd_trajs_per_sec_per_chip",
        "value": round(thpt, 1),
        "unit": "trajs/s",
        "vs_baseline": round(thpt / baseline_trajs_per_s, 2),
        "latency_p50_s_50samples": round(p50, 4),
        "batch": B_big,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
